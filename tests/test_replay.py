"""Record/replay: a captured wire stream re-serves byte-identically."""

import dataclasses
import threading

import numpy as np

from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.client import DeltaStreamClient
from cudavideostream_tpu.runtime.replay import ReplayServer
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource


def test_record_then_replay_byte_identical(small_config, tmp_path):
    cfg = dataclasses.replace(small_config, port=0)
    n_frames = 4
    journal = str(tmp_path / "session.cvs")

    # live session, recorded
    server = DeltaStreamServer(
        cfg, SyntheticSource(cfg, seed=9), verbose=False, overlay_status=False
    )
    server.listen()
    t = threading.Thread(target=server.serve, kwargs={"max_frames": n_frames}, daemon=True)
    t.start()
    cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width,
                            record=journal)
    cli.connect()
    for _ in range(n_frames):
        _, live_final = cli.read_frame()
    live_final = live_final.copy()
    cli.close()
    t.join(timeout=30)

    # replay the journal to a fresh client — no accelerator involved
    rep = ReplayServer(journal, cfg.frame_bytes, port=0, verbose=False)
    assert len(rep.marks) == n_frames
    rep.listen()
    t2 = threading.Thread(target=rep.serve, daemon=True)
    t2.start()
    cli2 = DeltaStreamClient("127.0.0.1", rep.port, cfg.height, cfg.width)
    cli2.connect()
    for _ in range(n_frames):
        _, replay_final = cli2.read_frame()
    cli2.close()
    t2.join(timeout=30)

    np.testing.assert_array_equal(replay_final, live_final)

    # and the replayed stream matches an oracle replay of the source
    replay_src = SyntheticSource(cfg, seed=9)
    prev = next(replay_src).copy()
    for _ in range(n_frames):
        prev, *_ = ref.step_oracle(prev, next(replay_src), cfg)
    np.testing.assert_array_equal(replay_final, prev)


def test_truncated_journal_ignored_tail(small_config, tmp_path):
    cfg = small_config
    journal = tmp_path / "t.cvs"
    base = np.zeros(cfg.frame_bytes, np.uint8)
    import struct

    payload = struct.pack("<I", 2) + np.array([1, 5], "<i4").tobytes() + b"\x07\x09"
    journal.write_bytes(base.tobytes() + payload + b"\x05\x00")  # torn header
    rep = ReplayServer(str(journal), cfg.frame_bytes, port=0, verbose=False)
    assert len(rep.marks) == 1


def test_replay_gz_and_mmap_paths(tmp_path):
    """Replay serves gzipped sessions (the committed artifact format)
    and mmaps raw files instead of slurping them (multi-GB raw-heavy v3
    captures must not be held resident)."""
    import gzip
    import socket
    import threading

    from cudavideostream_tpu.runtime.replay import ReplayServer

    n_bytes = 270 * 480 * 3  # the committed artifact geometry
    gz_path = "examples/artifacts/session_v3.cvs.gz"
    rs = ReplayServer(gz_path, n_bytes, port=0, verbose=False)
    assert rs.v3 and len(rs.marks) == 36

    def drain(port, out):
        s = socket.create_connection(("127.0.0.1", port))
        while True:
            b = s.recv(1 << 16)
            if not b:
                break
            out[0] += len(b)
        s.close()

    rs.listen()
    t = threading.Thread(target=rs.serve, daemon=True)
    t.start()
    got = [0]
    drain(rs.port, got)
    t.join(timeout=30)
    rs.close()
    with gzip.open(gz_path, "rb") as f:
        assert got[0] == len(f.read())  # every captured byte forwarded

    # raw file: the mmap path
    raw = tmp_path / "session.cvs"
    with gzip.open(gz_path, "rb") as f:
        raw.write_bytes(f.read())
    rs2 = ReplayServer(str(raw), n_bytes, port=0, verbose=False)
    assert rs2._mm is not None and len(rs2.marks) == 36
    rs2.close()
    assert rs2._mm is None  # released


def test_stats_of_recorded_v3_session():
    """Offline wire analytics of the committed v3 artifact: per-mode
    byte accounting matches the recorded schedule (delta16 frames, two
    bitmask, two raw)."""
    from cudavideostream_tpu.runtime.replay import ReplayServer

    rs = ReplayServer(
        "examples/artifacts/session_v3.cvs.gz", 270 * 480 * 3,
        port=0, verbose=False,
    )
    rows = rs.stats()
    rs.close()
    assert len(rows) == 36
    modes = [m for _, m, _ in rows]
    assert modes.count(2) == 2 and modes.count(1) == 2  # raw + bitmask
    # raw frames carry exactly frame_bytes + 1 wire bytes
    for pos, m, b in rows:
        if m == 2:
            assert b == 270 * 480 * 3 + 1 and pos == 270 * 480 * 3
    text = rs.format_stats()
    assert "mode raw: 2 frames" in text
