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
