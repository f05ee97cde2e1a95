"""Broadcast server: multiple clients, including a late joiner whose base
frame is the mid-stream reconstruction, all byte-exact."""

import dataclasses
import threading
import time

import numpy as np
import pytest

from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.broadcast import BroadcastServer
from cudavideostream_tpu.runtime.client import DeltaStreamClient
from cudavideostream_tpu.runtime.sources import SyntheticSource


@pytest.mark.parametrize("tiled", [False, True])
def test_two_clients_one_late_joiner(small_config, tiled):
    cfg = dataclasses.replace(small_config, port=0, tiled_payload=tiled)
    n_frames = 8
    server = BroadcastServer(
        cfg,
        SyntheticSource(cfg, seed=11),
        verbose=False,
        overlay_status=False,
    )
    server.listen()
    port = server.port
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()

    cli1 = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
    cli1.connect()

    # oracle replay of the deterministic source
    replay = SyntheticSource(cfg, seed=11)
    prev = next(replay).copy()
    np.testing.assert_array_equal(cli1.frame, prev)

    # client 1 reads a few frames, then client 2 joins mid-stream; its
    # base frame is the server's current reconstruction, and from there
    # it tracks the same stream. Read it on a thread until the server
    # closes, keeping the last reconstruction.
    state2 = {}

    def late_reader():
        cli2 = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
        cli2.connect()
        state2["base"] = cli2.frame.copy()
        n = 0
        try:
            while True:
                _, recon2 = cli2.read_frame()
                state2["last"] = recon2.copy()
                n += 1
        except (ConnectionError, ValueError, OSError):
            pass
        state2["count"] = n
        cli2.close()

    reader = None
    for k in range(n_frames):
        frame = next(replay)
        prev, *_ = ref.step_oracle(prev, frame, cfg)
        _, recon1 = cli1.read_frame()
        np.testing.assert_array_equal(recon1, prev)
        if k == 2:
            reader = threading.Thread(target=late_reader, daemon=True)
            reader.start()
            time.sleep(0.2)

    t.join(timeout=30)
    reader.join(timeout=30)
    # both clients converge to the same final reconstruction
    np.testing.assert_array_equal(recon1, prev)
    assert state2["count"] >= 1
    np.testing.assert_array_equal(state2["last"], prev)
    cli1.close()


def test_stalled_client_dropped_stream_unaffected(small_config, monkeypatch):
    """A slow-but-alive client (connected, never reads, tiny buffers)
    must not stall the pipeline or the healthy client: the stream runs
    to completion, the healthy client receives every frame byte-exact,
    and the stalled client is dropped with a logged backlog reason."""
    import socket as socket_mod

    from cudavideostream_tpu.runtime.broadcast import ClientSender

    monkeypatch.setattr(ClientSender, "MAX_QUEUE", 8)
    cfg = dataclasses.replace(small_config, port=0)
    n_frames = 60
    server = BroadcastServer(
        cfg,
        SyntheticSource(cfg, seed=7),
        verbose=False,
        overlay_status=False,
        sndbuf=4096,  # bound kernel buffering so the backlog shows up fast
    )
    server.listen()
    port = server.port
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()

    # healthy client: drains continuously on its own thread
    state = {}

    def healthy_reader():
        cli = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
        cli.connect()
        n = 0
        try:
            while True:
                _, recon = cli.read_frame()
                state["last"] = recon.copy()
                n += 1
        except (ConnectionError, ValueError, OSError):
            pass
        state["count"] = n
        cli.close()

    reader = threading.Thread(target=healthy_reader, daemon=True)
    reader.start()
    time.sleep(0.2)  # healthy client admitted first, sees every frame

    # stalled client: connects with a tiny receive buffer and never reads
    stalled = socket_mod.socket()
    stalled.setsockopt(socket_mod.SOL_SOCKET, socket_mod.SO_RCVBUF, 4096)
    stalled.connect(("127.0.0.1", port))

    t.join(timeout=60)
    reader.join(timeout=30)
    stalled.close()
    assert not t.is_alive(), "pipeline stalled behind the slow client"
    assert state["count"] == n_frames

    # byte-exact: the healthy client's final reconstruction equals the
    # oracle replay of the full session
    replay = SyntheticSource(cfg, seed=7)
    prev = next(replay).copy()
    for _ in range(n_frames):
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    np.testing.assert_array_equal(state["last"], prev)

    assert server.drops, "stalled client was never dropped"
    assert any("backlog" in r for r in server.drops), server.drops


def test_dead_client_dropped(small_config):
    cfg = dataclasses.replace(small_config, port=0)
    server = BroadcastServer(
        cfg,
        SyntheticSource(cfg, seed=2),
        verbose=False,
        overlay_status=False,
    )
    server.listen()
    t = threading.Thread(target=server.serve, kwargs={"max_frames": 6}, daemon=True)
    t.start()
    cli1 = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
    cli1.connect()
    cli2 = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
    cli2.connect()
    cli1.read_frame()
    cli2.sock.close()  # dies abruptly
    # remaining client keeps receiving the stream
    for _ in range(3):
        cli1.read_frame()
    cli1.close()
    t.join(timeout=30)


def test_shutdown_drains_queued_frames(small_config):
    """End-of-stream close must flush every queued frame before the
    sockets go down: a live-but-slow client that reads NOTHING until
    ``serve`` returns still decodes the whole stream byte-exactly.
    (Regression: close() used to abort writer threads mid-queue, so the
    tail of the stream was lost whenever the producer outran a reader —
    the intermittent 'peer closed mid-message' in the late-joiner test.)"""
    cfg = dataclasses.replace(small_config, port=0)
    n_frames = 8
    server = BroadcastServer(
        cfg,
        SyntheticSource(cfg, seed=5),
        verbose=False,
        overlay_status=False,
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()
    cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
    cli.connect()
    t.join(timeout=30)  # server produces + closes while we read nothing
    assert not t.is_alive()

    replay = SyntheticSource(cfg, seed=5)
    prev = next(replay).copy()
    np.testing.assert_array_equal(cli.frame, prev)
    for _ in range(n_frames):
        frame = next(replay)
        prev, *_ = ref.step_oracle(prev, frame, cfg)
        _, recon = cli.read_frame()
    np.testing.assert_array_equal(recon, prev)
    cli.close()


def test_v3_mode_flips_and_late_joiner(small_config, tmp_path):
    """v3 over broadcast: a density schedule flips delta16->bitmask->raw
    while a late joiner (admitted after the raw frame) stays byte-exact —
    the encoder's shadow doubles as the joiner base."""
    from cudavideostream_tpu.runtime.sources import FileSource
    from tests.test_runtime import TestWireV3Loopback

    rng = np.random.default_rng(77)
    cfg = dataclasses.replace(small_config, port=0, wire_format="v3")
    stack = TestWireV3Loopback._density_stack(cfg, rng)
    # repeat the schedule so a late joiner sees every mode too
    stack = np.concatenate([stack, stack[1:]])
    path = str(tmp_path / "stack.npy")
    np.save(path, stack)
    n_frames = len(stack) - 1

    # Deterministic late join: under load the server can race through
    # every frame before the joiner is admitted (its connect() then
    # dies on a closed listener — the old flake). Gate the SOURCE just
    # past the raw frame until the joiner's connection is pending, so
    # admission is guaranteed to happen mid-stream, after the raw.
    gate = threading.Event()

    class _GatedSource:
        def __init__(self, inner, gate_at):
            self.inner, self.gate_at, self.i = inner, gate_at, 0

        def base_frame(self):
            return self.inner.base_frame()

        def __next__(self):
            self.i += 1
            if self.i == self.gate_at:
                gate.wait(timeout=30)
            return next(self.inner)

    server = BroadcastServer(
        cfg, _GatedSource(FileSource(path, cfg, loop=False), gate_at=5),
        verbose=False, overlay_status=False,
    )
    server.listen()
    port = server.port
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()

    cli1 = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
    cli1.connect()
    assert cli1.wire_format == "v3"
    prev = stack[0].copy()
    np.testing.assert_array_equal(cli1.frame, prev)

    state2 = {}

    def late_reader():
        cli2 = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
        cli2.connect()
        assert cli2.wire_format == "v3"
        state2["base"] = cli2.frame.copy()
        n = 0
        try:
            while True:
                _, recon2 = cli2.read_frame()
                state2["last"] = recon2.copy()
                n += 1
        except (ConnectionError, ValueError, OSError):
            pass
        state2["count"] = n
        cli2.close()

    # joiner starts once the raw frame (frame 3) is certainly produced
    # (the source gate holds the server just before frame 5)
    reader = threading.Thread(target=late_reader, daemon=True)
    reader.start()
    deadline = time.time() + 15
    while server._pending.empty():
        assert time.time() < deadline, "joiner connection never queued"
        time.sleep(0.01)
    gate.set()  # server proceeds; admission at the next frame boundary

    for k in range(n_frames):
        prev, *_ = ref.step_oracle(prev, stack[k + 1], cfg)
        _, recon1 = cli1.read_frame()
        np.testing.assert_array_equal(recon1, prev)

    t.join(timeout=30)
    reader.join(timeout=30)
    np.testing.assert_array_equal(recon1, prev)
    assert state2["count"] >= 1
    np.testing.assert_array_equal(state2["last"], prev)
    cli1.close()


def test_v3_overflow_raw_resync(small_config):
    """payload_capacity overflow under wire v3: every broadcast client
    gets one raw resync frame (not a dead server), deltas resume after,
    and reconstruction stays byte-exact vs the oracle."""
    from conftest import ScriptedSource
    from cudavideostream_tpu.config import PayloadOverflowError  # noqa: F401

    cap = 1500
    cfg = dataclasses.replace(
        small_config, port=0, wire_format="v3", payload_capacity=cap
    )
    base = np.zeros(cfg.frame_bytes, np.uint8)
    f1 = base.copy()
    f1[:500] = 100
    f2 = f1.copy()
    f2[2000:5700] += 200  # 3700 > cap, ~40% dense (bitmask-natural)
    f3 = f2.copy()
    f3[100:400] += 50
    frames = [f1, f2, f3]

    server = BroadcastServer(
        cfg, ScriptedSource(base, frames), verbose=False,
        overlay_status=False,
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": len(frames)}, daemon=True
    )
    t.start()

    cli = DeltaStreamClient(
        "127.0.0.1", server.port, cfg.height, cfg.width, wire_format="auto"
    )
    cli.connect()

    prev = base.copy()
    expected = []
    for f in frames:
        prev, *_ = ref.step_oracle(prev, f, cfg)
        expected.append(prev.copy())

    got = []
    try:
        while True:
            pos, recon = cli.read_frame()
            got.append((pos, recon.copy()))  # buffer is mutable/aliased
    except (ConnectionError, OSError):
        pass
    finally:
        cli.close()
    t.join(timeout=30)

    positions = [p for p, _ in got]
    assert positions.count(cfg.frame_bytes) == 1, positions  # one raw
    assert 0 < positions[-1] < cfg.frame_bytes, positions  # deltas resume
    for (_, recon), exp in zip(got, expected):
        np.testing.assert_array_equal(recon, exp)


def test_v1_overflow_fatal_closes_clients(small_config):
    """v1 cannot resync: overflow must propagate AND release every
    connected client with EOF (not leave them blocked on recv)."""
    import socket as socket_mod

    from conftest import ScriptedSource
    from cudavideostream_tpu.config import PayloadOverflowError

    cfg = dataclasses.replace(
        small_config, port=0, wire_format="v1", payload_capacity=1500
    )
    base = np.zeros(cfg.frame_bytes, np.uint8)
    f1 = base.copy()
    f1[:500] = 100
    f2 = f1.copy()
    f2[2000:5700] += 200  # 3700 > cap
    server = BroadcastServer(
        cfg, ScriptedSource(base, [f1, f2]), verbose=False,
        overlay_status=False,
    )
    server.listen()

    got_eof = {}

    def drain():
        s = socket_mod.create_connection(("127.0.0.1", server.port))
        s.settimeout(20)
        try:
            while True:
                b = s.recv(1 << 16)
                if not b:
                    got_eof["eof"] = True
                    return
        except OSError:
            got_eof["eof"] = True  # reset also unblocks the client
        finally:
            s.close()

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    with pytest.raises(PayloadOverflowError):
        server.serve(max_frames=2)
    t.join(timeout=30)
    assert got_eof.get("eof"), "client still blocked after fatal overflow"


def test_pipelined_tail_flushed(small_config):
    """A pipelined executor lags one frame; end-of-stream must flush the
    pending payload to broadcast clients (solo-server parity) — without
    it the last frame is silently dropped."""
    from cudavideostream_tpu.runtime.executor import PipelinedExecutor

    cfg = dataclasses.replace(small_config, port=0)
    n_frames = 4
    server = BroadcastServer(
        cfg, SyntheticSource(cfg, seed=5), verbose=False,
        overlay_status=False, executor=PipelinedExecutor(cfg),
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()
    cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
    cli.connect()

    replay = SyntheticSource(cfg, seed=5)
    prev = next(replay).copy()
    np.testing.assert_array_equal(cli.frame, prev)
    count = 0
    try:
        while True:
            _, recon = cli.read_frame()
            last = recon.copy()
            count += 1
    except (ConnectionError, OSError):
        pass
    finally:
        cli.close()
    t.join(timeout=30)
    # every source frame reaches the client, including the lagged tail
    assert count == n_frames
    for _ in range(n_frames):
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    np.testing.assert_array_equal(last, prev)


def test_land_batch_mask_v4_broadcast(small_config):
    """Broadcast over a depth-K batched landing with the mask fetch and
    the v4 zero-index wire: payloads fan out in K-frame bursts, the tail
    flushes, and every client stays byte-exact vs the oracle replay."""
    from cudavideostream_tpu.runtime.executor import BatchedLandExecutor

    cfg = dataclasses.replace(
        small_config, port=0, tiled_payload=True, fetch_mode="mask",
        emit_bitmask=True, mask_payload=True, wire_format="v4",
    )
    K, n_frames = 4, 10          # non-multiple of K: exercises the flush
    server = BroadcastServer(
        cfg, SyntheticSource(cfg, seed=7), verbose=False,
        overlay_status=False, executor=BatchedLandExecutor(cfg, depth=K),
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()
    cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width,
                            wire_format="auto")
    cli.connect()

    replay = SyntheticSource(cfg, seed=7)
    prev = next(replay).copy()
    np.testing.assert_array_equal(cli.frame, prev)
    count, last = 0, None
    try:
        while True:
            _, recon = cli.read_frame()
            last = recon.copy()
            count += 1
    except (ConnectionError, OSError):
        pass
    finally:
        cli.close()
    t.join(timeout=60)
    assert count == n_frames
    for _ in range(n_frames):
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    np.testing.assert_array_equal(last, prev)
