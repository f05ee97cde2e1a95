"""Multi-stream server: B cameras on one chip, per-stream byte-exact
reconstruction over real sockets."""

import time
import threading

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.client import DeltaStreamClient
from cudavideostream_tpu.runtime.multiserve import MultiStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource


def _sync_oracle_to_base(base, cfg, replay, max_skip=16):
    """Clients join at a frame boundary: advance the oracle until its
    reconstruction equals the received base. Returns the synced state."""
    prev = next(replay).copy()
    for _ in range(max_skip):
        if np.array_equal(base, prev):
            return prev
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    assert np.array_equal(base, prev), (
        "client base is not any frame-boundary reconstruction"
    )
    return prev


@pytest.mark.parametrize(
    "wire_format,mesh_shape,tiled,fetch",
    [
        ("v1", None, False, "auto"),
        ("v2", None, False, "auto"),
        ("v1", None, True, "auto"),   # batched super-frame fast path
        ("v2", None, True, "auto"),
        ("v1", None, True, "flat"),   # forced merge+prefix landing
        ("v1", (2, 4), False, "auto"),
        ("v2", (2, 4), False, "auto"),
        ("v3", None, False, "auto"),
        ("v3", None, True, "auto"),   # v3 over the batched fast path
        ("v3", (2, 4), False, "auto"),
    ],
)
def test_two_streams_byte_exact(small_config, wire_format, mesh_shape, tiled,
                                fetch):
    import dataclasses

    import jax

    cfg = dataclasses.replace(
        small_config, port=0, wire_format=wire_format, tiled_payload=tiled,
        fetch_mode=fetch,
    )
    mesh = None
    if mesh_shape is not None:
        if len(jax.devices()) < mesh_shape[0] * mesh_shape[1]:
            pytest.skip("needs a virtual device mesh")
        from cudavideostream_tpu.runtime.sharded_executor import make_mesh

        # streams shard across data, image rows across space: the
        # scale-out serving topology, byte-exact vs the same oracle
        mesh = make_mesh(*mesh_shape)
    B, n_frames = 2, 8
    server = MultiStreamServer(
        cfg,
        [SyntheticSource(cfg, seed=b) for b in range(B)],
        verbose=False,
        overlay_status=False,
        mesh=mesh,
    )
    server.listen()
    ports = server.ports
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()

    clients = []
    for b in range(B):
        cli = DeltaStreamClient("127.0.0.1", ports[b], cfg.height, cfg.width)
        cli.connect()
        clients.append(cli)

    # per-stream oracle, synced to whichever boundary each client joined
    replays = [SyntheticSource(cfg, seed=b) for b in range(B)]
    prevs = [
        _sync_oracle_to_base(clients[b].frame, cfg, replays[b])
        for b in range(B)
    ]
    decoded = [0] * B

    def drain(b):
        nonlocal prevs
        try:
            while True:
                _, recon = clients[b].read_frame()
                prevs[b], *_ = ref.step_oracle(
                    prevs[b], next(replays[b]), cfg
                )
                np.testing.assert_array_equal(recon, prevs[b])
                decoded[b] += 1
        except (ConnectionError, OSError):
            pass

    threads = [threading.Thread(target=drain, args=(b,)) for b in range(B)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    t.join(timeout=30)
    assert all(d > 0 for d in decoded)
    assert (prevs[0] != prevs[1]).any()  # genuinely independent streams


def test_late_joiner_gets_current_reconstruction(small_config):
    import dataclasses

    cfg = dataclasses.replace(small_config, port=0)
    server = MultiStreamServer(
        cfg, [SyntheticSource(cfg, seed=5)], verbose=False,
        overlay_status=False,
    )
    server.listen()
    port = server.ports[0]
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": 6}, daemon=True
    )
    t.start()
    # first client consumes 3 frames then leaves
    cli = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
    cli.connect()
    for _ in range(3):
        _, last = cli.read_frame()
    last = last.copy()
    cli.close()
    # oracle of the full stream
    replay = SyntheticSource(cfg, seed=5)
    prev = next(replay).copy()
    for _ in range(3):
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    np.testing.assert_array_equal(last, prev)
    # late joiner: base frame == reconstruction at its join boundary,
    # and subsequent deltas keep tracking the oracle
    cli2 = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
    cli2.connect()
    base2 = cli2.frame.copy()
    # the join happens at some frame boundary >= 3; advance the oracle
    # until it matches, then track
    matched = np.array_equal(base2, prev)
    for _ in range(6):
        if matched:
            break
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
        matched = np.array_equal(base2, prev)
    assert matched, "joiner base is not any frame-boundary reconstruction"
    try:
        while True:
            _, recon = cli2.read_frame()
            prev, *_ = ref.step_oracle(prev, next(replay), cfg)
            np.testing.assert_array_equal(recon, prev)
    except (ConnectionError, OSError):
        pass
    cli2.close()
    t.join(timeout=30)


def test_checkpoint_resume_roundtrip(small_config, tmp_path):
    """Serve N frames with --checkpoint-to, restart with --resume-from:
    the resumed server's base frame is the checkpointed reconstruction
    and subsequent deltas track the oracle byte-exactly."""
    import dataclasses

    cfg = dataclasses.replace(small_config, port=0, tiled_payload=True)
    ckpt = str(tmp_path / "ms_state")
    server = MultiStreamServer(
        cfg, [SyntheticSource(cfg, seed=4)], verbose=False,
        overlay_status=False,
    )
    server.listen()
    t = threading.Thread(
        target=server.serve,
        kwargs={"max_frames": 3, "checkpoint_to": ckpt},
        daemon=True,
    )
    t.start()
    cli = DeltaStreamClient(
        "127.0.0.1", server.ports[0], cfg.height, cfg.width
    )
    cli.connect()
    last = None
    for _ in range(3):
        _, last = cli.read_frame()
    last = last.copy()
    cli.close()
    t.join(timeout=30)

    # oracle of the served stream
    replay = SyntheticSource(cfg, seed=4)
    prev = next(replay).copy()
    for _ in range(3):
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    np.testing.assert_array_equal(last, prev)

    # resumed server: base == checkpointed reconstruction; the restarted
    # synthetic source replays from its seed, and deltas stay byte-exact
    server2 = MultiStreamServer(
        cfg, [SyntheticSource(cfg, seed=4)], verbose=False,
        overlay_status=False,
    )
    server2.listen()
    t2 = threading.Thread(
        target=server2.serve,
        kwargs={"max_frames": 2, "resume_from": ckpt},
        daemon=True,
    )
    t2.start()
    cli2 = DeltaStreamClient(
        "127.0.0.1", server2.ports[0], cfg.height, cfg.width
    )
    cli2.connect()
    np.testing.assert_array_equal(cli2.frame, prev)
    # resume never calls base_frame(), so the restarted source serves
    # from its first frame
    replay2 = SyntheticSource(cfg, seed=4)
    prev2 = prev
    for _ in range(2):
        prev2, *_ = ref.step_oracle(prev2, next(replay2), cfg)
        _, recon = cli2.read_frame()
        np.testing.assert_array_equal(recon, prev2)
    cli2.close()
    t2.join(timeout=30)


def test_resume_geometry_mismatch_rejected(small_config, tmp_path):
    import dataclasses

    cfg = dataclasses.replace(small_config, port=0)
    ckpt = str(tmp_path / "bad")
    np.savez(ckpt, recon=np.zeros((2, cfg.frame_bytes), np.uint8),
             geometry=np.array([2, cfg.height, cfg.width]))
    server = MultiStreamServer(
        cfg, [SyntheticSource(cfg, seed=1)], verbose=False,
        overlay_status=False,
    )
    server.listen()
    with pytest.raises(ValueError, match="geometry"):
        server.serve(max_frames=1, resume_from=ckpt,
                     wait_first_client=False)
    server.close()


def test_sharded_lander_pinned_to_shards(small_config):
    """The sharded payload layout promises zero payload collectives; a
    device-side merge over space-sharded blocks would gather every shard
    per frame, so the lander must be pinned to the per-shard
    count-prefix path even when the link model would prefer the merge."""
    import dataclasses

    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs a virtual device mesh")
    from cudavideostream_tpu.runtime.sharded_executor import make_mesh

    cfg = dataclasses.replace(small_config, port=0)
    server = MultiStreamServer(
        cfg, [SyntheticSource(cfg, seed=1)], verbose=False,
        overlay_status=False, mesh=make_mesh(1, 4),
    )
    assert server._lander.mode == "shards"
    # the "shards" mode never consults the link model (land_many skips
    # use_flat entirely); use_flat itself stays merge-free only for the
    # explicit tiles mode, so assert the mode pinning directly
    server.close()


def test_v3_overflow_resyncs_one_stream_only(small_config):
    """Per-stream capacity overflow on the batched flat path: the
    overflowing stream gets a raw resync, the healthy stream's deltas
    are untouched, both stay byte-exact."""
    import dataclasses

    from conftest import ScriptedSource

    cap = 1500
    cfg = dataclasses.replace(
        small_config, port=0, wire_format="v3", payload_capacity=cap
    )
    base = np.zeros(cfg.frame_bytes, np.uint8)
    # stream 0: small deltas every frame (never overflows)
    s0 = []
    prev0 = base
    for k in range(3):
        f = prev0.copy()
        f[50 * k : 50 * k + 200] += 60
        s0.append(f)
        prev0 = f
    # stream 1: small, OVERFLOW (~40% dense), small
    f1 = base.copy()
    f1[:500] = 100
    f2 = f1.copy()
    f2[2000:5700] += 200  # 3700 > cap
    f3 = f2.copy()
    f3[100:400] += 50
    s1 = [f1, f2, f3]

    server = MultiStreamServer(
        cfg,
        [ScriptedSource(base, s0), ScriptedSource(base, s1)],
        verbose=False,
        overlay_status=False,
    )
    server.listen()
    ports = server.ports

    # connect BOTH clients before serving starts, so each is admitted at
    # the first frame boundary with the true base frame
    clients = []
    socks = []
    import socket as socket_mod

    for b in range(2):
        socks.append(socket_mod.create_connection(("127.0.0.1", ports[b])))
    # wait until BOTH conns are queued: serve() starts as soon as ONE
    # pending client exists, and a late accept would be admitted a frame
    # later with a mid-stream recon as its base
    deadline = time.time() + 10
    while any(server._pending[b].empty() for b in range(2)):
        assert time.time() < deadline, "accept threads never queued conns"
        time.sleep(0.01)
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": 3}, daemon=True
    )
    t.start()
    from cudavideostream_tpu.runtime import wire as wire_mod

    for b in range(2):
        cli = DeltaStreamClient(
            "127.0.0.1", ports[b], cfg.height, cfg.width, wire_format="v3"
        )
        # connect() minus the socket creation (ours pre-dates serve())
        cli.sock = socks[b]
        assert cli._read_exact(len(wire_mod.MAGIC_V3)) == wire_mod.MAGIC_V3
        cli.frame = np.frombuffer(
            cli._read_exact(cli.n_bytes), dtype=np.uint8
        ).copy()
        np.testing.assert_array_equal(cli.frame, base)
        clients.append(cli)

    def expect(frames):
        prev, out = base.copy(), []
        for f in frames:
            prev, *_ = ref.step_oracle(prev, f, cfg)
            out.append(prev.copy())
        return out

    exp = [expect(s0), expect(s1)]
    got = [[], []]

    def drain(b):
        try:
            while True:
                pos, recon = clients[b].read_frame()
                got[b].append((pos, recon.copy()))  # mutable buffer
        except (ConnectionError, OSError):
            pass
        finally:
            clients[b].close()

    threads = [threading.Thread(target=drain, args=(b,)) for b in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=60)
    t.join(timeout=30)

    pos0 = [p for p, _ in got[0]]
    pos1 = [p for p, _ in got[1]]
    assert pos0.count(cfg.frame_bytes) == 0, pos0  # healthy stream: no raw
    assert pos1.count(cfg.frame_bytes) == 1, pos1  # one raw resync
    assert 0 < pos1[-1] < cfg.frame_bytes, pos1    # deltas resume
    for (_, recon), e in zip(got[0], exp[0]):
        np.testing.assert_array_equal(recon, e)
    for (_, recon), e in zip(got[1], exp[1]):
        np.testing.assert_array_equal(recon, e)


def test_aux_dir_dumps_per_stream_ppms(small_config, tmp_path):
    """--visualizer needs an observable sink: aux frames dump per stream
    as PPMs (the multi-stream analogue of server.py --aux-dir)."""
    import dataclasses
    import os

    from cudavideostream_tpu.config import Visualizer

    cfg = dataclasses.replace(
        small_config, port=0, tiled_payload=True,
        visualizer=Visualizer.HEATMAP,
    )
    server = MultiStreamServer(
        cfg, [SyntheticSource(cfg, seed=b) for b in range(2)],
        verbose=False, overlay_status=False,
        aux_dir=str(tmp_path), aux_every=2,
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": 4}, daemon=True
    )
    t.start()
    clients = []
    for b in range(2):
        cli = DeltaStreamClient(
            "127.0.0.1", server.ports[b], cfg.height, cfg.width
        )
        cli.connect()
        clients.append(cli)
    for cli in clients:
        try:
            while True:
                cli.read_frame()
        except (ConnectionError, OSError):
            cli.close()
    t.join(timeout=30)
    names = sorted(os.listdir(tmp_path))
    # frames 0 and 2 dumped for both streams
    assert [n for n in names if n.startswith("aux_0_")], names
    assert [n for n in names if n.startswith("aux_1_")], names
    with open(tmp_path / names[0], "rb") as f:
        assert f.read(2) == b"P6"
