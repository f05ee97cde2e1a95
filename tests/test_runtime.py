"""Host runtime tests: sources, tiered fetch, and the full TCP loopback —
the rebuild's version of the reference's two-process localhost validation
(server + client over 127.0.0.1, threads.cpp:187 / client/opencv.cpp:23)."""

import threading

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.client import DeltaStreamClient
from cudavideostream_tpu.runtime.executor import StreamExecutor, TieredFetcher
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import (
    FileSource,
    SyntheticSource,
    make_source,
)


class TestSources:
    def test_synthetic_deterministic(self, small_config):
        a = SyntheticSource(small_config, seed=7)
        b = SyntheticSource(small_config, seed=7)
        for _ in range(3):
            np.testing.assert_array_equal(next(a), next(b))

    def test_synthetic_changes_over_time(self, small_config):
        s = SyntheticSource(small_config, seed=1)
        f1, f2 = next(s), next(s)
        assert (f1 != f2).any()
        assert f1.shape == (small_config.frame_bytes,)

    def test_file_source_npy(self, tmp_path, rng, small_config):
        frames = rng.integers(
            0, 255, (4, small_config.frame_bytes), endpoint=True, dtype=np.uint8
        )
        path = tmp_path / "clip.npy"
        np.save(path, frames)
        src = FileSource(str(path), small_config)
        for i in range(6):  # loops past the end
            np.testing.assert_array_equal(next(src), frames[i % 4])

    def test_file_source_raw(self, tmp_path, rng, small_config):
        frames = rng.integers(
            0, 255, (2, small_config.frame_bytes), endpoint=True, dtype=np.uint8
        )
        path = tmp_path / "clip.bgr"
        frames.tofile(path)
        src = FileSource(str(path), small_config)
        np.testing.assert_array_equal(next(src), frames[0])

    def test_file_source_size_mismatch(self, tmp_path, rng, small_config):
        np.save(tmp_path / "bad.npy", rng.integers(0, 255, (2, 100), dtype=np.int64))
        with pytest.raises(ValueError):
            FileSource(str(tmp_path / "bad.npy"), small_config)

    def test_make_source_unknown(self, small_config):
        with pytest.raises(ValueError):
            make_source("webcam9000", small_config)

    def test_decode_mjpg_frame(self, small_config):
        """MJPG camera frames decode to flat BGR24 (PIL round-trip: a
        smooth ramp survives JPEG within a small tolerance; wrong
        geometry and garbage are hard errors, never silent garbage)."""
        import io

        PIL = pytest.importorskip("PIL.Image")
        from cudavideostream_tpu.runtime.sources import decode_mjpg_frame

        h, w = small_config.height, small_config.width
        y = np.arange(h)[:, None]
        x = np.arange(w)[None, :]
        rgb = np.stack(
            [
                (255 * y // max(1, h - 1)).repeat(w, 1),
                (255 * x // max(1, w - 1)).repeat(h, 0),
                np.full((h, w), 128),
            ],
            axis=-1,
        ).astype(np.uint8)
        buf = io.BytesIO()
        PIL.fromarray(rgb).save(buf, format="JPEG", quality=95)
        flat = decode_mjpg_frame(buf.getvalue(), h, w)
        assert flat.shape == (small_config.frame_bytes,)
        got = flat.reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
        assert np.abs(got.astype(int) - rgb.astype(int)).mean() < 3.0
        with pytest.raises(RuntimeError, match="expected"):
            decode_mjpg_frame(buf.getvalue(), h + 8, w)
        with pytest.raises(RuntimeError, match="decode failed"):
            decode_mjpg_frame(b"not a jpeg", h, w)

    def test_device_synthetic(self, small_config):
        import jax

        from cudavideostream_tpu.runtime.sources import device_synthetic_frames

        init, next_frame = device_synthetic_frames(small_config)
        f = next_frame(jax.random.PRNGKey(1), 3)
        assert f.shape == (small_config.frame_bytes,)
        assert f.dtype == np.uint8

    def test_device_synthetic_noise_bank(self, small_config):
        """Bank mode: frames are a pure function of (seed, t), same shape/
        dtype contract, same per-byte noise distribution class (banked
        planes reuse the hash), and consecutive frames differ."""
        import jax

        from cudavideostream_tpu.runtime.sources import device_synthetic_frames

        init_a, nf_a = device_synthetic_frames(small_config, seed=0,
                                               noise_bank=4)
        init_b, nf_b = device_synthetic_frames(small_config, seed=0,
                                               noise_bank=4)
        np.testing.assert_array_equal(np.asarray(init_a), np.asarray(init_b))
        k = jax.random.PRNGKey(1)
        f3a = np.asarray(nf_a(k, 3))
        f3b = np.asarray(nf_b(k, 3))
        np.testing.assert_array_equal(f3a, f3b)  # pure in (seed, t)
        assert f3a.shape == (small_config.frame_bytes,)
        assert f3a.dtype == np.uint8
        f4 = np.asarray(nf_a(k, 4))
        assert (f3a != f4).any()  # adjacent planes are independent


class TestTieredFetcher:
    def test_tiers_cover_capacity(self):
        import jax.numpy as jnp

        f = TieredFetcher(100_000, min_tier=1024)
        arr = jnp.arange(100_000, dtype=jnp.int32)
        for pos in (0, 1, 1023, 1024, 5000, 99_999, 100_000):
            out = f.fetch(arr, pos)
            assert out.shape == (pos,)
            np.testing.assert_array_equal(out, np.arange(pos))


class TestLoopback:
    def test_server_client_byte_exact(self, small_config):
        """End to end over a real socket: client reconstruction must equal
        an oracle replay of the same source, frame for frame."""
        import dataclasses

        cfg = dataclasses.replace(small_config, port=0)
        n_frames = 4
        server = DeltaStreamServer(
            cfg,
            SyntheticSource(cfg, seed=3),
            verbose=False,
            overlay_status=False,
        )
        server.listen()
        port = server.port
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
        )
        t.start()

        cli = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
        cli.connect()

        # oracle replay of the same deterministic source
        replay = SyntheticSource(cfg, seed=3)
        prev = next(replay).copy()
        np.testing.assert_array_equal(cli.frame, prev)
        positions = []
        for _ in range(n_frames):
            frame = next(replay)
            prev, _, _, _, _ = ref.step_oracle(prev, frame, cfg)
            pos, recon = cli.read_frame()
            positions.append(pos)
            np.testing.assert_array_equal(recon, prev)
        cli.close()
        t.join(timeout=30)
        assert positions[0] > 0

    @staticmethod
    def _capture_stream(cfg, n_frames=3, seed=3):
        """Raw byte capture of a full served session."""
        import dataclasses
        import socket

        cfg = dataclasses.replace(cfg, port=0)
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=seed), verbose=False,
            overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
        )
        t.start()
        sock = socket.create_connection(("127.0.0.1", server.port))
        chunks = []
        while True:
            b = sock.recv(1 << 16)
            if not b:
                break
            chunks.append(b)
        sock.close()
        t.join(timeout=30)
        return b"".join(chunks)

    def test_tiled_wire_bytes_identical(self, small_config):
        """The tiled payload path (per-tile blocks + scatter-gather
        sender, no device merge) must produce byte-identical wire output
        to the flat path — the whole point of wire_send_segments."""
        import dataclasses

        flat = self._capture_stream(small_config)
        tiled = self._capture_stream(
            dataclasses.replace(small_config, tiled_payload=True)
        )
        assert flat == tiled
        assert len(flat) > small_config.frame_bytes  # base + payloads

    def test_flat_fetch_wire_bytes_identical(self, small_config):
        """fetch_mode=flat (device merge + flat sender) must put the same
        bytes on the wire as the tiles fetch (scatter-gather sender)."""
        import dataclasses

        flat = self._capture_stream(small_config)
        merged = self._capture_stream(
            dataclasses.replace(
                small_config, tiled_payload=True, fetch_mode="flat"
            )
        )
        assert flat == merged

    def test_host_backend_wire_bytes_identical(self, small_config):
        """--compaction host (device bitmask + C ctz packer) produces
        byte-identical wire output to the device Pallas path."""
        import dataclasses

        from cudavideostream_tpu.config import CompactionBackend

        flat = self._capture_stream(small_config)
        host = self._capture_stream(
            dataclasses.replace(
                small_config, compaction=CompactionBackend.HOST
            )
        )
        assert flat == host

    def test_reconnect_gets_fresh_base(self, small_config):
        import dataclasses

        cfg = dataclasses.replace(small_config, port=0)
        server = DeltaStreamServer(
            cfg,
            SyntheticSource(cfg, seed=5),
            verbose=False,
            overlay_status=False,
        )
        server.listen()
        port = server.port
        t = threading.Thread(
            target=server.serve,
            kwargs={"max_frames": 2, "max_clients": 2},
            daemon=True,
        )
        t.start()
        for _ in range(2):
            cli = DeltaStreamClient("127.0.0.1", port, cfg.height, cfg.width)
            cli.connect()
            for _ in range(2):
                cli.read_frame()
            cli.close()
        t.join(timeout=30)


class TestSoak:
    def test_long_stream_with_midstream_fetch_flips(self, small_config, rng):
        """60-frame soak on the tiled auto executor: the link model is
        flipped between tunnel-class and PCIe-class mid-stream, so the
        landing alternates between block fetch and device merge+flat —
        every frame must stay byte-exact vs the oracle and both landings
        must actually occur."""
        import dataclasses

        from cudavideostream_tpu.runtime import wire

        # subtile_rows=0 (whole-tile units): at sub_rows=1 this tiny
        # geometry's narrow-dtype blocks (2 B/slot x 72 units) are
        # cheaper than the 4096-entry minimum flat tier at EVERY link
        # speed, so the flat landing would be unreachable — the flip
        # machinery, not the threshold, is what's under test
        cfg = dataclasses.replace(
            small_config, tiled_payload=True, subtile_rows=0
        )
        ex = StreamExecutor(cfg)
        src = SyntheticSource(cfg, seed=11)
        base = next(src).copy()
        ex.start(base)
        prev = base.copy()
        for k in range(60):
            # alternate the measured-link regime every 7 frames. (4 MB/s,
            # not the tunnel's 16: whole-tile blocks at this geometry are
            # only ~1.3x the flat path's bytes and a slower link is
            # needed to tip the decision.)
            if k % 14 < 7:
                ex.link.bps = 4e6       # slow link: flat should win
            else:
                ex.link.bps = 10e9      # PCIe-class: tiles should win
            ex.link.merge_s = 1e-3
            frame = next(src)
            pos, a, b, _ = ex.process(frame)
            if isinstance(a, wire.TiledPayload):
                xs, vals = a.to_flat()
            else:
                xs, vals = a, b
            prev2, pr, xr, vr, _ = ref.step_oracle(prev, frame, cfg)
            assert pos == pr, k
            np.testing.assert_array_equal(xs, xr)
            np.testing.assert_array_equal(vals, vr)
            prev = prev2
        assert ex.fetch_counts["tiles"] > 0 and ex.fetch_counts["flat"] > 0
        assert ex.metrics.total_frames == 60


class TestExecutor:
    def test_process_matches_oracle(self, small_config, rng):
        ex = StreamExecutor(small_config)
        base = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        frame = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        pos, xs, vals, aux = ex.process(frame)
        pr, xr, vr, _ = ref.diff_encode(frame, base)
        assert pos == pr
        np.testing.assert_array_equal(xs, xr)
        np.testing.assert_array_equal(vals, vr)
        assert aux is None
        assert ex.metrics.total_frames == 1

    def test_tiled_payload_flattens_to_oracle(self, small_config, rng):
        import dataclasses

        cfg = dataclasses.replace(small_config, tiled_payload=True)
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        frame = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        pos, payload, vals, aux = ex.process(frame)
        from cudavideostream_tpu.runtime import wire

        assert isinstance(payload, wire.TiledPayload) and vals is None
        pr, xr, vr, _ = ref.diff_encode(frame, base)
        assert pos == pr == payload.pos
        fx, fv = payload.to_flat()
        np.testing.assert_array_equal(fx, xr)
        np.testing.assert_array_equal(fv, vr)

    def test_tiled_static_frame_sends_header_only(self, small_config, rng):
        import dataclasses

        cfg = dataclasses.replace(small_config, tiled_payload=True)
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        pos, payload, _, _ = ex.process(base)
        assert pos == 0
        assert payload.to_wire_bytes() == b"\x00\x00\x00\x00"

    def test_fetch_mode_flat_matches_oracle(self, small_config, rng):
        """fetch_mode=flat: device-side merge_tiles + prefix fetch lands
        the exact oracle payload as plain flat arrays."""
        import dataclasses

        cfg = dataclasses.replace(
            small_config, tiled_payload=True, fetch_mode="flat"
        )
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        for _ in range(3):
            frame = prev.copy()
            idx = rng.choice(cfg.frame_bytes, size=cfg.frame_bytes // 9,
                             replace=False)
            frame[idx] = rng.integers(0, 255, idx.size, endpoint=True,
                                      dtype=np.uint8)
            pos, xs, vals, _ = ex.process(frame)
            pr, xr, vr, new_prev = ref.diff_encode(frame, prev)
            assert isinstance(xs, np.ndarray)  # flat arrays, not TiledPayload
            assert pos == pr
            np.testing.assert_array_equal(xs, xr)
            np.testing.assert_array_equal(vals, vr)
            prev = new_prev
        assert ex.fetch_counts == {"tiles": 0, "flat": 3, "mask": 0}

    def test_fetch_mode_auto_decision(self, small_config):
        """The auto decision picks block fetch on fast links / clustered
        scenes and the merged flat prefix on slow links / scattered
        scenes, from the measured EMAs."""
        import dataclasses

        cfg = dataclasses.replace(small_config, tiled_payload=True)
        ex = StreamExecutor(cfg)
        # link unknown: always blocks (that's what measures the link)
        assert not ex._use_flat_fetch(pos=1000, t_hi=50, tile_cap=4096)
        # tunnel-class link, scattered change: 50 tiles of blocks move
        # ~1 MB for a 1000-entry payload — merge + 20 KB prefix wins
        ex.link.bps = 16e6
        ex.link.merge_s = 1e-3
        assert ex._use_flat_fetch(pos=1000, t_hi=50, tile_cap=4096)
        # same link, clustered change: one non-empty tile — blocks win
        assert not ex._use_flat_fetch(pos=1000, t_hi=1, tile_cap=4096)
        # PCIe-class link: blocks win even scattered (merge dominates)
        ex.link.bps = 10e9
        assert not ex._use_flat_fetch(pos=1000, t_hi=50, tile_cap=4096)
        # forced modes ignore the model
        ex_t = StreamExecutor(dataclasses.replace(cfg, fetch_mode="tiles"))
        ex_t.link.bps = 16e6
        assert not ex_t._use_flat_fetch(pos=1000, t_hi=50, tile_cap=4096)
        ex_f = StreamExecutor(dataclasses.replace(cfg, fetch_mode="flat"))
        assert ex_f._use_flat_fetch(pos=1000, t_hi=50, tile_cap=4096)

    def test_merge_tiles_matches_host_flatten(self, small_config, rng):
        """Device merge_tiles == host TiledPayload.to_flat (zero-padded)."""
        import dataclasses

        from cudavideostream_tpu.ops import logcompact
        from cudavideostream_tpu.runtime import wire

        cfg = dataclasses.replace(small_config, tiled_payload=True)
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        frame = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        out = ex.pipe.step(ex.pipe.init_state(base), frame)
        _, pos_d, counts_d, xs_t_d, vals_t_d, _ = out
        xs_d, vals_d = logcompact.merge_tiles(counts_d, xs_t_d, vals_t_d)
        pos = int(pos_d)
        payload = wire.TiledPayload(
            pos, np.asarray(counts_d), np.asarray(xs_t_d), np.asarray(vals_t_d)
        )
        fx, fv = payload.to_flat()
        np.testing.assert_array_equal(np.asarray(xs_d)[:pos], fx)
        np.testing.assert_array_equal(np.asarray(vals_d)[:pos], fv)
        # zero past pos (the wire invariant)
        assert not np.asarray(xs_d)[pos:].any()
        assert not np.asarray(vals_d)[pos:].any()


class TestWireV2Loopback:
    def test_v2_reconstruction_and_savings(self, small_config):
        """v2 (delta16) loopback: client reconstruction byte-exact vs the
        oracle replay, with materially fewer wire bytes than v1."""
        import dataclasses

        cfg = dataclasses.replace(small_config, port=0, wire_format="v2")
        n_frames = 3
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=3), verbose=False,
            overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
        )
        t.start()
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
        cli.connect()
        assert cli.wire_format == "v2"  # auto-sniffed the magic
        replay = SyntheticSource(cfg, seed=3)
        from cudavideostream_tpu.ops import reference_cpu as ref_mod

        prev = next(replay).copy()
        np.testing.assert_array_equal(cli.frame, prev)
        for _ in range(n_frames):
            frame = next(replay)
            prev, _, _, _, _ = ref_mod.step_oracle(prev, frame, cfg)
            pos, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
        cli.close()
        t.join(timeout=30)
        # size comparison on raw captures
        v1 = TestLoopback._capture_stream(small_config, n_frames=n_frames)
        import dataclasses as dc

        v2 = TestLoopback._capture_stream(
            dc.replace(small_config, wire_format="v2"), n_frames=n_frames
        )
        base = small_config.frame_bytes
        assert len(v2) - 16 - base < 0.75 * (len(v1) - base)

    def test_v2_record_replay_roundtrip(self, small_config, tmp_path):
        """A recorded v2 session replays byte-identically and the client
        reconstructs it (the magic prefix makes files self-describing)."""
        import dataclasses

        from cudavideostream_tpu.runtime.replay import ReplayServer

        cfg = dataclasses.replace(small_config, port=0, wire_format="v2")
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=8), verbose=False,
            overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": 3}, daemon=True
        )
        t.start()
        rec_path = str(tmp_path / "session.cvs")
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                cfg.width, record=rec_path)
        cli.connect()
        frames = [cli.read_frame()[1].copy() for _ in range(3)]
        cli.close()
        t.join(timeout=30)

        rp = ReplayServer(rec_path, cfg.frame_bytes, port=0, verbose=False)
        rp.listen()
        assert rp.v2 and len(rp.marks) == 3
        t2 = threading.Thread(target=rp.serve, daemon=True)
        t2.start()
        cli2 = DeltaStreamClient("127.0.0.1", rp.port, cfg.height, cfg.width)
        cli2.connect()
        for f in frames:
            _, recon = cli2.read_frame()
            np.testing.assert_array_equal(recon, f)
        cli2.close()
        t2.join(timeout=30)


class TestWireV3Loopback:
    """v3 adaptive wire: a scripted density schedule must flip through
    all three modes, reconstruct byte-exactly, and cap the wire bytes."""

    @staticmethod
    def _density_stack(cfg, rng):
        """[base, sparse, dense, full-change] frame stack: each regime
        lands in a different v3 mode at cfg.threshold=20."""
        n = cfg.frame_bytes
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        sparse = base.copy()
        idx = rng.choice(n, size=n // 100, replace=False)
        sparse[idx] = sparse[idx] + 100  # ~1% -> delta16
        dense = sparse.copy()
        idx = rng.choice(n, size=n // 4, replace=False)
        dense[idx] = dense[idx] + 100  # ~25% -> bitmask
        full = ((dense.astype(np.int16) + 130) % 256).astype(np.uint8)
        return np.stack([base, sparse, dense, full])

    def _serve_and_check(self, cfg, stack, tmp_path, rec_name="v3.cvs"):
        import dataclasses

        path = str(tmp_path / "stack.npy")
        np.save(path, stack)
        cfg = dataclasses.replace(cfg, port=0, wire_format="v3")
        server = DeltaStreamServer(
            cfg, FileSource(path, cfg, loop=False), verbose=False,
            overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": len(stack) - 1},
            daemon=True,
        )
        t.start()
        rec = str(tmp_path / rec_name)
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                cfg.width, record=rec)
        cli.connect()
        assert cli.wire_format == "v3"  # auto-sniffed the magic
        prev = stack[0].copy()
        np.testing.assert_array_equal(cli.frame, prev)
        for k in range(1, len(stack)):
            prev, _, _, _, _ = ref.step_oracle(prev, stack[k], cfg)
            _, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
        cli.close()
        t.join(timeout=30)
        return rec

    def test_modes_reconstruction_and_cap(self, small_config, rng, tmp_path):
        from cudavideostream_tpu.runtime import wire

        cfg = small_config
        stack = self._density_stack(cfg, rng)
        rec = self._serve_and_check(cfg, stack, tmp_path)
        data = open(rec, "rb").read()
        assert data.startswith(wire.MAGIC_V3)
        n = cfg.frame_bytes
        off = len(wire.MAGIC_V3) + n
        modes, sizes = [], []
        while off < len(data):
            _, _, _, _, used = wire.unpack_frame_v3(data, off, n)
            modes.append(data[off])
            sizes.append(used)
            off += used
        assert modes == [wire.MODE_DELTA16, wire.MODE_BITMASK, wire.MODE_RAW]
        assert all(s <= n + 1 for s in sizes)  # the worst-case cap
        # v1 would ship 5*pos for the full-change frame = 5x the raw frame
        assert sizes[-1] == n + 1 < 5 * n

    def test_v3_record_replay_roundtrip(self, small_config, rng, tmp_path):
        """A mixed-mode v3 recording replays byte-identically."""
        from cudavideostream_tpu.runtime.replay import ReplayServer

        cfg = small_config
        stack = self._density_stack(cfg, rng)
        rec = self._serve_and_check(cfg, stack, tmp_path)
        rp = ReplayServer(rec, cfg.frame_bytes, port=0, verbose=False)
        rp.listen()
        assert rp.v3 and len(rp.marks) == 3
        t2 = threading.Thread(target=rp.serve, daemon=True)
        t2.start()
        cli = DeltaStreamClient("127.0.0.1", rp.port, cfg.height, cfg.width)
        cli.connect()
        prev = stack[0].copy()
        for k in range(1, len(stack)):
            prev, _, _, _, _ = ref.step_oracle(prev, stack[k], cfg)
            _, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
        cli.close()
        t2.join(timeout=30)

    def test_v3_pipelined_and_tiled_executors(self, small_config, rng,
                                              tmp_path):
        """raw mode stays correct when payloads lag a frame (pipelined)
        and when they arrive as per-tile blocks (tiled)."""
        import dataclasses

        from cudavideostream_tpu.runtime.executor import PipelinedExecutor

        cfg = small_config
        stack = self._density_stack(cfg, rng)
        for variant in ("tiled", "pipelined"):
            vcfg = dataclasses.replace(
                cfg, port=0, wire_format="v3",
                tiled_payload=(variant == "tiled"),
            )
            path = str(tmp_path / f"stack_{variant}.npy")
            np.save(path, stack)
            executor = (
                PipelinedExecutor(vcfg) if variant == "pipelined" else None
            )
            server = DeltaStreamServer(
                vcfg, FileSource(path, vcfg, loop=False), executor=executor,
                verbose=False, overlay_status=False,
            )
            server.listen()
            t = threading.Thread(
                target=server.serve, kwargs={"max_frames": len(stack) - 1},
                daemon=True,
            )
            t.start()
            cli = DeltaStreamClient("127.0.0.1", server.port, vcfg.height,
                                    vcfg.width, wire_format="v3")
            cli.connect()
            prev = stack[0].copy()
            for k in range(1, len(stack)):
                prev, _, _, _, _ = ref.step_oracle(prev, stack[k], vcfg)
                _, recon = cli.read_frame()
                np.testing.assert_array_equal(recon, prev)
            cli.close()
            t.join(timeout=30)


class TestHostBackendFastPath:
    """HOST compaction: the host-source packer extracts values from its
    own frame + prev shadow; only the n/8 bitmask leaves the device."""

    def _run(self, cfg, frames, texts, monkeypatch=None):
        import dataclasses

        from cudavideostream_tpu import native
        from cudavideostream_tpu.config import CompactionBackend
        from cudavideostream_tpu.models import DeltaStreamPipeline
        from cudavideostream_tpu.utils import fonts

        cfg = dataclasses.replace(cfg, compaction=CompactionBackend("host"))
        pipe = DeltaStreamPipeline(cfg)
        assert pipe._host_fast
        if monkeypatch is not None:
            # the dense-delta path must never run on the fast path
            def boom(*a, **k):
                raise AssertionError("dense delta fetched on fast path")

            monkeypatch.setattr(native, "compact_bitmask_np", boom)
        state = pipe.init_state(frames[0])
        prev = frames[0].copy()
        for frame, text in zip(frames[1:], texts):
            state, pos, xs, vals, _ = pipe.step(state, frame, text=text)
            cid = fonts.encode_text(text) if text else None
            prev, e_pos, e_xs, e_vals, _ = ref.step_oracle(
                prev, frame, cfg, atlas=pipe.atlas_np if text else None,
                char_ids=cid,
            )
            assert pos == e_pos
            np.testing.assert_array_equal(xs, e_xs)
            np.testing.assert_array_equal(vals, e_vals)
            np.testing.assert_array_equal(np.asarray(state), prev)
            np.testing.assert_array_equal(pipe._host_prev, prev)

    def test_byte_exact_with_overlay_and_negfeed(self, small_config, rng,
                                                 monkeypatch):
        src = SyntheticSource(small_config, seed=5)
        frames = [next(src) for _ in range(5)]
        texts = ["", "FPS: 12 BW: 900 kbps", "FPS: 13 BW: 901 kbps",
                 "FPS: 13 BW: 901 kbps"]
        self._run(small_config, frames, texts, monkeypatch)

    def test_byte_exact_without_negative_feedback(self, small_config, rng,
                                                  monkeypatch):
        import dataclasses

        cfg = dataclasses.replace(small_config, negative_feedback=False)
        src = SyntheticSource(cfg, seed=6)
        frames = [next(src) for _ in range(4)]
        self._run(cfg, frames, ["", "FPS: 1", ""], monkeypatch)

    def test_step_before_init_state_raises(self, small_config):
        import dataclasses

        import jax.numpy as jnp

        from cudavideostream_tpu.config import CompactionBackend
        from cudavideostream_tpu.models import DeltaStreamPipeline

        cfg = dataclasses.replace(
            small_config, compaction=CompactionBackend("host"))
        pipe = DeltaStreamPipeline(cfg)
        prev = np.zeros(cfg.frame_bytes, np.uint8)
        with pytest.raises(RuntimeError, match="init_state"):
            pipe.step(jnp.asarray(prev), prev)

    def test_capacity_overflow_raises(self, small_config):
        """A frame that changes more bytes than payload_capacity must
        fail loudly, never silently truncate (the dropped deltas are
        already folded into prev — a v1/v2 client would diverge)."""
        import dataclasses

        from cudavideostream_tpu.config import (
            CompactionBackend,
            PayloadOverflowError,
        )
        from cudavideostream_tpu.models import DeltaStreamPipeline

        cfg = dataclasses.replace(
            small_config, compaction=CompactionBackend("host"),
            payload_capacity=64,
        )
        pipe = DeltaStreamPipeline(cfg)
        base = np.zeros(cfg.frame_bytes, np.uint8)
        state = pipe.init_state(base)
        cut = np.full(cfg.frame_bytes, 200, np.uint8)  # scene cut
        with pytest.raises(PayloadOverflowError):
            pipe.step(state, cut)

    def test_executor_capacity_overflow_raises(self, small_config):
        """Device flat path: TieredFetcher refuses to land a payload
        whose true pos exceeds the configured capacity."""
        import dataclasses

        from cudavideostream_tpu.config import (
            CompactionBackend,
            PayloadOverflowError,
        )
        from cudavideostream_tpu.runtime.executor import StreamExecutor

        cfg = dataclasses.replace(
            small_config, compaction=CompactionBackend("sort"),
            payload_capacity=64,
        )
        ex = StreamExecutor(cfg)
        ex.start(np.zeros(cfg.frame_bytes, np.uint8))
        with pytest.raises(PayloadOverflowError):
            ex.process(np.full(cfg.frame_bytes, 200, np.uint8))

    def test_noise_filter_takes_dense_path(self, small_config):
        import dataclasses

        from cudavideostream_tpu.config import CompactionBackend
        from cudavideostream_tpu.models import DeltaStreamPipeline

        cfg = dataclasses.replace(
            small_config, compaction=CompactionBackend("host"),
            noise_filter=True,
        )
        pipe = DeltaStreamPipeline(cfg)
        assert not pipe._host_fast
        src = SyntheticSource(cfg, seed=7)
        base = next(src)
        state = pipe.init_state(base)
        prev = base.copy()
        frame = next(src)
        state, pos, xs, vals, _ = pipe.step(state, frame)
        prev, e_pos, e_xs, e_vals, _ = ref.step_oracle(prev, frame, cfg)
        assert pos == e_pos
        np.testing.assert_array_equal(xs, e_xs)
        np.testing.assert_array_equal(vals, e_vals)


from conftest import ScriptedSource as _ScriptedSource  # noqa: E402


class TestOverflowResync:
    """Wire v3 recovers from a payload_capacity overflow with one raw
    resync frame instead of killing the stream; v1/v2 fail loudly
    (config.PayloadOverflowError — no way to resync those clients)."""

    CAPACITY = 1500

    def _script(self, cfg, n_tail=1):
        """[small, OVERFLOW (~40% density: bitmask-natural, so a raw
        frame on the wire proves the recovery path fired), small...]"""
        base = np.zeros(cfg.frame_bytes, np.uint8)
        f1 = base.copy()
        f1[:500] = 100
        f2 = f1.copy()
        f2[2000:5700] += 200  # 3700 changed bytes > CAPACITY
        frames = [f1, f2]
        prev_tail = f2
        for k in range(n_tail):
            ft = prev_tail.copy()
            ft[100 + 400 * k : 400 + 400 * k] += 50
            frames.append(ft)
            prev_tail = ft
        return base, frames

    def _make_executor(self, cfg, kind):
        if kind == "pipelined":
            from cudavideostream_tpu.runtime.executor import PipelinedExecutor

            return PipelinedExecutor(cfg)
        if kind == "oracle":
            from cudavideostream_tpu.runtime.oracle_executor import OracleExecutor

            return OracleExecutor(cfg)
        return None  # default StreamExecutor (device, pallas or host)

    @pytest.mark.parametrize(
        "kind,compaction",
        [
            ("device", "pallas"),
            ("device", "host"),
            ("pipelined", "pallas"),
            ("oracle", "pallas"),
        ],
    )
    def test_v3_raw_resync_keeps_client_exact(
        self, small_config, kind, compaction
    ):
        import dataclasses

        from cudavideostream_tpu.config import CompactionBackend

        cfg = dataclasses.replace(
            small_config,
            port=0,
            wire_format="v3",
            payload_capacity=self.CAPACITY,
            compaction=CompactionBackend(compaction),
        )
        n_tail = 2 if kind == "pipelined" else 1
        base, frames = self._script(cfg, n_tail=n_tail)
        server = DeltaStreamServer(
            cfg,
            _ScriptedSource(base, frames),
            executor=self._make_executor(cfg, kind),
            verbose=False,
            overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve,
            kwargs={"max_frames": len(frames)},
            daemon=True,
        )
        t.start()

        cli = DeltaStreamClient(
            "127.0.0.1", server.port, cfg.height, cfg.width,
            wire_format="auto",
        )
        cli.connect()
        np.testing.assert_array_equal(cli.frame, base)

        # expected stream state: the oracle replay (the spec)
        prev = base.copy()
        expected = []
        for f in frames:
            prev, _, _, _, _ = ref.step_oracle(prev, f, cfg)
            expected.append(prev.copy())

        got = []
        try:
            while True:
                pos, recon = cli.read_frame()
                got.append((pos, recon.copy()))  # read_frame returns the
                # client's mutable buffer — later applies would alias
        except ConnectionError:
            pass
        finally:
            cli.close()
        t.join(timeout=30)

        positions = [p for p, _ in got]
        # exactly one raw resync on the wire (pos == frame bytes); the
        # overflow frame is only ~40% dense, so natural v3 selection
        # would have picked bitmask — raw proves the recovery path
        assert positions.count(cfg.frame_bytes) == 1, positions
        # deltas resume after the resync
        assert 0 < positions[-1] < cfg.frame_bytes, positions
        # every payload lands the client on some oracle state, in order,
        # ending at the final one (pipelined recovery may skip frames —
        # documented in StreamExecutor.resync)
        exp_i = 0
        for _, recon in got:
            while exp_i < len(expected) and not np.array_equal(
                recon, expected[exp_i]
            ):
                exp_i += 1
            assert exp_i < len(expected), "client state matches no oracle state"
        np.testing.assert_array_equal(got[-1][1], expected[-1])

    @pytest.mark.parametrize("wire_format", ["v1", "v2"])
    def test_v1_v2_overflow_is_fatal(self, small_config, wire_format):
        import dataclasses
        import socket as socket_mod

        from cudavideostream_tpu.config import PayloadOverflowError

        cfg = dataclasses.replace(
            small_config,
            port=0,
            wire_format=wire_format,
            payload_capacity=self.CAPACITY,
        )
        base, frames = self._script(cfg)
        server = DeltaStreamServer(
            cfg,
            _ScriptedSource(base, frames),
            verbose=False,
            overlay_status=False,
        )
        server.listen()

        drained = []

        def drain():
            s = socket_mod.create_connection(("127.0.0.1", server.port))
            try:
                while True:
                    b = s.recv(1 << 16)
                    if not b:
                        break
                    drained.append(b)
            finally:
                s.close()

        t = threading.Thread(target=drain, daemon=True)
        t.start()
        with pytest.raises(PayloadOverflowError):
            server.serve(max_frames=len(frames))
        t.join(timeout=30)


class TestSustainedSoak:
    """Long mixed-feature loopback: hundreds of frames over a real
    socket with wire v3, a capacity bound (periodic scene cuts force
    raw resyncs), the pipelined executor, and a visualizer — the
    closest thing to a production soak the CPU backend can run.
    Every client state must match the oracle replay, in order."""

    def test_300_frames_with_periodic_resyncs(self, small_config):
        import dataclasses

        from cudavideostream_tpu.config import Visualizer
        from cudavideostream_tpu.runtime.executor import PipelinedExecutor

        cfg = dataclasses.replace(
            small_config,
            port=0,
            wire_format="v3",
            payload_capacity=2500,
            visualizer=Visualizer.HEATMAP,
        )
        n_frames = 300
        rng = np.random.default_rng(123)
        base = rng.integers(0, 256, cfg.frame_bytes, dtype=np.uint8)
        frames = []
        prev = base
        for t in range(n_frames):
            f = prev.copy()
            if t % 50 == 49:  # scene cut: ~60% of bytes change
                f[: int(cfg.frame_bytes * 0.6)] += 111
            else:
                o = (t * 97) % (cfg.frame_bytes - 400)
                f[o : o + 400] += 60
            frames.append(f)
            prev = f

        server = DeltaStreamServer(
            cfg,
            _ScriptedSource(base, frames),
            executor=PipelinedExecutor(cfg),
            verbose=False,
            overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
        )
        t.start()

        cli = DeltaStreamClient(
            "127.0.0.1", server.port, cfg.height, cfg.width,
            wire_format="auto",
        )
        cli.connect()

        expected = []
        prev = base.copy()
        for f in frames:
            prev, *_ = ref.step_oracle(prev, f, cfg)
            expected.append(prev.copy())

        got = []
        try:
            while True:
                pos, recon = cli.read_frame()
                got.append((pos, recon.copy()))
        except (ConnectionError, OSError):
            pass
        finally:
            cli.close()
        t.join(timeout=120)

        positions = [p for p, _ in got]
        n_raw = positions.count(cfg.frame_bytes)
        assert n_raw >= 5, positions  # every scene cut forced a resync
        assert len(got) >= n_frames - 2 * n_raw  # resyncs may skip frames
        # monotone match: each payload lands exactly on some oracle
        # state, in order, ending at the final one
        exp_i = 0
        for k, (_, recon) in enumerate(got):
            while exp_i < len(expected) and not np.array_equal(
                recon, expected[exp_i]
            ):
                exp_i += 1
            assert exp_i < len(expected), f"frame {k} matches no oracle state"
        np.testing.assert_array_equal(got[-1][1], expected[-1])


class TestHttpLiveViewer:
    """client.py --http: the live browser bridge (reference display-loop
    parity, client/opencv.cpp:68-69). /stream must relay the identical
    wire bytes a direct socket client would read; / serves viewer.html
    with the stream geometry substituted in."""

    @staticmethod
    def _serve(cfg, seed, n_frames):
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=seed),
            verbose=False, overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
        )
        t.start()
        return server, t

    @staticmethod
    def _capture_direct(port):
        import socket

        sock = socket.create_connection(("127.0.0.1", port))
        chunks = []
        while True:
            b = sock.recv(1 << 16)
            if not b:
                break
            chunks.append(b)
        sock.close()
        return b"".join(chunks)

    @pytest.mark.parametrize("wire_format", ["v1", "v3"])
    def test_stream_relays_identical_wire_bytes(self, small_config, wire_format):
        import dataclasses
        import urllib.request

        from cudavideostream_tpu.runtime.client import make_http_relay

        cfg = dataclasses.replace(small_config, port=0,
                                  wire_format=wire_format)
        s1, t1 = self._serve(cfg, seed=6, n_frames=3)
        baseline = self._capture_direct(s1.port)
        t1.join(timeout=30)

        s2, t2 = self._serve(cfg, seed=6, n_frames=3)
        relay = make_http_relay(0, "127.0.0.1", s2.port,
                                cfg.height, cfg.width)
        rt = threading.Thread(target=relay.serve_forever, daemon=True)
        rt.start()
        try:
            rport = relay.server_address[1]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{rport}/stream", timeout=30
            ) as resp:
                relayed = resp.read()
            t2.join(timeout=30)
        finally:
            relay.shutdown()
            relay.server_close()
        assert relayed == baseline
        assert len(relayed) > cfg.frame_bytes

    def test_index_serves_viewer_with_geometry(self, small_config):
        import dataclasses
        import urllib.request

        from cudavideostream_tpu.runtime.client import make_http_relay

        cfg = dataclasses.replace(small_config, port=0)
        relay = make_http_relay(0, "127.0.0.1", 59999, cfg.height, cfg.width)
        rt = threading.Thread(target=relay.serve_forever, daemon=True)
        rt.start()
        try:
            rport = relay.server_address[1]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{rport}/", timeout=10
            ) as resp:
                html = resp.read().decode()
        finally:
            relay.shutdown()
            relay.server_close()
        assert f'id="w" value="{cfg.width}"' in html
        assert f'id="h" value="{cfg.height}"' in html
        assert "connectLive" in html  # the live decoder shipped

    def test_stream_502_when_server_down(self, small_config):
        import urllib.error
        import urllib.request

        from cudavideostream_tpu.runtime.client import make_http_relay

        relay = make_http_relay(0, "127.0.0.1", 1, 48, 64)  # port 1: refused
        rt = threading.Thread(target=relay.serve_forever, daemon=True)
        rt.start()
        try:
            rport = relay.server_address[1]
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{rport}/stream", timeout=10
                )
            assert e.value.code == 502
        finally:
            relay.shutdown()
            relay.server_close()

    @pytest.mark.parametrize("wire_format", ["v1", "v2", "v3"])
    def test_live_decoder_state_machine(self, small_config, wire_format):
        """Python mirror of viewer.html's connectLive incremental parser,
        fed the /stream response in deliberately tiny chunks: the frame
        boundary math must hold on partial buffers and the resulting
        reconstruction must byte-equal an oracle replay of the source."""
        import dataclasses
        import urllib.request

        from cudavideostream_tpu.runtime.client import make_http_relay
        from cudavideostream_tpu.runtime.oracle_executor import OracleExecutor

        cfg = dataclasses.replace(small_config, port=0,
                                  wire_format=wire_format)
        n_frames = 3
        s, t = self._serve(cfg, seed=8, n_frames=n_frames)
        relay = make_http_relay(0, "127.0.0.1", s.port,
                                cfg.height, cfg.width)
        rt = threading.Thread(target=relay.serve_forever, daemon=True)
        rt.start()
        n = cfg.frame_bytes
        frame = None
        buf = b""
        stage = 0
        fmt = "v1"
        base_off = 0
        decoded = 0
        try:
            rport = relay.server_address[1]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{rport}/stream", timeout=30
            ) as resp:
                while True:
                    chunk = resp.read(701)  # force partial-buffer parsing
                    if not chunk:
                        break
                    buf += chunk
                    if stage == 0:
                        if len(buf) < 16:
                            continue
                        from cudavideostream_tpu.runtime import wire as w

                        fmt = ("v2" if buf[:16] == w.MAGIC_V2 else
                               "v3" if buf[:16] == w.MAGIC_V3 else "v1")
                        base_off = 0 if fmt == "v1" else 16
                        if len(buf) < base_off + n:
                            continue
                        frame = np.frombuffer(
                            buf[base_off:base_off + n], np.uint8
                        ).copy()
                        buf = buf[base_off + n:]
                        stage = 1
                    min_hdr = {"v3": 9, "v2": 8, "v1": 4}[fmt]
                    while len(buf) >= min_hdr:
                        # the same end-offset math as viewer.html
                        if fmt == "v3":
                            mode = buf[0]
                            if mode == 2:
                                end = 1 + n
                            elif mode == 1:
                                end = (5 + (n + 7) // 8
                                       + int.from_bytes(buf[1:5], "little"))
                            else:
                                pos = int.from_bytes(buf[1:5], "little")
                                nexc = int.from_bytes(buf[5:9], "little")
                                end = 9 + 2 * pos + 4 * nexc + pos
                        elif fmt == "v2":
                            pos = int.from_bytes(buf[0:4], "little")
                            nexc = int.from_bytes(buf[4:8], "little")
                            end = 8 + 2 * pos + 4 * nexc + pos
                        else:
                            pos = int.from_bytes(buf[0:4], "little")
                            end = 4 + 5 * pos
                        if end > len(buf):
                            break
                        payload = buf[:end]
                        buf = buf[end:]
                        # decode via the tested wire readers (the JS
                        # apply loop mirrors these byte-for-byte)
                        reads = [payload]

                        def read_exact(k, _r=reads):
                            head, _r[0] = _r[0][:k], _r[0][k:]
                            assert len(head) == k
                            return head

                        from cudavideostream_tpu.runtime import wire as w

                        if fmt == "v3":
                            p2, xs, vals, raw = w.read_frame_v3(read_exact, n)
                            if raw is not None:
                                frame = raw.copy()
                                decoded += 1
                                continue
                        elif fmt == "v2":
                            p2, xs, vals = w.read_payload_v2(read_exact)
                        else:
                            p2, xs, vals = w.read_payload(read_exact)
                        if p2:
                            np.add.at(frame, xs, vals)  # uint8 wrap-add
                        decoded += 1
            t.join(timeout=30)
        finally:
            relay.shutdown()
            relay.server_close()
        assert decoded == n_frames
        # oracle replay: reconstruction equals the server's final state
        replay = SyntheticSource(cfg, seed=8)
        orc = OracleExecutor(cfg)
        orc.start(replay.base_frame())
        for _ in range(n_frames):
            orc.process(next(replay))
        np.testing.assert_array_equal(frame, orc.resync())


class TestPrefetchSource:
    """The capture-prefetch thread (server --prefetch, the reference's
    th_cap). Measured A/B: benchmarks/prefetch_ab — wins when source
    latency dominates, a wash otherwise (hence default off)."""

    def test_order_and_exhaustion(self, small_config):
        from cudavideostream_tpu.runtime.sources import PrefetchSource

        base = np.zeros(small_config.frame_bytes, np.uint8)
        frames = [np.full(small_config.frame_bytes, i, np.uint8)
                  for i in range(5)]
        src = PrefetchSource(_ScriptedSource(base, frames))
        np.testing.assert_array_equal(src.base_frame(), base)
        got = list(src)
        assert len(got) == 5
        for i, f in enumerate(got):
            np.testing.assert_array_equal(f, frames[i])
        src.close()

    def test_source_exception_propagates(self, small_config):
        from cudavideostream_tpu.runtime.sources import (
            FrameSource,
            PrefetchSource,
        )

        class Dying(FrameSource):
            def __init__(self):
                self.n = 0

            def __next__(self):
                self.n += 1
                if self.n > 2:
                    raise RuntimeError("camera died")
                return np.zeros(small_config.frame_bytes, np.uint8)

        src = PrefetchSource(Dying())
        next(src)
        next(src)
        with pytest.raises(RuntimeError, match="camera died"):
            while True:
                next(src)
        src.close()

    def test_bad_depth_rejected(self, small_config):
        from cudavideostream_tpu.runtime.sources import PrefetchSource

        with pytest.raises(ValueError):
            PrefetchSource(SyntheticSource(small_config), depth=0)

    def test_server_prefetch_loopback(self, small_config):
        """--prefetch end-to-end: identical wire bytes to inline capture
        (the thread must not reorder or drop frames)."""
        import dataclasses
        import socket

        cfg = dataclasses.replace(small_config, port=0)

        def capture(source):
            server = DeltaStreamServer(
                cfg, source, verbose=False, overlay_status=False
            )
            server.listen()
            t = threading.Thread(
                target=server.serve, kwargs={"max_frames": 4}, daemon=True
            )
            t.start()
            sock = socket.create_connection(("127.0.0.1", server.port))
            chunks = []
            while True:
                b = sock.recv(1 << 16)
                if not b:
                    break
                chunks.append(b)
            sock.close()
            t.join(timeout=30)
            return b"".join(chunks)

        from cudavideostream_tpu.runtime.sources import PrefetchSource

        baseline = capture(SyntheticSource(cfg, seed=13))
        pf = PrefetchSource(SyntheticSource(cfg, seed=13))
        assert capture(pf) == baseline
        pf.close()


class _FakeV4L2Lib:
    """Native-lib stand-in replaying recorded frames through the
    V4L2Source grab loop (VERDICT r3: the loop around decode_mjpg_frame
    never executed in any test — no camera exists in this env)."""

    def __init__(self, open_rc, grabs):
        self.open_rc = open_rc      # 0 = BGR24, 1 = MJPG, <0 = error
        self.grabs = list(grabs)    # per-call byte payloads (or int rc)
        self.open_calls = []
        self.close_calls = 0

    def __bool__(self):
        return True

    def v4l2_open(self, device, width, height):
        self.open_calls.append((device, width, height))
        return self.open_rc

    def v4l2_grab(self, handle, buf_ptr, size):
        import ctypes

        if not self.grabs:
            return -5
        item = self.grabs.pop(0)
        if isinstance(item, int):
            return item
        data = bytes(item)
        assert len(data) <= size
        ctypes.memmove(buf_ptr, data, len(data))
        return len(data)

    def v4l2_close(self, handle):
        self.close_calls += 1


def _mjpg_bytes(height, width, seed=0):
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (height, width, 3), endpoint=True,
                       dtype=np.uint8)
    out = io.BytesIO()
    Image.fromarray(img).save(out, format="JPEG", quality=90)
    return out.getvalue()


class TestV4L2GrabLoop:
    """The grab loop logic (reference th_cap + v4l.cpp), exercised by
    replaying recorded bytes through the monkeypatched native lib."""

    @staticmethod
    def _make(monkeypatch, fake, cfg):
        from cudavideostream_tpu import native
        from cudavideostream_tpu.runtime.sources import V4L2Source

        # patch only for construction: the source holds its lib ref, and
        # the wire/client native helpers (same loader) must stay real
        with monkeypatch.context() as m:
            m.setattr(native, "load_native", lambda: fake)
            # /dev/null exists everywhere; only the existence check sees it
            return V4L2Source(cfg, device="/dev/null")

    def test_mjpg_happy_path(self, small_config, monkeypatch):
        from cudavideostream_tpu.runtime.sources import decode_mjpg_frame

        j1 = _mjpg_bytes(small_config.height, small_config.width, seed=1)
        j2 = _mjpg_bytes(small_config.height, small_config.width, seed=2)
        fake = _FakeV4L2Lib(open_rc=1, grabs=[j1, j2])
        src = self._make(monkeypatch, fake, small_config)
        f1 = next(src)
        f2 = next(src)
        np.testing.assert_array_equal(
            f1, decode_mjpg_frame(j1, small_config.height, small_config.width)
        )
        np.testing.assert_array_equal(
            f2, decode_mjpg_frame(j2, small_config.height, small_config.width)
        )
        assert f1.shape == (small_config.frame_bytes,)
        src.close()
        assert fake.close_calls == 1

    def test_bgr24_happy_and_short_frame(self, small_config, monkeypatch):
        n = small_config.frame_bytes
        good = bytes(range(256)) * (n // 256) + bytes(n % 256)
        fake = _FakeV4L2Lib(open_rc=0, grabs=[good, good[: n - 7]])
        src = self._make(monkeypatch, fake, small_config)
        f = next(src)
        np.testing.assert_array_equal(f, np.frombuffer(good, np.uint8))
        with pytest.raises(RuntimeError, match="short BGR24 frame"):
            next(src)
        src.close()

    def test_grab_error_raises(self, small_config, monkeypatch):
        fake = _FakeV4L2Lib(open_rc=0, grabs=[-7])
        src = self._make(monkeypatch, fake, small_config)
        with pytest.raises(RuntimeError, match="v4l2_grab failed"):
            next(src)
        src.close()

    def test_decode_error_releases_global_handle(self, small_config, monkeypatch):
        """A mid-stream MJPG decode failure abandons the source object;
        the process-global camera handle must still be released so the
        next V4L2Source can open (sources.py __del__ hardening)."""
        import gc

        fake = _FakeV4L2Lib(open_rc=1, grabs=[b"\xde\xad\xbe\xef" * 100])
        src = self._make(monkeypatch, fake, small_config)
        with pytest.raises(RuntimeError, match="MJPG frame decode failed"):
            next(src)
        del src
        gc.collect()
        assert fake.close_calls == 1

    def test_geometry_mismatch_is_decode_error(self, small_config, monkeypatch):
        wrong = _mjpg_bytes(small_config.height // 2, small_config.width)
        fake = _FakeV4L2Lib(open_rc=1, grabs=[wrong])
        src = self._make(monkeypatch, fake, small_config)
        with pytest.raises(RuntimeError, match="expected"):
            next(src)
        src.close()

    def test_no_supported_format_rejected(self, small_config, monkeypatch):
        fake = _FakeV4L2Lib(open_rc=-2000, grabs=[])
        with pytest.raises(RuntimeError, match="neither BGR24 nor MJPG"):
            self._make(monkeypatch, fake, small_config)

    def test_serves_through_the_full_pipeline(self, small_config, monkeypatch):
        """V4L2 frames drive the real loopback: server + client over a
        socket with the camera stand-in as the source (the reference's
        actual operating mode, threads.cpp:32-38)."""
        import dataclasses
        import socket

        cfg = dataclasses.replace(small_config, port=0)
        n = cfg.frame_bytes
        rng = np.random.default_rng(3)
        raws = [rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
                for _ in range(3)]
        fake = _FakeV4L2Lib(open_rc=0, grabs=[r.tobytes() for r in raws])
        src = self._make(monkeypatch, fake, cfg)
        server = DeltaStreamServer(cfg, src, verbose=False,
                                   overlay_status=False)
        server.listen()
        t = threading.Thread(target=server.serve,
                             kwargs={"max_frames": 2}, daemon=True)
        t.start()
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
        cli.connect()
        np.testing.assert_array_equal(cli.frame, raws[0])
        for _ in range(2):
            cli.read_frame()
        cli.close()
        t.join(timeout=30)
        src.close()


class TestLanderRangeFetch:
    """The latency-disciplined landing (r4): [t_lo, t_hi) range fetch
    through jitted dynamic-slices, batched single-round-trip gets, and
    the solo path's speculative fused fetch (TiledLander.land_fused).
    The hardware motivation is benchmarks/loopback_tpu_tunnel (r4): the
    old landing spent ~120 ms/frame in four sequential device_get round
    trips over the ~30 ms-RTT tunnel."""

    @staticmethod
    def _cfg():
        # 96x128x3 = 36864 bytes = 288 units of 128: larger than
        # TiledLander.RANGE_MIN, so the window genuinely slides (at the
        # 48x64 test geometry every range is the whole block array and
        # speculation can never miss)
        return StreamConfig(
            height=96, width=128, overlay_scale=4,
            tiled_payload=True, fetch_mode="tiles",
        )

    def _band_frame(self, base, start, width, delta):
        f = base.copy()
        end = min(start + width, f.size)
        f[start:end] += np.uint8(delta)  # uint8 wrap
        return f

    def test_speculative_drift_hits_and_stays_exact(self, rng):
        cfg = self._cfg()
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        start, width = 0, 4000
        for k in range(8):
            frame = self._band_frame(base, start, width, 77 + k)
            pos, payload, _, _ = ex.process(frame)
            pr, xr, vr, prev = ref.diff_encode(frame, prev)
            assert pos == pr
            fx, fv = payload.to_flat()
            np.testing.assert_array_equal(fx, xr)
            np.testing.assert_array_equal(fv, vr)
            start += 1000  # ~8 units/frame: inside the margin
        lander = ex._lander
        # frame 0 has no window yet; every drift frame after it should hit
        assert lander.spec_counts["hit"] >= 5
        # a scene CUT: the band jumps to the far end of the frame —
        # outside any speculative window; must stay byte-exact via the
        # top-up fetch and book a miss
        frame = self._band_frame(base, cfg.frame_bytes - 5000, 4000, 99)
        pos, payload, _, _ = ex.process(frame)
        pr, xr, vr, prev = ref.diff_encode(frame, prev)
        assert pos == pr
        fx, fv = payload.to_flat()
        np.testing.assert_array_equal(fx, xr)
        np.testing.assert_array_equal(fv, vr)
        assert lander.spec_counts["miss"] >= 1

    def test_range_payload_drops_empty_edge_tiles(self, rng):
        """The landed TiledPayload holds exactly the [t_lo, t_hi) rows —
        leading/trailing all-empty tiles are gone — and its wire bytes
        equal the flat reference encoding."""
        from cudavideostream_tpu.runtime import wire

        cfg = self._cfg()
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        # band in the MIDDLE of the frame: old [0:t_hi) prefix fetching
        # would have moved every leading empty tile over the link
        mid = cfg.frame_bytes // 2
        frame = self._band_frame(base, mid, 3000, 80)
        pos, payload, _, _ = ex.process(frame)
        pr, xr, vr, _ = ref.diff_encode(frame, base)
        assert pos == pr > 0
        assert isinstance(payload, wire.TiledPayload)
        # every returned row is within the non-empty range: row 0 and
        # row -1 both carry at least one entry
        assert payload.counts.shape[0] == payload.xs.shape[0]
        assert payload.counts[0] > 0 and payload.counts[-1] > 0
        assert payload.to_wire_bytes() == wire.pack_payload(pr, xr, vr)

    def test_range_len_ladder(self):
        from cudavideostream_tpu.runtime.executor import TiledLander

        lander = TiledLander("tiles")
        n = 48600
        prev_len = 0
        for span in range(1, 20000, 37):
            L = lander._range_len(span, n)
            assert L >= min(span, n)
            # 5-bit-mantissa rounding: over-fetch <= one step
            step = max(256, 1 << max(span.bit_length() - 5, 0))
            assert L <= max(TiledLander.RANGE_MIN, span + step)
            assert L % 256 == 0 or L == n
            assert L >= prev_len or L == n
            prev_len = max(prev_len, L) if L < n else prev_len
        # clamps to the tile count
        assert lander._range_len(10 ** 9, n) == n
        assert lander._range_len(1, 72) == 72  # small geometry: whole array

    def test_compact_fetch_rebuild(self):
        """The narrow on-device xs window (local = global % tile_cap)
        rebuilds to exact int32 globals with zero padding preserved."""
        from cudavideostream_tpu.runtime.executor import TiledLander

        assert TiledLander._compact_dtype(128) == np.uint8
        assert TiledLander._compact_dtype(4096) == np.uint16
        assert TiledLander._compact_dtype(1 << 20) is None
        rng = np.random.default_rng(0)
        tile_cap, rows = 128, 6
        counts = np.array([0, 3, 128, 1, 0, 7], np.uint8)
        xs32 = np.zeros((rows, tile_cap), np.int32)
        for r in range(rows):
            c = int(counts[r])
            xs32[r, :c] = np.sort(
                rng.choice(tile_cap, size=c, replace=False)
            ) + r * tile_cap
        local = (xs32 % tile_cap).astype(np.uint8)
        # window starting two rows before the range, as a spec hit would
        row0, t_lo, t_hi = 0, 1, 4
        rebuilt = TiledLander._rebuild_xs(
            local, counts[t_lo:t_hi], row0, t_lo, t_hi, tile_cap
        )
        np.testing.assert_array_equal(rebuilt, xs32[t_lo:t_hi])
        assert rebuilt.dtype == np.int32
