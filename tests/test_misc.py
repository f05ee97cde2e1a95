"""Coverage for variants, oracle executor, checkpointing, profiling,
graft entry points, and CLI argument plumbing."""

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig, Visualizer
from cudavideostream_tpu.models import available, get_config
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.executor import StreamExecutor
from cudavideostream_tpu.runtime.oracle_executor import OracleExecutor


class TestVariants:
    def test_registry_complete(self):
        # one variant per shipped reference build combination
        assert set(available()) == {
            "delta-stream", "delta-denoised", "delta-maskonly", "heatmap",
            "red-black", "red-overlap", "grayscale", "binarize",
        }

    def test_configs_resolve(self):
        assert get_config("heatmap").visualizer == Visualizer.HEATMAP
        assert get_config("delta-denoised").noise_filter
        cfg = get_config("delta-stream", height=48, width=64)
        assert cfg.height == 48

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_config("4k-ultra")


class TestOracleExecutor:
    def test_matches_device_executor(self, small_config, rng):
        base = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        frames = [
            rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
            for _ in range(2)
        ]
        dev = StreamExecutor(small_config)
        orc = OracleExecutor(small_config)
        dev.start(base)
        orc.start(base)
        for f in frames:
            dp, dx, dv, _ = dev.process(f, text="FPS: 1")
            op, ox, ov, _ = orc.process(f, text="FPS: 1")
            assert dp == op
            np.testing.assert_array_equal(dx, ox)
            np.testing.assert_array_equal(dv, ov)


class TestCheckpoint:
    def test_save_load_roundtrip(self, small_config, rng, tmp_path):
        ex = StreamExecutor(small_config)
        base = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        f1 = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.process(f1)
        path = str(tmp_path / "state")
        ex.save_state(path)

        ex2 = StreamExecutor(small_config)
        ex2.load_state(path)
        f2 = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        p1, x1, v1, _ = ex.process(f2)
        p2, x2, v2, _ = ex2.process(f2)
        assert p1 == p2
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(v1, v2)

    def test_geometry_mismatch_rejected(self, small_config, rng, tmp_path):
        import dataclasses

        ex = StreamExecutor(small_config)
        ex.start(rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8))
        path = str(tmp_path / "state")
        ex.save_state(path)
        other = dataclasses.replace(small_config, height=64, width=64)
        with pytest.raises(ValueError):
            StreamExecutor(other).load_state(path)

    def test_threshold_mismatch_rejected(self, small_config, rng, tmp_path):
        """The prev buffer carries sub-threshold drift: resuming under a
        different threshold silently changes negative-feedback semantics
        vs the stream the checkpoint came from — must refuse."""
        import dataclasses

        ex = StreamExecutor(small_config)
        ex.start(rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8))
        path = str(tmp_path / "state")
        ex.save_state(path)
        other = dataclasses.replace(small_config, threshold=small_config.threshold + 5)
        with pytest.raises(ValueError, match="threshold"):
            StreamExecutor(other).load_state(path)

    def test_negative_feedback_mismatch_rejected(self, small_config, rng, tmp_path):
        import dataclasses

        ex = StreamExecutor(small_config)
        ex.start(rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8))
        path = str(tmp_path / "state")
        ex.save_state(path)
        other = dataclasses.replace(small_config, negative_feedback=False)
        with pytest.raises(ValueError, match="negative_feedback"):
            StreamExecutor(other).load_state(path)

    def test_server_restart_resumes_byte_exact(self, small_config, rng, tmp_path):
        """Full restart loopback: server checkpoints, a NEW server
        process resumes from it (--resume semantics), and a client that
        kept its reconstruction across the restart keeps decoding
        byte-exact (the resumed base frame equals the bytes it already
        holds)."""
        import dataclasses
        import threading

        from cudavideostream_tpu.runtime.client import DeltaStreamClient
        from cudavideostream_tpu.runtime.server import DeltaStreamServer
        from cudavideostream_tpu.runtime.sources import SyntheticSource

        cfg = dataclasses.replace(small_config, port=0)
        src = SyntheticSource(cfg, seed=11)  # continues across both servers
        ex1 = StreamExecutor(cfg)
        s1 = DeltaStreamServer(cfg, src, executor=ex1, verbose=False,
                               overlay_status=False)
        s1.listen()
        t1 = threading.Thread(target=s1.serve, kwargs={"max_frames": 3},
                              daemon=True)
        t1.start()
        cli = DeltaStreamClient("127.0.0.1", s1.port, cfg.height, cfg.width)
        cli.connect()
        for _ in range(3):
            cli.read_frame()
        cli.close()
        t1.join(timeout=30)
        kept = cli.frame.copy()  # reconstruction kept across the restart
        path = str(tmp_path / "ckpt")
        ex1.save_state(path)

        ex2 = StreamExecutor(cfg)
        ex2.load_state(path)
        s2 = DeltaStreamServer(cfg, src, executor=ex2, verbose=False,
                               overlay_status=False, resume=True)
        s2.listen()
        t2 = threading.Thread(target=s2.serve, kwargs={"max_frames": 2},
                              daemon=True)
        t2.start()
        cli2 = DeltaStreamClient("127.0.0.1", s2.port, cfg.height, cfg.width)
        cli2.connect()
        # the resumed base frame IS the kept reconstruction
        np.testing.assert_array_equal(cli2.frame, kept)
        for _ in range(2):
            cli2.read_frame()
        cli2.close()
        t2.join(timeout=30)
        # decoding stayed byte-exact through the restart: the client's
        # reconstruction equals the server-side previous-frame state
        np.testing.assert_array_equal(cli2.frame, ex2.resync())


class TestProfiling:
    def test_frame_profiler(self):
        from cudavideostream_tpu.utils.profiling import FrameProfiler

        fp = FrameProfiler(window=4)
        for _ in range(6):
            with fp.stage("compute"):
                pass
        assert len(fp.samples["compute"]) == 4
        assert "compute" in fp.summary()

    def test_trace_smoke(self, tmp_path):
        import jax.numpy as jnp

        from cudavideostream_tpu.utils import profiling

        with profiling.trace(str(tmp_path / "t")):
            with profiling.annotate("op"):
                jnp.arange(8).sum().block_until_ready()


class TestGraftEntry:
    def test_entry_runs(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = fn(*args)
        assert len(out) == 4

    def test_dryrun_two_devices(self):
        import jax

        import __graft_entry__ as g

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        g.dryrun_multichip(2)


class TestServerCLIPlumbing:
    def test_oracle_backend_serves(self, small_config):
        """server main() wiring: oracle backend over a real socket."""
        import dataclasses
        import threading

        from cudavideostream_tpu.runtime.client import DeltaStreamClient
        from cudavideostream_tpu.runtime.server import DeltaStreamServer
        from cudavideostream_tpu.runtime.sources import SyntheticSource

        cfg = dataclasses.replace(small_config, port=0)
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=1), executor=OracleExecutor(cfg),
            verbose=False, overlay_status=False,
        )
        server.listen()
        t = threading.Thread(target=server.serve, kwargs={"max_frames": 2}, daemon=True)
        t.start()
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height, cfg.width)
        cli.connect()
        for _ in range(2):
            cli.read_frame()
        cli.close()
        t.join(timeout=20)


    def test_cli_help_renders(self, capsys):
        """Regression: argparse expands '%' in help strings against a
        params dict, so a raw '% f' in help text crashed --help."""
        import pytest as _pytest

        from cudavideostream_tpu.runtime import client as client_mod
        from cudavideostream_tpu.runtime import server as server_mod

        for mod in (server_mod, client_mod):
            with _pytest.raises(SystemExit) as e:
                mod.main(["--help"])
            assert e.value.code == 0
            assert "usage" in capsys.readouterr().out


class TestBeyondPackedIndexRange:
    def test_kernel_handles_frames_past_2_23(self, rng):
        """Tile-local index packing removed the old 2^23-byte ceiling:
        a frame just past it compacts byte-exactly single-chip (4K+ is
        the same code path; this size keeps interpret mode fast)."""
        import jax.numpy as jnp

        from cudavideostream_tpu.ops import logcompact

        n = (1 << 23) + 4096
        prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        cur = prev.copy()
        # sparse changes incl. the very last byte (index > 2^23)
        idxs = np.concatenate(
            [rng.integers(0, n, 200), [0, n - 1, (1 << 23) + 7]]
        ).astype(np.int64)
        cur[idxs] = ((cur[idxs].astype(np.int32) + 100) % 256).astype(np.uint8)
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, xs, vals, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True
        )
        assert int(pos) == epos
        np.testing.assert_array_equal(np.asarray(xs)[:epos], exs)
        np.testing.assert_array_equal(np.asarray(vals)[:epos], evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    def test_sort_backend_keeps_its_limit(self):
        from cudavideostream_tpu.ops import compact

        import jax.numpy as jnp

        n = (1 << 23) + 1024
        with pytest.raises(ValueError, match="packed-key"):
            compact.compact_sort(
                jnp.zeros(n, bool), jnp.zeros(n, jnp.uint8), n
            )


class TestPngWriter:
    def test_roundtrip_decodable(self, tmp_path, rng):
        """Decode our own PNG (unfiltered scanlines) back to pixels."""
        import struct
        import zlib

        from cudavideostream_tpu.utils.png import write_png

        img = rng.integers(0, 255, (5, 7, 3), endpoint=True, dtype=np.uint8)
        path = str(tmp_path / "t.png")
        write_png(path, img)
        data = open(path, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # walk chunks
        off = 8
        idat = b""
        while off < len(data):
            (ln,) = struct.unpack_from(">I", data, off)
            tag = data[off + 4 : off + 8]
            body = data[off + 8 : off + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, ctype = struct.unpack_from(">IIBB", body)
                assert (w, h, depth, ctype) == (7, 5, 8, 2)
            elif tag == b"IDAT":
                idat += body
            off += 12 + ln
        raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(5, 1 + 21)
        assert (raw[:, 0] == 0).all()  # filter None
        np.testing.assert_array_equal(raw[:, 1:].reshape(5, 7, 3), img)

    def test_bgr_to_rgb(self):
        from cudavideostream_tpu.utils.png import bgr_frame_to_rgb

        frame = np.array([10, 20, 30, 40, 50, 60], np.uint8)  # 1x2 BGR
        rgb = bgr_frame_to_rgb(frame, 1, 2)
        np.testing.assert_array_equal(rgb[0, 0], [30, 20, 10])
        np.testing.assert_array_equal(rgb[0, 1], [60, 50, 40])


class TestFonts:
    def test_both_styles_render_all_chars(self):
        from cudavideostream_tpu.utils import fonts

        for style, cell_h in (("stroke", 20), ("bitmap", 16)):
            atlas = fonts.make_atlas(scale=2, style=style)
            assert atlas.shape == (len(fonts.CHARS), cell_h, 12, 3)
            assert atlas.dtype == np.uint8
            # green-on-black only (cv::Scalar(0,255,0))
            assert atlas[:, :, :, 0].sum() == 0
            assert atlas[:, :, :, 2].sum() == 0
            for i, ch in enumerate(fonts.CHARS):
                if ch != " ":
                    assert atlas[i].sum() > 0, (style, ch)
                else:
                    assert atlas[i].sum() == 0

    def test_unknown_style_rejected(self):
        from cudavideostream_tpu.utils import fonts

        with pytest.raises(ValueError):
            fonts.make_atlas(scale=1, style="comic-sans")

    def test_config_font_reaches_pipeline(self, small_config):
        import dataclasses

        from cudavideostream_tpu.models import DeltaStreamPipeline

        a = DeltaStreamPipeline(small_config).atlas_np
        b = DeltaStreamPipeline(
            dataclasses.replace(small_config, overlay_font="bitmap")
        ).atlas_np
        assert a.shape != b.shape  # stroke cells are taller
