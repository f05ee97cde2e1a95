"""Pipelined executor: one-frame-lagged but byte-exact complete streams,
PPM dump, and V4L2 gating."""

import dataclasses
import threading

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.client import DeltaStreamClient, write_ppm
from cudavideostream_tpu.runtime.executor import PipelinedExecutor
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource, V4L2Source
from tests.conftest import make_frame_pair


class TestPipelinedExecutor:
    def test_lags_one_frame_then_flushes(self, small_config, rng):
        ex = PipelinedExecutor(small_config)
        base = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        frames = [make_frame_pair(rng, small_config.frame_bytes)[1] for _ in range(3)]
        outs = [ex.process(f) for f in frames]
        assert outs[0] is None
        tail = ex.flush()
        assert tail is not None
        payloads = outs[1:] + [tail]
        # replay against the oracle: payload k belongs to frame k
        prev = base.copy()
        for frame, (pos, xs, vals, _) in zip(frames, payloads):
            epos, exs, evals, eprev = ref.diff_encode(frame, prev)
            assert pos == epos
            np.testing.assert_array_equal(xs, exs)
            np.testing.assert_array_equal(vals, evals)
            prev = eprev

    def test_flush_empty(self, small_config):
        ex = PipelinedExecutor(small_config)
        assert ex.flush() is None

    def test_loopback_stream_complete(self, small_config):
        """Server with a pipelined executor still delivers every frame's
        payload (the flush drains the last one)."""
        cfg = dataclasses.replace(small_config, port=0)
        n_frames = 3
        server = DeltaStreamServer(
            cfg,
            SyntheticSource(cfg, seed=3),
            executor=PipelinedExecutor(cfg),
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
        replay = SyntheticSource(cfg, seed=3)
        prev = next(replay).copy()
        for _ in range(n_frames):
            frame = next(replay)
            prev, *_ = ref.step_oracle(prev, frame, cfg)
            _, recon = cli.read_frame()
        np.testing.assert_array_equal(recon, prev)
        cli.close()
        t.join(timeout=30)


class TestPPM:
    def test_write_ppm(self, tmp_path, rng):
        h, w = 4, 6
        frame = rng.integers(0, 255, h * w * 3, endpoint=True, dtype=np.uint8)
        path = tmp_path / "f.ppm"
        write_ppm(str(path), frame, h, w)
        data = path.read_bytes()
        assert data.startswith(b"P6\n6 4\n255\n")
        body = np.frombuffer(data.split(b"255\n", 1)[1], dtype=np.uint8)
        # BGR -> RGB swap round-trips
        np.testing.assert_array_equal(
            body.reshape(h, w, 3)[:, :, ::-1].ravel(), frame
        )


class TestV4L2Gating:
    def test_missing_device_raises(self, small_config):
        with pytest.raises(RuntimeError):
            V4L2Source(small_config, device="/dev/video999")
