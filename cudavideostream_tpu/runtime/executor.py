"""Streaming executor: drives the pipeline and lands payloads on the host.

The reference overlaps capture / GPU / socket with three pthreads, four
pipes, and a ring of six pinned buffers (``threads.cpp:59-106``); its
variable-length DtoH is two ``cudaMemcpyAsync`` calls sized by ``pos``
after a sync (``kernels.cu:507-524``). The TPU equivalents here:

* async dispatch — ``pipeline.step`` returns immediately with device
  arrays; the next frame's HtoD upload overlaps the previous frame's
  payload fetch (XLA's async runtime plays the role of CUDA streams);
* variable-length fetch — XLA outputs are fixed-shape, so the executor
  fetches the 4-byte ``pos`` first, then pulls ``xs``/``vals`` prefixes
  through *power-of-two tiered* static slices: each tier is a distinct
  compiled slice (bounded set, compiled on demand and cached), which
  avoids both a full-capacity transfer and a recompile per distinct
  ``pos``;
* the 1 Hz ``FPS/FOR/READ/POS/BW`` status line (``server.cpp:150-171``)
  including the reference's bandwidth estimate ``(pos<<4)*fps`` — kept
  bug-compatible for parity — plus the true wire bandwidth.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.models import DeltaStreamPipeline


class TieredFetcher:
    """Fetch ``arr[:pos]`` via the smallest power-of-two static slice.

    Static slice shapes keep jit cache hits; over-fetch is bounded 2x.
    """

    def __init__(self, capacity: int, min_tier: int = 4096):
        import jax

        self._jax = jax
        self.capacity = capacity
        self.tiers = []
        t = min_tier
        while t < capacity:
            self.tiers.append(t)
            t *= 2
        self.tiers.append(capacity)

    def fetch(self, arr, pos: int) -> np.ndarray:
        if pos <= 0:
            return np.empty(0, dtype=arr.dtype)
        for t in self.tiers:
            if pos <= t:
                return np.asarray(self._jax.device_get(arr[:t]))[:pos]
        return np.asarray(self._jax.device_get(arr))[:pos]


class StreamExecutor:
    """Owns pipeline + device state; yields host payloads per frame."""

    def __init__(self, config: StreamConfig, pipeline: Optional[DeltaStreamPipeline] = None):
        self.cfg = config
        self.pipe = pipeline or DeltaStreamPipeline(config)
        self._state = None
        self._fetch_xs = TieredFetcher(config.capacity)
        self._fetch_vals = TieredFetcher(config.capacity)
        self.metrics = ExecMetrics()

    def start(self, base_frame: np.ndarray) -> np.ndarray:
        """Initialize device state; returns the base frame bytes to ship."""
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        self._state = self.pipe.init_state(base)
        return base

    def process(
        self, frame: np.ndarray, text: str = ""
    ) -> Tuple[int, np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Run one frame; returns host-side ``(pos, xs, vals, aux)``."""
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0 = time.perf_counter()
        self._state, pos_d, xs_d, vals_d, aux_d = self.pipe.step(
            self._state, frame, text=text
        )
        pos = int(pos_d)
        xs = self._fetch_xs.fetch(xs_d, pos)
        vals = self._fetch_vals.fetch(vals_d, pos)
        aux = np.asarray(aux_d) if aux_d is not None else None
        self.metrics.record(time.perf_counter() - t0, pos)
        return pos, xs, vals, aux


    def flush(self):
        """No pending work in the synchronous executor."""
        return None

    # -- checkpoint / resume (beyond reference: it has nothing to persist,
    # SURVEY.md §5 — here the stream state is the previous-frame buffer,
    # so a restarted server can resume without a fresh base-frame
    # handshake for clients that kept their reconstruction) -------------
    def save_state(self, path: str) -> None:
        if self._state is None:
            raise RuntimeError("no state to save")
        np.savez(
            path,
            prev=np.asarray(self._state),
            geometry=np.array([self.cfg.height, self.cfg.width]),
            threshold=np.array([self.cfg.threshold]),
        )

    def load_state(self, path: str) -> None:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        if tuple(data["geometry"]) != (self.cfg.height, self.cfg.width):
            raise ValueError("checkpoint geometry mismatch")
        self._state = self.pipe.init_state(data["prev"])


class PipelinedExecutor(StreamExecutor):
    """One-frame-deep software pipeline: dispatch frame N, then land frame
    N-1's payload while N computes — the executor-level equivalent of the
    reference's capture/compute/send thread overlap
    (``threads.cpp:166-237``). The output stream lags one frame; call
    :meth:`flush` after the last frame to drain the pending payload.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pending = None  # (t0, pos_d, xs_d, vals_d, aux_d)

    def process(self, frame, text: str = ""):
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0 = time.perf_counter()
        self._state, pos_d, xs_d, vals_d, aux_d = self.pipe.step(
            self._state, frame, text=text
        )
        prev, self._pending = self._pending, (t0, pos_d, xs_d, vals_d, aux_d)
        if prev is None:
            return None
        return self._land(prev)

    def flush(self):
        prev, self._pending = self._pending, None
        return self._land(prev) if prev is not None else None

    def _land(self, entry):
        t0, pos_d, xs_d, vals_d, aux_d = entry
        pos = int(pos_d)
        xs = self._fetch_xs.fetch(xs_d, pos)
        vals = self._fetch_vals.fetch(vals_d, pos)
        aux = np.asarray(aux_d) if aux_d is not None else None
        self.metrics.record(time.perf_counter() - t0, pos)
        return pos, xs, vals, aux


class ExecMetrics:
    """1 Hz status line state (reference ``server.cpp:150-171``)."""

    def __init__(self):
        self.last_print = time.perf_counter()
        self.frame_time = 0.0
        self.read_time = 0.0
        self.pos = 0
        self.frames = 0
        self.total_frames = 0
        self.wire_bytes = 0

    def record(self, frame_s: float, pos: int) -> None:
        self.frame_time = frame_s
        self.pos = pos
        self.frames += 1
        self.total_frames += 1
        self.wire_bytes += 4 + 5 * pos

    def status_line(self, read_s: float = 0.0) -> Optional[str]:
        """Returns the status string once per second, else None."""
        now = time.perf_counter()
        if now - self.last_print < 1.0:
            return None
        dt = now - self.last_print
        fps = self.frames / dt
        # reference BW estimate: each changed byte counted as 16 bits
        # ((pos<<4)*fps*1e-3 kbps, server.cpp:159) — kept for parity
        bw_ref = int((self.pos << 4) * fps * 1e-3)
        bw_true = int(8 * self.wire_bytes / dt * 1e-3)
        line = (
            f"FPS: {fps:5.0f}\tFOR: {1e3*self.frame_time:6.2f} ms\t"
            f"READ: {1e3*read_s:6.2f}\tPOS: {self.pos:7d}\t"
            f"BW: {bw_ref:6d} kbps (wire: {bw_true} kbps)"
        )
        self.last_print = now
        self.frames = 0
        self.wire_bytes = 0
        return line

    def overlay_text(self) -> str:
        """The string rendered into the video (``server.cpp:166-168``)."""
        fps = self.frames / max(1e-9, time.perf_counter() - self.last_print)
        bw = int((self.pos << 4) * fps * 1e-3)
        return f"FPS: {int(fps)} BW: {bw} kbps"
