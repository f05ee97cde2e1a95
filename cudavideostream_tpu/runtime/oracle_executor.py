"""Pure-CPU execution mode — the rebuild of the reference's ``#ifdef CPU``
fallback path (``server.cpp:55-135``).

The reference's CPU mode only ran grayscale+histogram+binarize with the
diff loop commented out (``server.cpp:82-94``); this one runs the *full*
pipeline through the NumPy golden oracle, so the server works — slowly —
on any machine with no accelerator at all, and doubles as a live
cross-check implementation.

Select with ``--backend oracle`` on the server CLI.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime.executor import ExecMetrics
from cudavideostream_tpu.utils import fonts


class OracleExecutor:
    """Same interface as StreamExecutor; state and compute are NumPy."""

    def __init__(self, config: StreamConfig):
        self.cfg = config
        self.atlas = fonts.make_atlas(config.overlay_scale, config.overlay_font)
        self.conv_weights = ref.gaussian_kernel(config.conv_k)
        self._state: Optional[np.ndarray] = None
        self.metrics = ExecMetrics()

    def start(self, base_frame: np.ndarray) -> np.ndarray:
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        if base.size != self.cfg.frame_bytes:
            raise ValueError("base frame size mismatch")
        self._state = base.copy()
        return base

    def process(
        self, frame: np.ndarray, text: str = ""
    ) -> Tuple[int, np.ndarray, np.ndarray, Optional[np.ndarray]]:
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0 = time.perf_counter()
        ids = fonts.encode_text(text) if text else []
        self._state, pos, xs, vals, aux = ref.step_oracle(
            self._state,
            frame,
            self.cfg,
            atlas=self.atlas if text else None,
            char_ids=ids,
            conv_weights=self.conv_weights,
        )
        if pos > self.cfg.capacity:
            # same contract as the device executors (the oracle is the
            # spec): truncation would desync clients permanently
            from cudavideostream_tpu.config import PayloadOverflowError

            raise PayloadOverflowError(
                f"frame changed {pos} bytes > payload_capacity "
                f"{self.cfg.capacity}"
            )
        self.metrics.record(time.perf_counter() - t0, pos)
        return pos, xs, vals, aux

    def resync(self) -> np.ndarray:
        """Post-step frame for wire-v3 raw recovery (state is host numpy
        and already advanced past the overflowing frame)."""
        if self._state is None:
            raise RuntimeError("no state to resync from")
        return self._state

    def flush(self):
        return None
