"""Multi-stream batched pipeline: B independent cameras on one chip.

The reference serves exactly one capture device (``threads.cpp:166-179``
hardcodes one V4L2 handle). A TPU chip at ~1 ms/frame has headroom for
dozens of 1080p streams; this model family batches B independent delta
streams into ONE jitted step — per-stream state, per-stream overlay
text, per-stream payloads — so the dispatch/launch overhead is paid
once per *batch*, not per stream. This is the single-chip complement of
``parallel.ShardedDeltaPipeline``'s ``data`` axis (which spreads streams
across chips).

Byte-exact contract: stream ``b``'s outputs equal a solo
:class:`~cudavideostream_tpu.models.pipeline.DeltaStreamPipeline` run on
the same inputs (tested), because the step is the same function under
``vmap``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.models.pipeline import (
    MAX_OVERLAY_CHARS,
    DeltaStreamPipeline,
)
from cudavideostream_tpu.utils import fonts


class BatchedDeltaPipeline:
    """B-stream batched pipeline sharing one compiled step.

    Usage::

        pipe = BatchedDeltaPipeline(config, n_streams=4)
        prev = pipe.init_state(bases)                 # (B, frame_bytes)
        prev, pos, xs, vals, aux = pipe.step(prev, frames, texts)
    """

    def __init__(self, config: StreamConfig, n_streams: int,
                 conv_weights: Optional[np.ndarray] = None,
                 threshold_map: Optional[np.ndarray] = None):
        if n_streams < 1:
            raise ValueError("need at least one stream")
        self.config = config
        self.n_streams = n_streams
        # reuse the solo pipeline's configuration/validation and its
        # _step_impl as the vmapped body
        self._solo = DeltaStreamPipeline(
            config, conv_weights=conv_weights, threshold_map=threshold_map
        )
        if config.compaction.value == "host":
            raise ValueError(
                "HOST compaction packs per stream on the host — run solo "
                "pipelines instead of a batched one"
            )
        self._step = jax.jit(
            jax.vmap(self._solo._step_impl, in_axes=(0, 0, 0, 0)),
            donate_argnums=(0,),
        )

    @property
    def atlas_np(self) -> np.ndarray:
        return self._solo.atlas_np

    def init_state(self, base_frames: np.ndarray) -> Array:
        bases = np.asarray(base_frames, dtype=np.uint8).reshape(
            self.n_streams, -1
        )
        if bases.shape[1] != self.config.frame_bytes:
            raise ValueError("base frame size mismatch")
        return jnp.asarray(bases)

    def step(
        self, prev: Array, frames, texts: Optional[Sequence[str]] = None
    ) -> Tuple[Array, ...]:
        """One batched step over all streams.

        Returns ``(new_prev, pos(B,), xs(B,cap), vals(B,cap), aux)`` —
        or the tiled shapes ``(B, grid)``/``(B, grid, tile_bytes)`` when
        ``tiled_payload`` is configured. ``aux`` is None without a
        visualizer.
        """
        B = self.n_streams
        texts = list(texts or [""] * B)
        if len(texts) != B:
            raise ValueError(f"need {B} texts, got {len(texts)}")
        ids = np.stack(
            [fonts.encode_text(t, MAX_OVERLAY_CHARS) for t in texts]
        ).astype(np.int32)
        n_chars = np.asarray(
            [min(len(t), MAX_OVERLAY_CHARS) for t in texts], np.int32
        )
        frames = jnp.asarray(
            np.asarray(frames, dtype=np.uint8).reshape(B, -1)
        )
        out = self._step(prev, frames, jnp.asarray(ids), jnp.asarray(n_chars))
        expected = 5 if self.config.tiled_payload else 4
        if len(out) == expected:
            return (*out, None)
        return out
