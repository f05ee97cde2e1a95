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
        # _step_impl as the fallback vmapped body
        self._solo = DeltaStreamPipeline(
            config, conv_weights=conv_weights, threshold_map=threshold_map
        )
        if config.compaction.value == "host":
            raise ValueError(
                "HOST compaction packs per stream on the host — run solo "
                "pipelines instead of a batched one"
            )
        # Fast path: ONE super-frame pallas_call whose grid spans all
        # streams (logcompact.fused_diff_compact_batched). Two measured
        # reasons (benchmarks/times_batched): jax.vmap over the Pallas
        # call pessimizes its lowering, and a (B, n) uint8 buffer pads
        # its sublane dim to 8 — up to 8x the HBM bytes per pass for
        # B < 8. State is therefore carried FLAT (B*n,) in both paths.
        from cudavideostream_tpu.config import Visualizer

        from cudavideostream_tpu.ops.logcompact import (
            LANES,
            MAX_GRID,
            _tile_geometry,
        )

        cell_h = self._solo.atlas.shape[1]
        rows, tile = _tile_geometry(-(-config.frame_bytes // LANES))
        tps = rows // tile
        self._fast = (
            config.compaction.value == "pallas"
            and config.tiled_payload
            and config.visualizer is Visualizer.NONE
            and not config.noise_filter
            and cell_h <= config.height
            # the super-frame grid must stay inside the SMEM
            # counts-window bound; larger batches take the vmap path
            and n_streams * tps <= MAX_GRID
        )
        body = self._fast_impl if self._fast else self._vmap_impl
        self._step = jax.jit(body, donate_argnums=(0,))

    def _vmap_impl(self, prev_flat, frames_flat, ids, n_chars):
        B, n = self.n_streams, self.config.frame_bytes
        out = jax.vmap(self._solo._step_impl, in_axes=(0, 0, 0, 0))(
            prev_flat.reshape(B, n), frames_flat.reshape(B, n), ids, n_chars
        )
        return (out[0].reshape(B * n), *out[1:])

    def _fast_impl(self, prev_flat, frames_flat, ids, n_chars):
        # Per-stream overlay: blit each stream's strip and substitute it
        # into the flat super-frame with XLA (the B disjoint updates fuse
        # into one select pass, ~0.9 ms at B=8/1080p). The solo pipeline's
        # in-kernel region fusion was ALSO tried batched — a 4th kernel
        # input whose per-stream index map is (i // st) * rt +
        # min(i % st, rt - 1) — and REJECTED: the non-monotone map defeats
        # Mosaic's DMA pipelining (+3.8 ms at B=8, measured), 4x the cost
        # of the plain XLA pass it avoids.
        from cudavideostream_tpu.ops import logcompact
        from cudavideostream_tpu.ops import overlay as overlay_ops

        cfg = self.config
        B, n = self.n_streams, cfg.frame_bytes
        cell_h = self._solo.atlas.shape[1]
        strip = cell_h * cfg.width * 3
        cur = frames_flat
        for b in range(B):
            s = jax.lax.slice(cur, (b * n,), (b * n + strip,))
            r = overlay_ops.overlay_blit(
                s, self._solo.atlas, ids[b], n_chars[b], cell_h, cfg.width
            )
            cur = jax.lax.dynamic_update_slice(cur, r, (b * n,))
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact_batched(
            cur,
            prev_flat,
            n_streams=B,
            threshold=cfg.threshold,
            negative_feedback=cfg.negative_feedback,
            interpret=self._solo._interpret,
            threshold_map=self._solo._thr_map,
        )
        return new_prev, pos, counts, xs_t, vals_t

    @property
    def atlas_np(self) -> np.ndarray:
        return self._solo.atlas_np

    def init_state(self, base_frames: np.ndarray) -> Array:
        """(B, frame_bytes) uint8 -> flat (B*frame_bytes,) device state.

        Flat on purpose: a (B, n) uint8 device buffer pads its sublane
        dim to 8 on TPU (8x HBM reads at B=1); see __init__.
        """
        bases = np.asarray(base_frames, dtype=np.uint8).reshape(
            self.n_streams, -1
        )
        if bases.shape[1] != self.config.frame_bytes:
            raise ValueError("base frame size mismatch")
        return jnp.asarray(bases.reshape(-1))

    def step(
        self, prev: Array, frames, texts: Optional[Sequence[str]] = None
    ) -> Tuple[Array, ...]:
        """One batched step over all streams.

        ``prev`` is the flat state from :meth:`init_state` (or a prior
        step). Returns ``(new_prev, pos(B,), xs(B,cap), vals(B,cap),
        aux)`` — or the tiled shapes ``(B, grid)``/``(B, grid,
        tile_bytes)`` when ``tiled_payload`` is configured. ``aux`` is
        None without a visualizer.
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
            np.asarray(frames, dtype=np.uint8).reshape(-1)
        )
        if frames.shape[0] != B * self.config.frame_bytes:
            raise ValueError("frames size mismatch")
        out = self._step(prev, frames, jnp.asarray(ids), jnp.asarray(n_chars))
        expected = 5 if self.config.tiled_payload else 4
        if len(out) == expected:
            return (*out, None)
        return out
