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
        # flat payload config (no tiled_payload):
        prev, pos, xs, vals, aux = pipe.step(prev, frames, texts)
        # tiled_payload (the fast-path product layout) returns six:
        prev, pos, counts, xs_t, vals_t, aux = pipe.step(prev, frames, texts)
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
        # Fast path: super-frame pallas_call(s) whose grid spans all
        # streams (logcompact.fused_diff_compact_batched). Two measured
        # reasons (benchmarks/times_batched): jax.vmap over the Pallas
        # call pessimizes its lowering, and a (B, n) uint8 buffer pads
        # its sublane dim to 8 — up to 8x the HBM bytes per pass for
        # B < 8. State is therefore carried FLAT (B*n,) in both paths.
        #
        # Filters/visualizers ride the fast path too: every elementwise
        # stage (heatmap, grayscale, red modes) is per-pixel, so on the
        # concatenated flat super-frame it equals the per-stream result
        # ("taller image" equivalence); the two per-stream-global stages
        # (conv's 2D borders, binarize's histogram) run per stream over
        # 1-D slices of the flat buffer — no (B, n) layout anywhere.
        # Batches whose grid exceeds the ~2000-step SMEM counts-window
        # bound are CHUNKED into ceil(grid/MAX_GRID) super-frame calls
        # (see _fast_impl), not dropped to the vmap path.
        from cudavideostream_tpu.ops.logcompact import (
            LANES,
            MAX_GRID,
            _tile_geometry,
        )

        cell_h = self._solo.atlas.shape[1]
        rows, tile = _tile_geometry(-(-config.frame_bytes // LANES))
        tps = rows // tile
        # streams per pallas_call under the SMEM grid bound (tps <=
        # MAX_GRID always holds: _tile_geometry enforces it per stream)
        self._chunk_streams = max(1, MAX_GRID // tps)
        self._fast = (
            config.compaction.value == "pallas"
            and config.tiled_payload
            and cell_h <= config.height
        )
        body = self._fast_impl if self._fast else self._vmap_impl
        self._step = jax.jit(body, donate_argnums=(0,))

    def _vmap_impl(self, prev_flat, frames_flat, ids, n_chars):
        from cudavideostream_tpu.config import Visualizer

        B, n = self.n_streams, self.config.frame_bytes
        out = jax.vmap(self._solo._step_impl, in_axes=(0, 0, 0, 0))(
            prev_flat.reshape(B, n), frames_flat.reshape(B, n), ids, n_chars
        )
        parts = [out[0].reshape(B * n), *out[1:]]
        if self.config.visualizer != Visualizer.NONE:
            # flat aux, matching the fast path's contract (see _fast_impl)
            parts[-1] = parts[-1].reshape(B * n)
        return tuple(parts)

    def _fast_impl(self, prev_flat, frames_flat, ids, n_chars):
        # Per-stream overlay: blit each stream's strip and substitute it
        # into the flat super-frame with XLA (the B disjoint updates fuse
        # into one select pass, ~0.9 ms at B=8/1080p). The solo pipeline's
        # in-kernel region fusion was ALSO tried batched — a 4th kernel
        # input whose per-stream index map is (i // st) * rt +
        # min(i % st, rt - 1) — and REJECTED: the non-monotone map defeats
        # Mosaic's DMA pipelining (+3.8 ms at B=8, measured), 4x the cost
        # of the plain XLA pass it avoids.
        from cudavideostream_tpu.config import Visualizer
        from cudavideostream_tpu.ops import convolve as conv_ops
        from cudavideostream_tpu.ops import diff as diff_ops
        from cudavideostream_tpu.ops import filters as filter_ops
        from cudavideostream_tpu.ops import logcompact
        from cudavideostream_tpu.ops import overlay as overlay_ops

        cfg = self.config
        B, n = self.n_streams, cfg.frame_bytes
        cell_h = self._solo.atlas.shape[1]
        strip = cell_h * cfg.width * 3
        cur = frames_flat
        if cfg.noise_filter:
            # conv is the one stage with 2D (border) structure: run it
            # per stream over 1-D slices — B passes over 1/B of the data
            # each, same total HBM traffic, no (B, n) layout
            cur = jnp.concatenate([
                conv_ops.convolve_q16(
                    jax.lax.slice(cur, (b * n,), ((b + 1) * n,)),
                    self._solo.conv_weights_q16, cfg.height, cfg.width,
                )
                for b in range(B)
            ])
        # one concatenate pass instead of B dynamic_update_slice ops:
        # XLA fuses a handful of disjoint DUS into one select pass, but
        # past B~16 the fusion breaks and each DUS becomes a full-buffer
        # copy (measured: per-stream step 0.35 ms at B=8 but 0.68 at
        # B=20 with the DUS chain; linear with the concat)
        pieces = []
        for b in range(B):
            s = jax.lax.slice(cur, (b * n,), (b * n + strip,))
            r = overlay_ops.overlay_blit(
                s, self._solo.atlas, ids[b], n_chars[b], cell_h, cfg.width
            )
            pieces.append(r)
            pieces.append(jax.lax.slice(cur, (b * n + strip,), ((b + 1) * n,)))
        cur = jnp.concatenate(pieces)

        # Visualizers that read the overlaid current frame: heatmap and
        # grayscale are per-pixel, so the flat super-frame IS the stacked
        # per-stream result; binarize's histogram/threshold are
        # per-stream globals and run over 1-D stream slices.
        aux = None
        if cfg.visualizer == Visualizer.HEATMAP:
            aux = filter_ops.heatmap(
                cur, prev_flat, use_sine=self._solo._heatmap_sine
            )
        elif cfg.visualizer == Visualizer.GRAYSCALE:
            aux = filter_ops.grayscale_weighted(cur)
        elif cfg.visualizer == Visualizer.BINARIZE:
            # fused per stream (ops/filters.binarize_pipeline): gray
            # computed once per slice; histogram/threshold stay
            # per-stream globals
            outs = []
            for b in range(B):
                outs.append(filter_ops.binarize_pipeline(
                    jax.lax.slice(cur, (b * n,), ((b + 1) * n,))
                ))
            aux = jnp.concatenate(outs)

        # Chunk the batch so each pallas_call's grid stays inside the
        # SMEM counts-window bound (self._chunk_streams streams/call).
        outs = []
        for b0 in range(0, B, self._chunk_streams):
            bc = min(self._chunk_streams, B - b0)
            outs.append(logcompact.fused_diff_compact_batched(
                jax.lax.slice(cur, (b0 * n,), ((b0 + bc) * n,)),
                jax.lax.slice(prev_flat, (b0 * n,), ((b0 + bc) * n,)),
                n_streams=bc,
                threshold=cfg.threshold,
                negative_feedback=cfg.negative_feedback,
                interpret=self._solo._interpret,
                threshold_map=self._solo._thr_map,
                sub_rows=cfg.subtile_rows,
                pair=cfg.pair_lanes,
            ))
        if len(outs) == 1:
            pos, counts, xs_t, vals_t, new_prev = outs[0]
        else:
            pos = jnp.concatenate([o[0] for o in outs])
            counts = jnp.concatenate([o[1] for o in outs])
            xs_t = jnp.concatenate([o[2] for o in outs])
            vals_t = jnp.concatenate([o[3] for o in outs])
            new_prev = jnp.concatenate([o[4] for o in outs])

        needs_mask = cfg.visualizer in (
            Visualizer.RED_BLACK, Visualizer.RED_OVERLAP
        )
        if needs_mask:
            thr_positive = (
                cfg.threshold > 0 if self._solo._thr_map is None
                else self._solo._thr_map_min > 0
            )
            if cfg.negative_feedback and thr_positive:
                # |df| > thr > 0 implies cur != prev: the negfeed update
                # encodes the mask exactly (same argument as the solo
                # pipeline, models/pipeline.py)
                mask = new_prev != prev_flat
            else:
                thr = (
                    cfg.threshold if self._solo._thr_map is None
                    else jnp.concatenate([self._solo._thr_map] * B)
                )
                mask = diff_ops.diff_mask(cur, prev_flat, thr)[0]
            if cfg.visualizer == Visualizer.RED_BLACK:
                aux = filter_ops.red_black(mask)
            else:
                aux = filter_ops.red_overlap(prev_flat, mask)

        if aux is None:
            return new_prev, pos, counts, xs_t, vals_t
        # aux stays FLAT (B*n,): materializing a (B, n) uint8 jit output
        # would pay the padded-sublane relayout (up to 8x the HBM bytes
        # at B < 8) every visualizer frame — callers reshape host-side
        # after the fetch, where it is free
        return new_prev, pos, counts, xs_t, vals_t, aux

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
        aux)`` — or, when ``tiled_payload`` is configured (the fast-path
        product layout), the SIX-tuple ``(new_prev, pos(B,),
        counts(B, units), xs_t(B, units, unit_bytes), vals_t(B, units,
        unit_bytes), aux)``. ``aux`` is None without a visualizer, else
        a FLAT ``(B * frame_bytes,)`` uint8 device array — reshape
        host-side after fetching (a ``(B, n)`` device output would pay
        the padded-sublane relayout every frame).
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
