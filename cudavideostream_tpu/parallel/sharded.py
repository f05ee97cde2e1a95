"""The multi-chip pipeline: the full per-frame step as manual SPMD.

Sharding layout (the "pick a mesh, annotate shardings, let collectives
ride ICI" recipe):

* ``data`` axis — independent video streams (batch dim B);
* ``space`` axis — frame rows, contiguous blocks per shard (the chip-level
  analogue of the reference's per-thread contiguous chunks,
  ``kernels.cu:404-408``).

Collectives used, all inside one ``shard_map``:

* ``ppermute``   — conv halo rows between row-neighbor shards;
* ``psum``       — global histogram for the binarization threshold, the
  global changed-byte count, and the ragged payload concat (disjoint
  scattered blocks summed into one buffer — zero padding is the
  identity, so overlap regions compose exactly);
* ``all_gather`` — per-shard payload counts -> global offsets.

Outputs: the new previous-frame state stays sharded in place
(``P("data", "space")``); the wire payload is replicated so any host can
ship it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cudavideostream_tpu.config import StreamConfig, Visualizer
from cudavideostream_tpu.ops import compact as compact_ops
from cudavideostream_tpu.ops import diff as diff_ops
from cudavideostream_tpu.ops import logcompact
from cudavideostream_tpu.ops import filters as filter_ops
from cudavideostream_tpu.ops import reference_cpu
from cudavideostream_tpu.parallel.halo_conv import sharded_convolve_q16
from cudavideostream_tpu.utils import fonts

MAX_OVERLAY_CHARS = 28


class ShardedDeltaPipeline:
    """Configured sharded pipeline over a ``(data, space)`` mesh.

    Frames are ``(B, frame_bytes)`` uint8 with B divisible by the data
    axis and image rows divisible by the space axis.
    """

    def __init__(self, config: StreamConfig, mesh: Mesh,
                 conv_weights: Optional[np.ndarray] = None,
                 payload_layout: str = "replicated",
                 threshold_map: Optional[np.ndarray] = None):
        """``payload_layout``:

        * ``"replicated"`` (default) — the wire payload is assembled on
          device with collectives (all_gather counts + psum of disjoint
          scattered blocks) and comes out replicated, so any host can
          ship it.
        * ``"sharded"`` — zero payload collectives: each shard keeps its
          locally-compacted block in place, and the outputs are
          ``(counts (B, n_space), xs (B, n_space, Ln), vals ...)`` — the
          shard-granular analogue of the single-chip tiled emit. The
          serving host assembles the identical wire bytes through the
          scatter-gather sender (``wire.TiledPayload``), and the only
          remaining collectives are the conv halo and the binarization
          histogram. This is the layout that scales: payload ICI traffic
          drops from O(frame) per frame to zero.
        """
        if payload_layout not in ("replicated", "sharded"):
            raise ValueError(f"unknown payload_layout {payload_layout!r}")
        self.payload_layout = payload_layout
        self.cfg = config
        self.mesh = mesh
        self.n_space = mesh.shape["space"]
        self.n_data = mesh.shape["data"]
        if config.height % self.n_space:
            raise ValueError(
                f"height {config.height} not divisible by space={self.n_space}"
            )
        self.local_rows = config.height // self.n_space
        self.local_bytes = config.frame_bytes // self.n_space
        if config.noise_filter and config.conv_k // 2 > self.local_rows:
            # the halo exchange reaches ONE neighbor; a deeper halo
            # would need rows from two shards away. Reject at
            # construction — raising inside the shard_map body would
            # abort mid-trace and leak tracers into the process.
            raise ValueError(
                f"conv halo of {config.conv_k // 2} rows exceeds the "
                f"{self.local_rows}-row shard; use fewer space shards "
                f"or a smaller conv_k"
            )
        if conv_weights is None:
            conv_weights = reference_cpu.gaussian_kernel(config.conv_k)
        self.conv_q16 = reference_cpu.quantize_kernel_q16(conv_weights)
        self.atlas_np = fonts.make_atlas(config.overlay_scale, config.overlay_font)
        self.atlas = jnp.asarray(self.atlas_np)
        self._interpret = jax.default_backend() == "cpu"
        # payload capacity rounded so every shard block fits at any offset
        self.capacity = config.frame_bytes
        # the flagship kernel runs per shard at any practical size
        # (tile-local index packing; alignment padded away internally)
        self.uses_pallas = self.local_bytes < (1 << 31)

        # optional per-byte sensitivity map (the solo pipeline's
        # --threshold-map), sharded along rows exactly like the frame:
        # each space-shard sees its own (local_bytes,) slice, so the map
        # adds zero collectives
        self.threshold_map_np = None
        self._thr_map_dev = None
        self._thr_map_min = None
        if threshold_map is not None:
            tm = np.asarray(threshold_map, dtype=np.uint8).ravel()
            if tm.size != config.frame_bytes:
                raise ValueError(
                    f"threshold_map has {tm.size} bytes, frame has "
                    f"{config.frame_bytes}"
                )
            self.threshold_map_np = tm
            self._thr_map_dev = jax.device_put(
                jnp.asarray(tm), NamedSharding(mesh, P("space"))
            )
            self._thr_map_min = int(tm.min())

        self._sharding_state = NamedSharding(mesh, P("data", "space"))
        self._sharding_rep = NamedSharding(mesh, P("data"))
        if payload_layout == "sharded":
            out_specs = (
                P("data", "space"),          # new_prev
                P("data", "space"),          # counts (Bl, 1) per shard
                P("data", "space"),          # xs blocks (Bl, Ln)
                P("data", "space"),          # vals blocks (Bl, Ln)
                P("data", "space"),          # aux
            )
        else:
            out_specs = (
                P("data", "space"),  # new_prev
                P("data"),           # pos
                P("data"),           # xs
                P("data"),           # vals
                P("data", "space"),  # aux (zeros when disabled)
            )
        in_specs = [
            P("data", "space"),  # prev
            P("data", "space"),  # frame
            P("data"),           # char_ids (B, C): per-stream overlay text
            P("data"),           # n_chars (B,)
        ]
        if self._thr_map_dev is not None:
            in_specs.append(P("space"))  # per-byte threshold map slice
        self._step = jax.jit(
            jax.shard_map(
                self._body,
                mesh=mesh,
                in_specs=tuple(in_specs),
                out_specs=out_specs,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

        # FLAT single-stream step (the `server --mesh` serving path):
        # carrying (B=1, n) uint8 state across the jit boundary pads its
        # sublane dim 1 -> 8 (up to 8x the HBM bytes per pass — measured
        # on this very kernel, models/batched.py), and vmapping the
        # pallas_call at Bl=1 pessimizes its lowering (also measured).
        # The flat body sidesteps both: (n,) P("space") state, direct
        # kernel calls. jit compiles lazily, so building this wrapper
        # costs nothing for multi-stream users who never call it.
        self._sharding_flat = NamedSharding(mesh, P("space"))
        self._sharding_rep0 = NamedSharding(mesh, P())
        if payload_layout == "sharded":
            out_b1 = (
                P("space"),  # new_prev (n,)
                P("space"),  # unit counts (n_space * U,)
                P("space"),  # xs unit blocks (n_space * U, unit_bytes)
                P("space"),  # vals unit blocks (n_space * U, unit_bytes)
                P("space"),  # aux (n,)
            )
        else:
            out_b1 = (P("space"), P(), P(), P(), P("space"))
        in_b1 = [P("space"), P("space"), P(), P()]
        if self._thr_map_dev is not None:
            in_b1.append(P("space"))
        self._step_b1 = jax.jit(
            jax.shard_map(
                self._body_b1,
                mesh=mesh,
                in_specs=tuple(in_b1),
                out_specs=out_b1,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

    # -- local shard bodies (run per device) -------------------------------
    #
    # ONE per-stream implementation (_stream_body) serves both entry
    # points: _body vmaps it over the local stream axis for the batched
    # (multiserve --mesh) step, _body_b1 calls it directly on flat
    # arrays for the single-stream serving step — the two measured
    # hardware traps (sublane-padded (1, n) carried buffers; vmap over
    # the Pallas call at Bl=1) live ONLY in how the body is entered,
    # so the ~100 lines of branch logic cannot drift between paths.

    def _stream_body(self, prev, frame, char_ids, n_chars, thr_map, sidx,
                     emit_tiled=False):
        """One stream's local shard step on flat ``(Ln,)`` arrays.

        ``char_ids``/``n_chars`` are this stream's overlay text;
        ``thr_map`` is the shard's (Ln,) sensitivity slice or None.
        Returns ``(new_prev, lpos, gxs, gvals_u8, aux)`` with indices
        already globalized (zero past ``lpos``).

        ``emit_tiled``: per-shard TILED emit instead — returns
        ``(new_prev, counts_u, xs_t, vals_t, aux)`` where the shard's
        compaction units (``(U, unit_bytes)`` blocks, unit-count prefix
        each) are first-class wire tiles with GLOBAL indices (the shard
        base rides the kernel's ``index_offset`` operand). This skips
        the per-shard merge epilogue AND rides the sub-tiled/pair-packed
        fast kernel — the flat emit re-measured 0.83 ms/shard at 1080p
        vs 0.16 tiled (benchmarks/subtile_ab, pair_ab); the single-
        stream serving path (``_body_b1``, ``server --mesh``) uses it.
        """
        cfg = self.cfg
        Ln = self.local_bytes
        Lr = self.local_rows
        W = cfg.width

        cur = frame
        if cfg.noise_filter:
            cur = sharded_convolve_q16(
                cur, weights_q16=self.conv_q16, local_rows=Lr,
                width=W, axis_name="space",
            )

        # overlay lands in the top image rows; the glyph band may span
        # multiple row-shards, so each shard blits its intersection.
        # Same fusion split as the single-chip pipeline: visualizers
        # that read the overlaid frame need it materialized; otherwise
        # only a row prefix is blended and the per-shard Pallas kernel
        # substitutes it on its leading tiles (zero extra frame pass).
        needs_full_overlay = cfg.visualizer in (
            Visualizer.HEATMAP, Visualizer.GRAYSCALE, Visualizer.BINARIZE
        )
        cell_h = self.atlas.shape[1]
        region = None
        if cell_h > cfg.height:
            # SPEC parity: a glyph cell taller than the frame draws
            # NOTHING (reference_cpu.overlay_blit breaks before any
            # blit; ops/overlay.py returns the frame untouched)
            pass
        elif needs_full_overlay or not self.uses_pallas:
            cur = self._overlay_local(
                cur[None], char_ids[None], n_chars[None], sidx
            )[0]
        else:
            pref_rows = min(Lr, cell_h)
            pref_bytes = pref_rows * W * 3
            region = self._overlay_local(
                cur[None, :pref_bytes], char_ids[None], n_chars[None],
                sidx, rows=pref_rows,
            )[0]

        aux = jnp.zeros((Ln,), jnp.uint8)
        if cfg.visualizer == Visualizer.HEATMAP:
            aux = filter_ops.heatmap(cur, prev)
        elif cfg.visualizer == Visualizer.GRAYSCALE:
            aux = filter_ops.grayscale_weighted(cur)
        elif cfg.visualizer == Visualizer.BINARIZE:
            # fused chain (ops/filters.binarize_pipeline): per-pixel gray
            # computed once, global histogram across row shards via psum
            # (works under vmap too: the collective batches)
            gv = filter_ops.gray_pixels(cur)
            hist = jax.lax.psum(filter_ops.value_histogram(gv), "space")
            aux = filter_ops.binarize_pixels(
                gv, filter_ops.binarize_threshold(hist)
            )

        needs_mask = cfg.visualizer in (
            Visualizer.RED_BLACK, Visualizer.RED_OVERLAP
        )
        # local deterministic compaction (ascending local index): the
        # flagship Pallas kernel per shard whenever the local frame fits
        # its packed-index range — this is how >2^23-byte (4K+) frames
        # scale: shard rows until each local slice fits. Alignment is
        # the kernel's problem (it pads internally with cur==prev
        # bytes), so every space factor of a 1080p frame takes this
        # path — the per-thread arbitrary-extent handling of
        # kernels.cu:404-427, done the TPU way.
        # thr is a scalar OR this shard's (Ln,) map slice; thr_positive
        # gates the negfeed mask shortcut exactly like the solo pipeline
        thr = cfg.threshold if thr_map is None else thr_map
        thr_positive = (
            cfg.threshold > 0 if thr_map is None else self._thr_map_min > 0
        )
        tiled_out = None
        if self.uses_pallas:
            if emit_tiled:
                _, counts_u, xs_t, vals_t, new_prev = (
                    logcompact.fused_diff_compact(
                        cur, prev,
                        threshold=cfg.threshold,
                        negative_feedback=cfg.negative_feedback,
                        interpret=self._interpret,
                        overlay_region=region,
                        threshold_map=thr_map,
                        emit="tiled",
                        sub_rows=cfg.subtile_rows,
                        pair=cfg.pair_lanes,
                        index_offset=sidx * Ln,
                    )
                )
                tiled_out = (counts_u, xs_t, vals_t)
            else:
                lpos, lxs, lvals, new_prev = logcompact.fused_diff_compact(
                    cur, prev,
                    threshold=cfg.threshold,
                    negative_feedback=cfg.negative_feedback,
                    interpret=self._interpret,
                    overlay_region=region,
                    threshold_map=thr_map,
                )
            mask = None
            if needs_mask:
                if cfg.negative_feedback and thr_positive:
                    # |df| > thr > 0 implies cur != prev: the negfeed
                    # update encodes the mask, saving a second diff pass
                    mask = new_prev != prev
                else:
                    if region is not None:
                        cur = jnp.concatenate(
                            [region, cur[region.shape[0]:]]
                        )
                    mask = diff_ops.diff_mask(cur, prev, thr)[0]
        else:
            mask, vals_dense, new_prev = diff_ops.diff_mask(
                cur, prev, thr, cfg.negative_feedback
            )
            lpos, lxs, lvals = compact_ops.compact_sort(mask, vals_dense, Ln)

        if cfg.visualizer == Visualizer.RED_BLACK:
            aux = filter_ops.red_black(mask)
        elif cfg.visualizer == Visualizer.RED_OVERLAP:
            aux = filter_ops.red_overlap(prev, mask)

        if tiled_out is not None:
            counts_u, xs_t, vals_t = tiled_out
            return new_prev, counts_u, xs_t, vals_t, aux

        # globalize indices (padding stays zero)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Ln,), 0)
        valid = lane < lpos
        gxs = jnp.where(valid, lxs + sidx * Ln, 0)
        gvals = jnp.where(
            valid, lvals.astype(jnp.int32), 0
        ).astype(jnp.uint8)
        if emit_tiled:
            # non-Pallas fallback (local shards past the int32 index
            # range): ONE unit per shard — its count-prefix block is
            # exactly the flat per-shard payload
            return new_prev, lpos[None], gxs[None], gvals[None], aux
        return new_prev, lpos, gxs, gvals, aux

    def _body(self, prev, frame, char_ids, n_chars, *maybe_thr):
        """Batched (Bl streams per shard) entry: vmap of _stream_body.

        The vmap over the Pallas call and the (Bl, n) buffers are the
        documented costs multiserve --mesh amortizes over Bl streams;
        the single-stream serving path uses _body_b1 instead.
        """
        thr_map = maybe_thr[0] if maybe_thr else None
        sidx = jax.lax.axis_index("space")
        Bl = prev.shape[0]
        Ln = self.local_bytes
        new_prev, lpos, gxs, gvals, aux = jax.vmap(
            self._stream_body, in_axes=(0, 0, 0, 0, None, None)
        )(prev, frame, char_ids, n_chars, thr_map, sidx)

        if self.payload_layout == "sharded":
            # zero payload collectives: each shard's compacted block and
            # count stay in place — the shard axis IS the tile axis of a
            # wire.TiledPayload, assembled host-side for free
            return new_prev, lpos[:, None], gxs, gvals, aux

        # ragged concat across shards: all_gather counts -> offsets,
        # scatter local block at my offset, psum the disjoint blocks
        counts = jax.lax.all_gather(lpos, "space", axis=1)  # (Bl, n_space)
        before = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, counts.shape, 1) < sidx,
            counts, 0), axis=1)  # (Bl,)
        pos = jnp.sum(counts, axis=1)  # (Bl,) global count

        pad_cap = self.capacity + Ln
        out_xs = jnp.zeros((Bl, pad_cap), jnp.int32)
        out_vals = jnp.zeros((Bl, pad_cap), jnp.int32)

        def place(out, block, off):
            return jax.vmap(
                lambda o, b, s: jax.lax.dynamic_update_slice(o, b, (s,))
            )(out, block, off)

        gvals_i = gvals.astype(jnp.int32)
        out_xs = jax.lax.psum(place(out_xs, gxs, before), "space")
        out_vals = jax.lax.psum(place(out_vals, gvals_i, before), "space")
        out_xs = out_xs[:, : self.capacity]
        out_vals = out_vals[:, : self.capacity].astype(jnp.uint8)
        return new_prev, pos, out_xs, out_vals, aux

    def _body_b1(self, prev, frame, char_ids, n_chars, *maybe_thr):
        """Single-stream entry on FLAT ``(Ln,)`` shards — no ``(1, n)``
        carried buffers (sublane pads 1->8: up to 8x HBM per pass,
        measured on this kernel in models/batched) and no vmap over the
        Pallas call (pessimized lowering). Byte-exactness of every
        branch is pinned by the step_flat oracle matrix in
        tests/test_parallel.py."""
        thr_map = maybe_thr[0] if maybe_thr else None
        sidx = jax.lax.axis_index("space")
        Ln = self.local_bytes
        if self.payload_layout == "sharded":
            # per-shard TILED emit: the shard's compaction units are
            # first-class wire tiles with global indices (kernel
            # index_offset) — no merge epilogue, and the sub-tiled/
            # pair-packed fast kernel runs per shard. Outputs concat
            # along the unit axis: counts (n_space*U,), blocks
            # (n_space*U, unit_bytes), ascending global order.
            return self._stream_body(
                prev, frame, char_ids, n_chars, thr_map, sidx,
                emit_tiled=True,
            )
        new_prev, lpos, gxs, gvals, aux = self._stream_body(
            prev, frame, char_ids, n_chars, thr_map, sidx
        )

        counts = jax.lax.all_gather(lpos, "space")  # (n_space,)
        before = jnp.sum(jnp.where(
            jnp.arange(self.n_space) < sidx, counts, 0
        ))
        pos = jnp.sum(counts)
        pad_cap = self.capacity + Ln
        out_xs = jax.lax.psum(jax.lax.dynamic_update_slice(
            jnp.zeros((pad_cap,), jnp.int32), gxs, (before,)
        ), "space")
        out_vals = jax.lax.psum(jax.lax.dynamic_update_slice(
            jnp.zeros((pad_cap,), jnp.int32), gvals.astype(jnp.int32),
            (before,)
        ), "space")
        return (new_prev, pos, out_xs[: self.capacity],
                out_vals[: self.capacity].astype(jnp.uint8), aux)

    def _overlay_local(self, cur, char_ids, n_chars, sidx, rows=None):
        """Batched glyph blit of this shard's slice of the text band,
        PER STREAM: ``char_ids`` is ``(Bl, C)`` and ``n_chars`` ``(Bl,)``
        so each local stream renders its own status text (parity with
        the batched single-chip path; the reference renders per stream
        too, one server per camera).

        Shard ``s`` owns global rows ``[s*Lr, (s+1)*Lr)``; it copies atlas
        rows ``[s*Lr, s*Lr+rows)`` (zero-padded past the cell) and masks
        to global rows inside the band — shards below the band are
        no-ops. ``rows`` (default: the whole shard) lets the caller blit
        only a row prefix, which the per-shard Pallas kernel then fuses
        as its ``overlay_region``.
        """
        cfg = self.cfg
        Bl = cur.shape[0]
        Lr = self.local_rows
        R = Lr if rows is None else rows
        cell_h, cell_w = self.atlas.shape[1], self.atlas.shape[2]
        W3 = cfg.width * 3
        cw3 = cell_w * 3
        n_fit = min(
            MAX_OVERLAY_CHARS, char_ids.shape[1], cfg.width // cell_w
        )
        if n_fit == 0:
            return cur
        strip_w3 = n_fit * cw3
        # Byte-space strip formulation (the ops/overlay.py pattern): the
        # per-character loop of atlas gathers + dynamic_update_slices
        # was two documented hardware traps at once — a (Bl, R, W, 3)
        # minor-dim-3 view relayouts the whole shard, and 28 DUS steps
        # blow past XLA's ~16-update select fusion (each becomes a full
        # shard pass). Here: one batched one-hot matmul builds every
        # stream's full text strip (tiny; glyph select rides the MXU —
        # exact, all inputs <= 255), one dynamic slice takes this
        # shard's glyph rows, and ONE static-slice set merges it (a
        # single fused select pass over the shard).
        n_glyphs = self.atlas.shape[0]
        onehot = (
            char_ids[:, :n_fit, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_glyphs), 2)
        ).astype(jnp.float32)
        flat_cells = self.atlas.reshape(
            n_glyphs, cell_h * cw3
        ).astype(jnp.float32)
        cells = jnp.dot(onehot, flat_cells).astype(jnp.uint8)
        strip = cells.reshape(Bl, n_fit, cell_h, cw3).transpose(
            0, 2, 1, 3
        ).reshape(Bl, cell_h, strip_w3)
        # shard s owns glyph rows [row_off, row_off + R); zero-pad past
        # the cell (masked out by in_band below anyway)
        row_off = jnp.clip(sidx * Lr, 0, cell_h)
        strip = jnp.pad(strip, ((0, 0), (0, R), (0, 0)))
        sub = jax.vmap(
            lambda st: jax.lax.dynamic_slice(st, (row_off, 0), (R, strip_w3))
        )(strip)
        img = cur.reshape(Bl, R, W3)  # byte-space 2D view: no (..., 3)
        under = img[:, :, :strip_w3]
        grow = sidx * Lr + jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
        in_band = (grow < cell_h)[None, :, None]
        col_char = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, strip_w3), 2) // cw3
        )
        keep = in_band & (col_char < n_chars[:, None, None])
        merged = jnp.where(keep, sub, under)
        img = img.at[:, :, :strip_w3].set(merged)
        return img.reshape(Bl, -1)

    # -- host API ----------------------------------------------------------
    def init_state(self, base_frames: np.ndarray) -> Array:
        """(B, frame_bytes) uint8 -> sharded device state."""
        base = np.asarray(base_frames, dtype=np.uint8)
        if base.ndim == 1:
            base = base[None]
        return jax.device_put(base, self._sharding_state)

    def init_state_flat(self, base_frame: np.ndarray) -> Array:
        """Flat ``(frame_bytes,)`` row-sharded state for the
        single-stream :meth:`step_flat` path (no sublane padding)."""
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        return jax.device_put(base, self._sharding_flat)

    def step_flat(self, prev: Array, frame, text: str = ""):
        """Single-stream step on flat state (see ``_body_b1``).

        Returns ``(new_prev(n,), counts(n_units,), xs(n_units, ub),
        vals(n_units, ub), aux(n,))`` for the ``"sharded"`` layout —
        per-shard TILED emit, unit blocks in ascending global order
        with unit-count prefixes, exactly a single-chip
        ``wire.TiledPayload`` whose tile axis spans all shards — or
        ``(new_prev(n,), pos scalar, xs(cap,), vals(cap,), aux(n,))``
        for ``"replicated"``.
        """
        ids = fonts.encode_text(text, MAX_OVERLAY_CHARS)
        char_ids = jax.device_put(
            jnp.asarray(ids, jnp.int32), self._sharding_rep0
        )
        n_chars = jax.device_put(
            jnp.int32(min(len(text), MAX_OVERLAY_CHARS)),
            self._sharding_rep0,
        )
        frame = jax.device_put(
            np.asarray(frame, dtype=np.uint8).ravel(), self._sharding_flat
        )
        args = (prev, frame, char_ids, n_chars)
        if self._thr_map_dev is not None:
            args += (self._thr_map_dev,)
        return self._step_b1(*args)

    def payload_tiles(self, counts, xs, vals, b: int):
        """Assemble stream ``b``'s wire payload from ``"sharded"``-layout
        outputs: the shard axis is the tile axis of a
        :class:`~cudavideostream_tpu.runtime.wire.TiledPayload` (shard
        order = ascending row order), so the scatter-gather sender ships
        identical bytes with zero device-side concat."""
        from cudavideostream_tpu.runtime import wire

        c = np.asarray(counts)[b].astype(np.int32)
        xs_t = np.asarray(xs)[b].reshape(self.n_space, self.local_bytes)
        vals_t = np.asarray(vals)[b].reshape(self.n_space, self.local_bytes)
        return wire.TiledPayload(int(c.sum()), c, xs_t, vals_t)

    def step(self, prev: Array, frames, text=""):
        """Returns ``(new_prev, pos(B,), xs(B,cap), vals(B,cap), aux)``
        for the ``"replicated"`` payload layout, or ``(new_prev,
        counts(B, n_space), xs(B, n_space*Ln), vals(B, n_space*Ln), aux)``
        for ``"sharded"`` (see :meth:`payload_tiles`).

        ``text``: one string shared by all streams, or a sequence of B
        per-stream strings (each stream renders its own status line —
        the overlay ids shard along the ``data`` axis)."""
        frames = np.asarray(frames, dtype=np.uint8)
        if frames.ndim == 1:
            frames = frames[None]
        B = frames.shape[0]
        texts = [text] * B if isinstance(text, str) else list(text)
        if len(texts) != B:
            raise ValueError(f"need {B} texts, got {len(texts)}")
        ids = np.stack(
            [fonts.encode_text(t, MAX_OVERLAY_CHARS) for t in texts]
        ).astype(np.int32)
        n_chars = np.asarray(
            [min(len(t), MAX_OVERLAY_CHARS) for t in texts], np.int32
        )
        char_ids = jax.device_put(jnp.asarray(ids), self._sharding_rep)
        n_chars = jax.device_put(jnp.asarray(n_chars), self._sharding_rep)
        frames = jax.device_put(frames, self._sharding_state)
        args = (prev, frames, char_ids, n_chars)
        if self._thr_map_dev is not None:
            args += (self._thr_map_dev,)
        return self._step(*args)
