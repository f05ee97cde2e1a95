"""The flagship model: the fused delta-stream pipeline step.

The reference's per-frame GPU schedule (``exec_core``,
``server/src/kernels.cu:430-525``) is a hand-ordered sequence of kernel
launches and sync barriers over mutable device buffers. The TPU re-design
is a single pure function

    step(prev, frame, char_ids, n_chars) -> (new_prev, pos, xs, vals[, aux])

jitted once per :class:`StreamConfig`; XLA fuses the elementwise stages
(conv add-chain, overlay selects, diff, visualizer) into a handful of VPU
passes, and the previous-frame buffer is donated so the state update is
in-place in HBM — the functional equivalent of the reference's
``swap(d_current, d_previous)`` pointer flip (``kernels.cu:451``).

Stage order matches exec_core: noise-filter conv -> text overlay ->
visualizer (heatmap/grayscale/binarize read the overlaid current frame;
red modes read the diff mask) -> diff+compact.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cudavideostream_tpu.config import (
    PayloadOverflowError,
    StreamConfig,
    Visualizer,
)
from cudavideostream_tpu.ops import compact as compact_ops
from cudavideostream_tpu.ops import convolve as conv_ops
from cudavideostream_tpu.ops import diff as diff_ops
from cudavideostream_tpu.ops import filters as filter_ops
from cudavideostream_tpu.ops import logcompact
from cudavideostream_tpu.ops import overlay as overlay_ops
from cudavideostream_tpu.ops import reference_cpu
from cudavideostream_tpu.utils import fonts

MAX_OVERLAY_CHARS = 28


def _apply_region(cur, region):
    """Materialize the overlaid frame from (frame, blended prefix)."""
    return jnp.concatenate([region, cur[region.shape[0]:]])


class DeltaStreamPipeline:
    """Configured, compiled pipeline over device-resident state.

    Usage::

        pipe = DeltaStreamPipeline(config)
        prev = pipe.init_state(base_frame)          # device uint8 buffer
        prev, pos, xs, vals, aux = pipe.step(prev, frame, text="FPS: 30")
    """

    def __init__(self, config: StreamConfig, conv_weights: Optional[np.ndarray] = None,
                 threshold_map: Optional[np.ndarray] = None):
        self.config = config
        self.atlas_np = fonts.make_atlas(config.overlay_scale, config.overlay_font)
        self.atlas = jnp.asarray(self.atlas_np)
        if conv_weights is None:
            conv_weights = reference_cpu.gaussian_kernel(config.conv_k)
        self.conv_weights = np.asarray(conv_weights, dtype=np.float64)
        self.conv_weights_q16 = reference_cpu.quantize_kernel_q16(self.conv_weights)
        # optional per-byte sensitivity map (beyond the reference's
        # global threshold): byte i ships iff |df_i| > threshold_map[i]
        self.threshold_map_np = None
        self._thr_map = None
        self._thr_map_min = None
        if threshold_map is not None:
            tm = np.asarray(threshold_map, dtype=np.uint8).ravel()
            if tm.size != config.frame_bytes:
                raise ValueError(
                    f"threshold_map has {tm.size} bytes, frame has "
                    f"{config.frame_bytes}"
                )
            self.threshold_map_np = tm
            self._thr_map = jnp.asarray(tm)
            self._thr_map_min = int(tm.min())
        # Mosaic kernels need the interpreter off-TPU (tests run on CPU)
        self._interpret = jax.default_backend() == "cpu"
        # HOST backend fast path: the host already owns the source frame,
        # so it can extract the payload values itself from a prev shadow
        # and the device ships only the n/8-byte bitmask (vs the n-byte
        # dense delta). The shadow mirrors the DEVICE prev (negative
        # feedback included). Gated off under noise_filter: the conv
        # runs on device and the host copy would not match it.
        self._host_fast = (
            config.compaction.value == "host" and not config.noise_filter
        )
        self._host_prev: Optional[np.ndarray] = None
        # use the fast VPU sine colormap only when this backend provably
        # reproduces the float64 LUT for all 766 inputs
        self._heatmap_sine = (
            config.visualizer == Visualizer.HEATMAP
            and filter_ops.heatmap_sine_is_exact()
        )
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    # -- state ------------------------------------------------------------
    def init_state(self, base_frame: np.ndarray) -> Array:
        """Upload the base frame as the initial reconstruction state
        (the reference seeds ``d_current`` with it, kernels.cu:406, and
        ships it raw to the client, threads.cpp:224)."""
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        if base.size != self.config.frame_bytes:
            raise ValueError("base frame size mismatch")
        if self._host_fast:
            # (re)sync the host prev shadow — load_state funnels here too
            self._host_prev = base.copy()
        return jnp.asarray(base)

    # -- the fused step ---------------------------------------------------
    def _step_impl(
        self, prev: Array, frame: Array, char_ids: Array, n_chars: Array
    ):
        cfg = self.config
        cur = frame
        if cfg.noise_filter:
            cur = conv_ops.convolve_q16(
                cur, self.conv_weights_q16, cfg.height, cfg.width
            )

        # Overlay placement: visualizers that read the overlaid current
        # frame (heatmap/grayscale/binarize) need it materialized across
        # the whole frame; otherwise the text strip is blended over a
        # tiny prefix and folded into the Pallas kernel's frame read —
        # zero extra full-frame passes (the XLA strip update costs a
        # whole HBM pass because the fused DUS lowers to a full-buffer
        # select; see benchmarks/stage_breakdown.py).
        cell_h = self.atlas.shape[1]
        overlay_in_kernel = (
            cfg.compaction.value == "pallas"
            and cfg.visualizer in (
                Visualizer.NONE, Visualizer.RED_BLACK, Visualizer.RED_OVERLAP
            )
            and cell_h <= cfg.height
        )
        overlay_region = None
        if overlay_in_kernel:
            strip_bytes = cell_h * cfg.width * 3
            overlay_region = overlay_ops.overlay_blit(
                cur[:strip_bytes], self.atlas, char_ids, n_chars,
                cell_h, cfg.width,
            )
        else:
            cur = overlay_ops.overlay_blit(
                cur, self.atlas, char_ids, n_chars, cfg.height, cfg.width
            )

        aux = None
        if cfg.visualizer == Visualizer.HEATMAP:
            aux = filter_ops.heatmap(cur, prev, use_sine=self._heatmap_sine)
        elif cfg.visualizer == Visualizer.GRAYSCALE:
            aux = filter_ops.grayscale_weighted(cur)
        elif cfg.visualizer == Visualizer.BINARIZE:
            aux = filter_ops.binarize_pipeline(cur)

        needs_mask = cfg.visualizer in (Visualizer.RED_BLACK, Visualizer.RED_OVERLAP)
        thr = cfg.threshold if self._thr_map is None else self._thr_map
        thr_positive = (
            cfg.threshold > 0 if self._thr_map is None else self._thr_map_min > 0
        )
        if cfg.compaction.value == "pallas":
            if cfg.maskonly_payload:
                # BITMASK-ONLY emission: no int32 index blocks at all,
                # change-bits packed in-kernel (see config.maskonly_payload
                # / logcompact emit="mask"). Payload order: (pos, counts,
                # vals_t, bits) — the mask landing's exact inputs.
                pos, counts, vals_t, bits, new_prev = (
                    logcompact.fused_diff_compact(
                        cur,
                        prev,
                        threshold=cfg.threshold,
                        negative_feedback=cfg.negative_feedback,
                        interpret=self._interpret,
                        emit="mask",
                        overlay_region=overlay_region,
                        threshold_map=self._thr_map,
                        sub_rows=cfg.subtile_rows,
                        pair=cfg.pair_lanes,
                    )
                )
                payload = (pos, counts, vals_t, bits)
            elif cfg.tiled_payload:
                # sub-tiled compaction rides the tiled emit only: the
                # flat emit's device merge is unit-serial and would pay
                # tile_rows/subtile_rows more steps (benchmarks/subtile_ab)
                pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
                    cur,
                    prev,
                    threshold=cfg.threshold,
                    negative_feedback=cfg.negative_feedback,
                    interpret=self._interpret,
                    emit="tiled",
                    overlay_region=overlay_region,
                    threshold_map=self._thr_map,
                    sub_rows=cfg.subtile_rows,
                    pair=cfg.pair_lanes,
                )
                payload = (pos, counts, xs_t, vals_t)
                if cfg.emit_bitmask:
                    # packed change-bits for the landing's "mask" fetch
                    # flavor (~1 B per changed byte over the link on
                    # locally dense scenes). One extra fused elementwise
                    # pass; with negative feedback the kernel's own prev
                    # update IS the mask (|df| > thr >= 0 implies
                    # cur != prev), so no second diff is computed.
                    if cfg.negative_feedback:
                        bmask = new_prev != prev
                    else:
                        cur_m = (
                            _apply_region(cur, overlay_region)
                            if overlay_region is not None else cur
                        )
                        bmask = diff_ops.diff_mask(cur_m, prev, thr)[0]
                    # pad to the tiled emit's unit coverage (n_units *
                    # unit_bytes >= n): the landing's window math slices
                    # whole units, and the last tile may be partial
                    bmask = jnp.pad(bmask, (0, xs_t.size - bmask.shape[0]))
                    payload = (*payload, diff_ops.pack_bitmask(bmask))
            else:
                pos, xs, vals, new_prev = logcompact.fused_diff_compact(
                    cur,
                    prev,
                    threshold=cfg.threshold,
                    negative_feedback=cfg.negative_feedback,
                    interpret=self._interpret,
                    overlay_region=overlay_region,
                    threshold_map=self._thr_map,
                )
                if cfg.capacity != cfg.frame_bytes:
                    xs, vals = xs[: cfg.capacity], vals[: cfg.capacity]
                payload = (pos, xs, vals)
            mask = None
            if needs_mask:
                if cfg.negative_feedback and thr_positive:
                    # |df| > thr > 0 implies cur != prev, so the negfeed
                    # update encodes the mask exactly — no second diff pass
                    mask = new_prev != prev
                else:
                    if overlay_region is not None:
                        cur = _apply_region(cur, overlay_region)
                    mask = diff_ops.diff_mask(cur, prev, thr)[0]
        elif cfg.compaction.value == "host":
            # HOST backend: the device does only the O(n) elementwise work
            # (dense delta + a packed bitmask, n/8 bytes); the C packer
            # compacts on the host. Fast path (no noise filter): only the
            # bitmask is fetched — the host re-derives the values from
            # its own source frame + a prev shadow
            # (cvstpu.c:compact_update); otherwise the dense delta is
            # fetched too (cvstpu.c:compact_bitmask, ctz word scans).
            # See DeltaStreamPipeline.step for the host half.
            mask, raw_vals, new_prev = diff_ops.diff_mask(
                cur, prev, thr, cfg.negative_feedback
            )
            if self._host_fast:
                # host-source packer: the dense delta is DCE'd out of the
                # jit entirely — emitting it as an output would pay an
                # n-byte HBM write nothing reads
                payload = (diff_ops.pack_bitmask(mask),)
            else:
                payload = (diff_ops.pack_bitmask(mask), raw_vals)
        else:
            mask, raw_vals, new_prev = diff_ops.diff_mask(
                cur, prev, thr, cfg.negative_feedback
            )
            pos, xs, vals = compact_ops.compact(
                mask, raw_vals, cfg.capacity, cfg.compaction.value
            )
            payload = (pos, xs, vals)

        if cfg.visualizer == Visualizer.RED_BLACK:
            aux = filter_ops.red_black(mask)
        elif cfg.visualizer == Visualizer.RED_OVERLAP:
            aux = filter_ops.red_overlap(prev, mask)

        if aux is None:
            return (new_prev, *payload)
        return (new_prev, *payload, aux)

    # -- public API -------------------------------------------------------
    def step(
        self, prev: Array, frame, text: str = ""
    ) -> Tuple[Array, ...]:
        """Run one frame. ``frame`` may be a numpy or device array.

        Returns ``(new_prev, pos, xs, vals, aux)``; ``aux`` is None unless
        a visualizer is configured. Outputs are device arrays — callers on
        the hot path should fetch ``pos`` first and slice ``xs``/``vals``
        host-side (see runtime.executor) — except:

        * HOST backend: ``xs``/``vals`` are host numpy arrays (exactly
          ``pos`` long), packed by the native C packer from the device's
          (bitmask[, dense delta]) output. NOTE: unlike the device
          backends this makes the pipeline STATEFUL — the fast path
          keeps a host previous-frame shadow, so one HOST pipeline
          serves exactly one stream (interleaving two streams through it
          corrupts both shadows; ``BatchedDeltaPipeline`` rejects HOST
          for the same reason) and ``init_state`` must run before the
          first ``step``. Raises :class:`PayloadOverflowError` when a
          frame changes more than ``payload_capacity`` bytes;
        * tiled payload: returns ``(new_prev, pos, counts, xs_t, vals_t,
          aux)`` with per-tile device blocks (see
          ``logcompact.fused_diff_compact(emit="tiled")``); with
          ``emit_bitmask`` the packed change-bits ride between vals_t
          and aux: ``(new_prev, pos, counts, xs_t, vals_t, bits, aux)``;
        * bitmask-only payload (``maskonly_payload``): no index blocks —
          ``(new_prev, pos, counts, vals_t, bits, aux)``.
        """
        cfg = self.config
        ids = fonts.encode_text(text, MAX_OVERLAY_CHARS)
        char_ids = jnp.asarray(ids, dtype=jnp.int32)
        nc = min(len(text), MAX_OVERLAY_CHARS)
        n_chars = jnp.int32(nc)
        if isinstance(frame, jax.Array) and cfg.compaction.value != "host":
            # device-resident frame (an HBM-generated source, or a caller
            # that pre-uploaded): np.asarray here would force a full
            # device->host download (~390 ms for 6.2 MB over the tunnel)
            # just to re-upload it — keep it on device. The HOST backend
            # is excluded: its packer derives values from the host bytes.
            frame_np = None
            frame = frame.astype(jnp.uint8).ravel()
        else:
            frame_np = np.asarray(frame, dtype=np.uint8).ravel()
            frame = jnp.asarray(frame_np)
        out = self._step(prev, frame, char_ids, n_chars)

        if cfg.compaction.value == "host":
            from cudavideostream_tpu import native

            if self._host_fast:
                # host-source packer: values from the host's own frame +
                # prev shadow; only the n/8-byte bitmask leaves the
                # device (the dense delta is not even computed as a jit
                # output — see _step_impl)
                new_prev, bitmask = out[:2]
                aux = out[2] if len(out) > 2 else None
                if self._host_prev is None:
                    raise RuntimeError(
                        "HOST backend: call init_state(base_frame) before "
                        "step() — the host packer derives payload values "
                        "from its previous-frame shadow"
                    )
                cur_host = frame_np
                # nc is the host int from above — int(n_chars) would be
                # a ~30 ms device->host scalar round-trip per frame on
                # the tunneled backend, a second sequential RTT on the
                # exact path built to minimize link traffic
                if nc:
                    cur_host = reference_cpu.overlay_blit(
                        cur_host, self.atlas_np, ids[:nc],
                        cfg.height, cfg.width,
                    )
                xs, vals = native.compact_update_np(
                    cur_host, self._host_prev, np.asarray(bitmask)
                )
                if not cfg.negative_feedback:
                    # new_prev = cur everywhere, not just at masked bytes
                    np.copyto(self._host_prev, cur_host)
            else:
                new_prev, bitmask, delta = out[:3]
                aux = out[3] if len(out) > 3 else None
                xs, vals = native.compact_bitmask_np(
                    np.asarray(delta), np.asarray(bitmask)
                )
            pos = xs.size
            if pos > cfg.capacity:
                # state= keeps the executor consistent: the fast path's
                # host shadow already absorbed this frame while packing
                raise PayloadOverflowError(
                    f"frame changed {pos} bytes > payload_capacity "
                    f"{cfg.capacity}", state=new_prev,
                )
            return new_prev, pos, xs, vals, aux

        if cfg.tiled_payload:
            # (new_prev, pos, counts, xs_t, vals_t[, bits][, aux]) — or
            # (new_prev, pos, counts, vals_t, bits[, aux]) bitmask-only
            if cfg.maskonly_payload:
                want = 6
            else:
                want = 6 + (1 if cfg.emit_bitmask else 0)
            if len(out) == want - 1:
                return (*out, None)
            return out

        if len(out) == 4:
            return (*out, None)
        return out

    @property
    def jitted(self):
        """The raw jitted step fn (prev, frame, char_ids, n_chars)."""
        return self._step
