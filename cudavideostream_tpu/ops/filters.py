"""Device filter bank: grayscale, binarization, heatmap, red visualizers.

TPU re-designs of the reference kernels (all byte-exact vs
:mod:`reference_cpu`).

Layout note (the key to performance): frames are flat interleaved BGR
bytes. Any ``reshape(-1, 3)`` view puts 3 elements in the 128-lane minor
dimension and forces a relayout costing milliseconds at 1080p. Instead
the frame is viewed as ``(M, 384)`` rows of 128 interleaved pixels — a
free reshape — and *channel extraction/summation/replication are matmuls*
against tiny constant 0/1 matrices, which the MXU does in microseconds:

    pixels (M,384) @ E (384,128)  ->  per-pixel channel combination
    values (M,128) @ R (128,384)  ->  replicate back to interleaved lanes

All arithmetic that must be bit-exact (``//3``, ``//1000``, LUT indices)
runs in int32 after the (exact, <2^24) f32 matmuls.

* grayscale avg/weighted (``kernels.cu:31-95``);
* histogram + prefix-max "top-2" + binarize (``kernels.cu:138-241``,
  CPU scan ``server.cpp:96-135``) — the shared-memory atomic histogram
  becomes a fused compare-and-sum reduction; the tree reduction becomes
  a vectorized exclusive-cummax which *exactly* captures the CPU scan's
  quirky tie-breaking (the scan's ``elif`` is dead code because
  ``sec == max`` after every update, so the result is the last two
  prefix-max update indices);
* motion heatmap (``kernels.cu:243-270``) — per-pixel ``sinf`` colormap
  as a 766-entry integer LUT (exact by construction);
* red visualizers (``kernels.cu:273-281``) — elementwise selects on the
  changed-pixel mask, which also fixes the reference's truncated launch
  geometry that drops the last ``pos % 1024`` entries (``kernels.cu:514``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cudavideostream_tpu.ops import reference_cpu

_PIX = 128          # pixels per row in the (M, 384) view
_ROW = 3 * _PIX     # bytes per row


@functools.lru_cache(maxsize=None)
def _extract_matrix(weights: Tuple[int, int, int]) -> np.ndarray:
    """(384, 128) f32: column p sums channel c of pixel p with weight
    weights[c]."""
    e = np.zeros((_ROW, _PIX), np.float32)
    for p in range(_PIX):
        for c in range(3):
            e[3 * p + c, p] = weights[c]
    return e


@functools.lru_cache(maxsize=None)
def _replicate_matrix(channels: Tuple[int, ...]) -> np.ndarray:
    """(128, 384) f32: places pixel value p at lanes 3p+c for given c."""
    r = np.zeros((_PIX, _ROW), np.float32)
    for p in range(_PIX):
        for c in channels:
            r[p, 3 * p + c] = 1.0
    return r


def _rows(frame: Array) -> Array:
    """Free (M, 384) view; pads are impossible (frame_bytes % 384 may be
    nonzero for exotic widths — fall back to a pixel view then)."""
    return frame.reshape(-1, _ROW)


def _per_pixel(frame: Array, weights: Tuple[int, int, int]) -> Array:
    """(M, 128) f32 of per-pixel weighted channel sums (exact ints).

    Precision must be HIGHEST: TPU matmuls at DEFAULT precision truncate
    f32 inputs to bf16 (8 significand bits), and weights like 587 are not
    bf16-representable — the weighted grayscale then drifts ±1 on real
    hardware while CPU tests stay green. Caught by bench.py's per-variant
    byte-exact gate on TPU; HIGHEST restores true-f32 products, which are
    exact here (inputs <= 255, sums < 2^24).
    """
    e = jnp.asarray(_extract_matrix(weights))
    return jnp.dot(
        _rows(frame).astype(jnp.float32), e,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _replicate(vals_f32: Array, channels=(0, 1, 2)) -> Array:
    # 0/1 matrix and values <= 255: bf16-exact either way, but keep the
    # whole exact-integer path pinned to HIGHEST for uniformity
    r = jnp.asarray(_replicate_matrix(tuple(channels)))
    return jnp.dot(
        vals_f32, r,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _layout_ok(frame: Array) -> bool:
    return frame.shape[0] % _ROW == 0


def grayscale_average(frame: Array) -> Array:
    """(B+G+R)//3 broadcast to all three channels; flat uint8 in/out."""
    if not _layout_ok(frame):
        px = frame.reshape(-1, 3).astype(jnp.int32)
        g = (px[:, 0] + px[:, 1] + px[:, 2]) // 3
        return jnp.repeat(g.astype(jnp.uint8), 3)
    s = _per_pixel(frame, (1, 1, 1)).astype(jnp.int32)
    g = (s // 3).astype(jnp.float32)
    return _replicate(g).astype(jnp.uint8).reshape(-1)


def grayscale_weighted(frame: Array) -> Array:
    """(114*B + 587*G + 299*R)//1000, BGR layout; flat uint8 in/out."""
    if not _layout_ok(frame):
        px = frame.reshape(-1, 3).astype(jnp.int32)
        g = (114 * px[:, 0] + 587 * px[:, 1] + 299 * px[:, 2]) // 1000
        return jnp.repeat(g.astype(jnp.uint8), 3)
    s = _per_pixel(frame, (114, 587, 299)).astype(jnp.int32)
    g = (s // 1000).astype(jnp.float32)
    return _replicate(g).astype(jnp.uint8).reshape(-1)


def gray_pixels(frame: Array) -> Array:
    """Per-pixel weighted gray values (0..255) as int32, NOT replicated
    back to a 3-channel frame: the (M, 128) form every consumer in the
    binarize chain actually wants. One extract-matmul over the frame."""
    if _layout_ok(frame):
        s = _per_pixel(frame, (114, 587, 299)).astype(jnp.int32)
        return s // 1000  # (M, 128)
    px = frame.reshape(-1, 3).astype(jnp.int32)
    return (114 * px[:, 0] + 587 * px[:, 1] + 299 * px[:, 2]) // 1000


def value_histogram(g: Array) -> Array:
    """256-bin compare-reduce histogram over int values in [0, 255].

    Fused compare-and-sum over bin chunks — counts accumulate in int32
    without scatter-adds; the comparison broadcast fuses into the
    reduction. ~256 VPU compare+add per value, compute-bound but
    entirely in registers (the closed-lead analysis of cheaper units
    lives in :func:`gray_histogram`'s docstring).

    On hardware, (M, 128) grids route to the Pallas per-tile histogram
    with statically-unrolled bins: the tile pinned in VMEM, bin counts
    accumulated in SMEM across the sequential grid — measured 0.325 ms
    vs this compare-reduce's 0.468 standalone at 1080p, and 0.436 vs
    0.486 through the full fused binarize chain (XLA had fused part of
    the compare-reduce into the gray extract; the Pallas form instead
    pays one (M, 128) int32 HBM round trip for the gray grid — the
    ~10% chain win is the honest number; benchmarks/binarize_pallas_ab,
    byte-exact both ways, and the dynamic-bin fori variant is 4x
    SLOWER, so the unroll is the whole win). CPU keeps the XLA form
    (interpret mode would crawl through 256 unrolled reduces per tile;
    tests pin exactness on a small grid); the chip gate covers the
    Pallas path (bench.py --all-variants, binarize variant)."""
    if (g.ndim == 2 and g.shape[1] == 128 and g.shape[0] % 8 == 0
            and jax.default_backend() not in ("cpu",)):
        from cudavideostream_tpu.ops.hist_pallas import pallas_histogram

        return pallas_histogram(g.astype(jnp.int32), unroll=True)
    return _value_histogram_xla(g)


def _value_histogram_xla(g: Array) -> Array:
    """The XLA compare-reduce form of :func:`value_histogram` — the CPU
    path, and the explicit A/B target now that ``value_histogram``
    routes to Pallas on hardware (benchmarks/binarize_pallas_ab)."""
    g = g.astype(jnp.int32)
    chunk = 64
    parts = []
    for b0 in range(0, 256, chunk):
        bins = jax.lax.broadcasted_iota(jnp.int32, (chunk,), 0) + b0
        parts.append(
            jnp.sum(
                (g[..., None] == bins).astype(jnp.int32),
                axis=tuple(range(g.ndim)),
            )
        )
    return jnp.concatenate(parts)


def binarize_pixels(gray_px: Array, threshold: Array) -> Array:
    """Per-pixel ``gray > threshold -> 255 else 0`` replicated to all
    three channels of a flat uint8 frame. Byte-identical to
    :func:`binarize` on the replicated gray frame (all three bytes of a
    gray pixel are equal)."""
    b = (gray_px.astype(jnp.int32) > threshold.astype(jnp.int32))
    if gray_px.ndim == 2:
        return _replicate(
            b.astype(jnp.float32) * 255.0
        ).astype(jnp.uint8).reshape(-1)
    return jnp.repeat(jnp.where(b, 255, 0).astype(jnp.uint8), 3)


def gray_histogram(gray_frame: Array, mxu: bool = False) -> Array:
    """256-bin per-pixel histogram (samples channel 0 of the 3-channel
    gray buffer, like ``generate_histogram`` kernels.cu:147-149).

    Default: fused compare-and-sum over bin chunks — counts accumulate
    in int32 without scatter-adds; the comparison broadcast fuses into
    the reduction. ~256 VPU compare+add per pixel, compute-bound
    (0.51 ms at 1080p) but entirely in registers.

    ``mxu=True``: nibble-factorized MXU histogram, kept as a measured
    candidate and exactness cross-check. With ``hi = g >> 4`` and
    ``lo = g & 15``, ``H[hi, lo] = HIᵀ @ LO`` where HI/LO are (N, 16)
    one-hot nibble indicators — all 256 bins in ONE matmul and only 32
    compares per pixel. NOT the default because the XLA-level
    formulation must materialize the indicators, and a (N, 16) operand
    pads its 16-wide minor dim to 128 lanes (the same trap as (B, n)
    sublane padding, but in lanes): 8x memory amplification makes the
    traffic ~1 GB at 1080p, losing to the compare-reduce's zero
    materialization. A Pallas variant that builds the indicators
    per-tile in VMEM dodges the HBM amplification but not the MXU's
    shape economics: a (16, K) @ (K, 16) matmul streams the contraction
    dim through a 128x128 systolic array using 16x16 of it — ~K cycles
    regardless, so K = 2M pixels is ~2 ms of MXU time (4x WORSE than
    the compare-reduce). Packing 8 sublane-groups onto each side as
    (128, K/8) @ (K/8, 128) and reading only the 16x16 diagonal blocks
    cuts that to ~0.27 ms, which still loses once the 32 compares/px of
    indicator build (~0.07 ms) and the group bookkeeping are added:
    the exact-256-bin histogram is compute-bound on ANY unit and the
    compare-reduce is already within ~2x of the VPU's 1 op/lane/cycle
    bound — an analytic negative, recorded here so the lead stays
    closed (ROADMAP). Exactness at
    DEFAULT matmul precision regardless: indicator inputs are 0/1
    (bf16-safe) and the f32 accumulator is exact to 2^24; bin counts
    are bounded by the pixel count, so frames up to 16.7M pixels take
    the matmul and larger ones (8K+) fall back to compare-reduce.
    """
    if _layout_ok(gray_frame):
        g = _per_pixel(gray_frame, (1, 0, 0)).astype(jnp.int32)  # (M,128)
    else:
        g = gray_frame.reshape(-1, 3)[:, 0].astype(jnp.int32)
    n_px = int(np.prod(g.shape))
    if mxu and n_px < (1 << 24):
        nib = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)
        g2 = g.reshape(-1, 1)
        hi = ((g2 >> 4) == nib).astype(jnp.bfloat16)   # (N, 16)
        lo = ((g2 & 15) == nib).astype(jnp.bfloat16)   # (N, 16)
        h = jnp.dot(hi.T, lo, preferred_element_type=jnp.float32)
        return h.reshape(256).astype(jnp.int32)
    return value_histogram(g)


def top2_prefix_max(histogram: Array) -> Tuple[Array, Array]:
    """Vectorized exact equivalent of the CPU top-2 scan
    (``server.cpp:108-120``); see module docstring for the derivation.

    An index i is an "update" iff ``h[i] >= max(h[:i])`` (empty max = -1).
    Returns the last two update indices ``(imax, isec)``; ``isec`` is -1
    when only one update happened.
    """
    h = histogram.astype(jnp.int32)
    n = h.shape[0]
    run = jax.lax.associative_scan(jnp.maximum, h)
    excl = jnp.concatenate([jnp.full(1, -1, jnp.int32), run[:-1]])
    updates = h >= excl
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    upd_idx = jnp.where(updates, idx, -1)
    imax = jnp.max(upd_idx)
    isec = jnp.max(jnp.where(upd_idx == imax, -1, upd_idx))
    return imax, isec


def binarize_threshold(histogram: Array) -> Array:
    """trunc((imax+isec)/2) clamped to [50,200] (``server.cpp:121-127``).

    C division truncates toward zero; the only negative case is
    ``imax=0, isec=-1`` giving trunc(-0.5)=0, which clamps to 50 anyway,
    so floor division plus clamp is exact here.
    """
    imax, isec = top2_prefix_max(histogram)
    s = imax + isec
    t = jnp.where(s >= 0, s // 2, 0)
    return jnp.clip(t, 50, 200)


def binarize(gray_frame: Array, threshold: Array) -> Array:
    """gray > threshold -> 255 else 0, over all bytes."""
    return jnp.where(gray_frame > threshold.astype(jnp.uint8), 255, 0).astype(jnp.uint8)


def binarize_pipeline(frame: Array, fused: bool = True) -> Array:
    """Full binarize chain: gray -> histogram -> top-2 threshold -> 255/0.

    ``fused`` (default) computes the per-pixel gray (M, 128) ONCE and
    feeds it to both the histogram and the thresholded output — the
    reference (and the round-3 build) writes the 3-channel gray frame
    and re-reads it twice (``kernels.cu:491-499``: grayscale_v3 then
    generate_histogram then binarize all re-read global memory). The
    fusion drops one full-frame write, two re-reads, and one extract
    matmul; the remaining cost is the compute-bound 256-bin
    compare-reduce (see :func:`gray_histogram`). Byte-exact either way
    (all three channels of a gray pixel are equal, so per-pixel
    thresholding replicates to the identical bytes). A/B:
    ``benchmarks/binarize_fuse_ab``."""
    if fused:
        gv = gray_pixels(frame)
        t = binarize_threshold(value_histogram(gv))
        return binarize_pixels(gv, t)
    g = grayscale_weighted(frame)
    t = binarize_threshold(gray_histogram(g))
    return binarize(g, t)


_HEATMAP_LUT_DEV = None
_HEATMAP_LUT_PACKED = None


def _heatmap_lut_dev() -> Array:
    # numpy cached, jnp per call — see _heatmap_lut_packed's docstring
    # (a jnp value cached from inside a trace is a leaked tracer)
    global _HEATMAP_LUT_DEV
    if _HEATMAP_LUT_DEV is None:
        _HEATMAP_LUT_DEV = reference_cpu.heatmap_lut().astype(np.int32)
    return jnp.asarray(_HEATMAP_LUT_DEV)  # (766, 3)


def _heatmap_lut_packed() -> Array:
    """(766,) int32 with b | g<<8 | r<<16 — one gather instead of three.

    The cache holds NUMPY, converted per call: a cached ``jnp`` value
    created while some caller was tracing (e.g. the sharded pipeline's
    shard_map) would be a leaked tracer, poisoning every later caller
    with UnexpectedTracerError. ``jnp.asarray`` of a host constant is
    free to re-issue (XLA folds it).
    """
    global _HEATMAP_LUT_PACKED
    if _HEATMAP_LUT_PACKED is None:
        lut = reference_cpu.heatmap_lut().astype(np.int32)
        _HEATMAP_LUT_PACKED = (
            lut[:, 0] | (lut[:, 1] << 8) | (lut[:, 2] << 16)
        )
    return jnp.asarray(_HEATMAP_LUT_PACKED)


def _heatmap_sine_channels(d: Array):
    """Direct f32 evaluation of the three colormap channels for integer
    ``d`` (0..765): trunc(clamp(sin(pi*d/510 + phase))*255). Returns
    (b, g, r) f32 arrays with exact small-integer values *iff* the
    backend's f32 sin reproduces the float64 LUT — which
    :func:`heatmap_sine_is_exact` verifies per backend.
    """
    u = d.astype(jnp.float32) * jnp.float32(np.pi / 510.0)
    half = jnp.float32(np.pi / 2)

    def chan(phase):
        v = jnp.sin(u + phase) * 255.0
        return jnp.floor(jnp.clip(v, 0.0, 255.0))

    return chan(half), chan(jnp.float32(0.0)), chan(-half)


@functools.lru_cache(maxsize=None)
def heatmap_sine_is_exact() -> bool:
    """One-time on-device check: does the sine path reproduce the float64
    LUT for every one of the 766 possible inputs on this backend?"""
    try:
        d = jnp.arange(766, dtype=jnp.int32)
        b, g, r = jax.jit(_heatmap_sine_channels)(d)
        got = np.stack(
            [np.asarray(b), np.asarray(g), np.asarray(r)], axis=1
        ).astype(np.int32)
        return bool(np.array_equal(got, reference_cpu.heatmap_lut().astype(np.int32)))
    except Exception:
        return False


def heatmap(current: Array, previous: Array, use_sine: bool = False) -> Array:
    """Per-pixel sum|Δ| -> sine-colormap LUT, BGR out; flat uint8.

    sum|Δ| comes from one extract-matmul over |cur-prev|. Two value
    paths: ``use_sine`` evaluates the colormap directly on the VPU
    (callers must have verified :func:`heatmap_sine_is_exact` on this
    backend — DeltaStreamPipeline does); otherwise the 766-entry LUT is
    packed (3 bytes per int32) so a single gather runs on the (M,128)
    layout. Channels scatter back through replicate-matmuls.
    """
    if not _layout_ok(current):
        lut = _heatmap_lut_dev()
        cur = current.reshape(-1, 3).astype(jnp.int32)
        prev = previous.reshape(-1, 3).astype(jnp.int32)
        d = jnp.sum(jnp.abs(cur - prev), axis=1)
        return jnp.take(lut, d, axis=0).astype(jnp.uint8).reshape(-1)
    ad = jnp.abs(
        current.astype(jnp.int16) - previous.astype(jnp.int16)
    ).astype(jnp.uint8)
    d = _per_pixel(ad, (1, 1, 1)).astype(jnp.int32)  # (M,128) 0..765
    if use_sine:
        chans = _heatmap_sine_channels(d)
    else:
        packed = jnp.take(_heatmap_lut_packed(), d, axis=0)
        chans = [
            jnp.bitwise_and(packed >> (8 * c), 255).astype(jnp.float32)
            for c in range(3)
        ]
    out = jnp.zeros((d.shape[0], _ROW), jnp.float32)
    for c in range(3):
        out = out + _replicate(chans[c], (c,))
    return out.astype(jnp.uint8).reshape(-1)


def changed_pixels(mask: Array) -> Array:
    """(npx,) bool: any of the pixel's three byte-deltas shipped."""
    return jnp.any(mask.reshape(-1, 3), axis=1)


def _changed_rows(mask: Array) -> Array:
    """(M,128) bool changed-pixel flags from the flat byte mask."""
    s = _per_pixel(mask.astype(jnp.uint8), (1, 1, 1))
    return s > 0


def red_black(mask: Array) -> Array:
    """Mode 2: black frame, R=255 on changed pixels; flat uint8."""
    if not _layout_ok(mask):
        ch = changed_pixels(mask)
        out = jnp.zeros((ch.shape[0], 3), jnp.uint8)
        out = out.at[:, 2].set(jnp.where(ch, 255, 0).astype(jnp.uint8))
        return out.reshape(-1)
    ch = _changed_rows(mask).astype(jnp.float32) * 255.0
    return _replicate(ch, (2,)).astype(jnp.uint8).reshape(-1)


def red_overlap(previous: Array, mask: Array) -> Array:
    """Mode 3: previous frame with R=255 on changed pixels; flat uint8."""
    if not _layout_ok(mask):
        ch = changed_pixels(mask)
        px = previous.reshape(-1, 3)
        r = jnp.where(ch, jnp.uint8(255), px[:, 2])
        return px.at[:, 2].set(r).reshape(-1)
    ch = _changed_rows(mask).astype(jnp.float32)
    red_lanes = _replicate(ch, (2,)) > 0  # (M,384) bool at R lanes
    out = jnp.where(red_lanes, jnp.uint8(255), _rows(previous))
    return out.reshape(-1)
