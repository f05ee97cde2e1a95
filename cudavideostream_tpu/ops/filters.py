"""Device filter bank: grayscale, binarization, heatmap, red visualizers.

TPU re-designs of the reference kernels (all byte-exact vs
:mod:`reference_cpu`):

* grayscale avg/weighted (``kernels.cu:31-95``) — integer VPU elementwise;
* histogram + prefix-max "top-2" + binarize (``kernels.cu:138-241``,
  CPU scan ``server.cpp:96-135``) — the shared-memory atomic histogram
  becomes a one-hot reduction, the tree reduction becomes a vectorized
  exclusive-cummax (which also *exactly* captures the CPU scan's quirky
  tie-breaking: the scan's ``elif`` branch is dead code because
  ``sec == max`` after every update, so the result is simply the last two
  prefix-max update indices);
* motion heatmap (``kernels.cu:243-270``) — the per-pixel ``sinf``
  colormap becomes a 766-entry integer LUT gather (exact by construction);
* red visualizers (``kernels.cu:273-281``) — the xs-scatter becomes an
  elementwise select on the changed-pixel mask, which also fixes the
  reference's truncated launch geometry that drops the last
  ``pos % 1024`` entries (``kernels.cu:514``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cudavideostream_tpu.ops import reference_cpu


def grayscale_average(frame: Array) -> Array:
    """(B+G+R)//3 broadcast to all three channels; flat uint8 in/out."""
    px = frame.reshape(-1, 3).astype(jnp.int32)
    g = (px[:, 0] + px[:, 1] + px[:, 2]) // 3
    return jnp.repeat(g.astype(jnp.uint8), 3)


def grayscale_weighted(frame: Array) -> Array:
    """(114*B + 587*G + 299*R)//1000, BGR layout; flat uint8 in/out."""
    px = frame.reshape(-1, 3).astype(jnp.int32)
    g = (114 * px[:, 0] + 587 * px[:, 1] + 299 * px[:, 2]) // 1000
    return jnp.repeat(g.astype(jnp.uint8), 3)


def gray_histogram(gray_frame: Array) -> Array:
    """256-bin per-pixel histogram (samples channel 0 of the 3-channel
    gray buffer, like ``generate_histogram`` kernels.cu:147-149).

    One-hot matmul formulation: exact integer counts accumulated in f32
    on the MXU (counts < 2^24 so f32 is exact), avoiding TPU scatter-adds.
    """
    g = gray_frame.reshape(-1, 3)[:, 0].astype(jnp.int32)
    npx = g.shape[0]
    # chunk to bound the materialized one-hot at chunk x 256
    chunk = 8192
    pad = (-npx) % chunk
    g = jnp.pad(g, (0, pad), constant_values=-1)  # -1 matches no bin
    g = g.reshape(-1, chunk)

    bins = jax.lax.broadcasted_iota(jnp.int32, (256,), 0)

    def body(carry, row):
        onehot = (row[:, None] == bins[None, :]).astype(jnp.float32)
        return carry + jnp.sum(onehot, axis=0), None

    hist, _ = jax.lax.scan(body, jnp.zeros(256, jnp.float32), g)
    return hist.astype(jnp.int32)


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


def binarize_pipeline(frame: Array) -> Array:
    g = grayscale_weighted(frame)
    t = binarize_threshold(gray_histogram(g))
    return binarize(g, t)


_HEATMAP_LUT_DEV = None


def _heatmap_lut_dev() -> Array:
    global _HEATMAP_LUT_DEV
    if _HEATMAP_LUT_DEV is None:
        _HEATMAP_LUT_DEV = jnp.asarray(
            reference_cpu.heatmap_lut().astype(np.int32)
        )  # (766, 3)
    return _HEATMAP_LUT_DEV


def heatmap(current: Array, previous: Array) -> Array:
    """Per-pixel sum|Δ| -> sine-colormap LUT, BGR out; flat uint8."""
    cur = current.reshape(-1, 3).astype(jnp.int32)
    prev = previous.reshape(-1, 3).astype(jnp.int32)
    d = jnp.sum(jnp.abs(cur - prev), axis=1)  # (npx,) 0..765 (colormap wraps past 510 — reference quirk)
    lut = _heatmap_lut_dev()
    return jnp.take(lut, d, axis=0).astype(jnp.uint8).reshape(-1)


def changed_pixels(mask: Array) -> Array:
    """(npx,) bool: any of the pixel's three byte-deltas shipped."""
    return jnp.any(mask.reshape(-1, 3), axis=1)


def red_black(mask: Array) -> Array:
    """Mode 2: black frame, R=255 on changed pixels; flat uint8."""
    ch = changed_pixels(mask)
    npx = ch.shape[0]
    out = jnp.zeros((npx, 3), jnp.uint8)
    out = out.at[:, 2].set(jnp.where(ch, 255, 0).astype(jnp.uint8))
    return out.reshape(-1)


def red_overlap(previous: Array, mask: Array) -> Array:
    """Mode 3: previous frame with R=255 on changed pixels; flat uint8."""
    ch = changed_pixels(mask)
    px = previous.reshape(-1, 3)
    r = jnp.where(ch, jnp.uint8(255), px[:, 2])
    return px.at[:, 2].set(r).reshape(-1)
