"""Device convolution / denoise filters.

The reference's tiled shared-memory KxK convolution
(``kernels.cu:97-136``: BLOCK_SIZE^2 threads stage a halo tile, TILE_SIZE^2
compute) maps onto the TPU as K^2 shifted integer adds over the whole
frame — XLA fuses them into a few VPU passes, and the "halo" is just
array slicing of a zero-padded buffer; no manual staging needed.

Weights are Q16 fixed-point (see :func:`reference_cpu.quantize_kernel_q16`)
so device and oracle are bit-identical; accumulation fits int32 for K<=9
(65536*255*81 < 2^31).

The median filter (the reference's benchmarked-and-rejected variant,
``tests/noise_filter_benchmark/v3.cu``) uses an XLA sort over the K^2
window axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array


def convolve_q16(
    frame: Array, weights_q16: np.ndarray, height: int, width: int
) -> Array:
    """Zero-padded KxK convolution per channel; flat uint8 in/out.

    ``weights_q16`` is a static (k, k) integer numpy array of Q16 weights.
    """
    k = weights_q16.shape[0]
    pad = k // 2
    # byte-space 2D view: an (h, w, 3) view would relayout the whole
    # frame (minor dim 3); a horizontal pixel shift is a 3-byte shift
    img = frame.reshape(height, width * 3).astype(jnp.int32)
    padded = jnp.pad(img, ((pad, pad), (3 * pad, 3 * pad)))
    return accumulate_q16(padded, weights_q16, height, width)


def accumulate_q16(
    padded: Array, weights_q16: np.ndarray, rows: int, width: int
) -> Array:
    """Shared Q16 stencil accumulation over a padded byte-space image.

    ``padded`` is ``(rows + 2*pad, width*3 + 6*pad)`` int32 — zero rows
    at global borders, halo rows from neighbor shards in the sharded
    path (parallel/halo_conv.py). ONE implementation of the K² shifted
    adds + ``>> 16`` + clip, so the solo and sharded conv paths cannot
    silently diverge from each other or the oracle. Returns flat uint8
    ``(rows * width * 3,)``.
    """
    k = weights_q16.shape[0]
    acc = jnp.zeros((rows, width * 3), jnp.int32)
    for i in range(k):
        for j in range(k):
            w = int(weights_q16[i, j])
            if w:
                acc = acc + w * padded[i : i + rows, 3 * j : 3 * j + width * 3]
    return jnp.clip(acc >> 16, 0, 255).astype(jnp.uint8).reshape(-1)


def _oddeven_merge_network(n: int):
    """Batcher odd-even mergesort compare-exchange pairs for n inputs."""
    pairs = []

    def merge(lo, length, r):
        step = r * 2
        if step < length:
            merge(lo, length, step)
            merge(lo + r, length, step)
            for i in range(lo + r, lo + length - r, step):
                if i + r < lo + length:
                    pairs.append((i, i + r))
        else:
            if lo + r < lo + length:
                pairs.append((lo, lo + r))

    def sort(lo, length):
        if length > 1:
            m = length // 2
            sort(lo, m)
            sort(lo + m, length - m)
            merge(lo, length, 1)

    # Batcher needs a power-of-two width; pad indices >= n are virtual
    # +inf sentinels and their exchanges are dropped.
    p = 1
    while p < n:
        p *= 2
    sort(0, p)
    return [(a, b) for a, b in pairs if a < n and b < n]


def median_filter(frame: Array, k: int, height: int, width: int) -> Array:
    """Zero-padded KxK per-channel median; flat uint8 in/out.

    Sorting-network formulation: ``jnp.sort`` over the k^2 window axis
    materializes an iota of the full window stack (34 GB at 1080p K=5),
    so the k^2 candidates are reduced with a Batcher odd-even
    compare-exchange network instead — pure min/max VPU ops the compiler
    can fuse, the same structure as the reference's unrolled bubble sort
    device function (``tests/noise_filter_benchmark/v3.cu:32-47``).

    The virtual padding sentinels of the network are +inf, so dropped
    exchanges leave real elements in place and the middle element of the
    first ``k*k`` slots is the true median.
    """
    pad = k // 2
    img = frame.reshape(height, width * 3)  # byte-space view (see above)
    padded = jnp.pad(img, ((pad, pad), (3 * pad, 3 * pad)))
    win = [
        padded[i : i + height, 3 * j : 3 * j + width * 3]
        for i in range(k)
        for j in range(k)
    ]
    for a, b in _oddeven_merge_network(len(win)):
        lo = jnp.minimum(win[a], win[b])
        hi = jnp.maximum(win[a], win[b])
        win[a], win[b] = lo, hi
    return win[(k * k) // 2].reshape(-1)
