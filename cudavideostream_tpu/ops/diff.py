"""The core delta operator on device: thresholded per-byte diff with
negative feedback.

TPU-native re-design of the reference's ``kernel2``
(``server/src/kernels.cu:289-334``): where the CUDA kernel runs 1024
threads over ``long4`` chunks with an ``atomicInc`` append, here the diff
is a fused elementwise XLA computation over the whole frame (VPU, one HBM
pass) and compaction is a separate deterministic stage
(:mod:`cudavideostream_tpu.ops.compact`).

Byte-exact contract (vs :func:`reference_cpu.diff_encode`):

* ``df = int(cur) - int(prev)`` (true signed difference, no wrap);
* a byte ships iff ``|df| > threshold`` (strictly greater);
* shipped value is ``df mod 256`` (client wrap-add reproduces ``cur``);
* non-shipped bytes of the new previous-frame buffer keep the *previous*
  value (negative feedback, ``kernels.cu:318-323``), so sub-threshold
  drift accumulates until it crosses the threshold.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
from jax import Array


def diff_mask(
    current: Array,
    previous: Array,
    threshold: int,
    negative_feedback: bool = True,
) -> Tuple[Array, Array, Array]:
    """Elementwise diff stage.

    Args:
      current / previous: flat ``uint8`` frames of equal length.
      threshold: ship iff ``|df| > threshold``.

    Returns:
      ``(mask, vals, new_previous)`` — ``mask`` bool, ``vals`` uint8 wrap
      deltas (defined everywhere; only masked entries are meaningful),
      ``new_previous`` uint8.
    """
    cur = current.astype(jnp.int16)
    prev = previous.astype(jnp.int16)
    df = cur - prev
    mask = jnp.abs(df) > threshold
    vals = df.astype(jnp.uint8)  # mod-256 wrap
    if negative_feedback:
        new_prev = jnp.where(mask, current, previous)
    else:
        new_prev = current
    return mask, vals, new_prev


_PACK_ROW = 384  # (M, 384) byte view — the layout-safe frame shape


@functools.lru_cache(maxsize=1)
def _pack_matrix() -> "np.ndarray":
    """(384, 48) constant: column ``b`` collects lanes ``8b..8b+7`` with
    weights ``2^(c%8)`` — bit-packing as one MXU matmul."""
    import numpy as np

    p = np.zeros((_PACK_ROW, _PACK_ROW // 8), np.float32)
    for c in range(_PACK_ROW):
        p[c, c // 8] = float(1 << (c % 8))
    return p


def pack_bitmask(mask: Array) -> Array:
    """Pack a bool mask into LSB-first bitmask bytes: bit ``i % 8`` of
    byte ``i // 8`` is ``mask[i]`` — exactly the layout the native host
    packer consumes (``native/csrc/cvstpu.c:compact_bitmask``). This is
    the device half of the HOST compaction backend and of the
    bandwidth-floor offload mode: n/8 output bytes, no compaction on
    device at all.

    Layout note: a ``reshape(-1, 8)`` + weighted sum relayouts the whole
    buffer on TPU (minor-dim-8 views hit the same trap as ``(..., 3)``
    pixel views — measured 0.64 ms at 1080p). The fast path instead
    rides the (M, 384) byte view and packs with one constant-matrix MXU
    matmul (the ``ops/filters.py`` pattern): 0/1 inputs and power-of-2
    weights are bf16-safe, partial sums are exact integers <= 255.
    """
    n = mask.shape[0]
    if n % _PACK_ROW == 0:
        import jax

        m = mask.reshape(-1, _PACK_ROW).astype(jnp.float32)
        packed = jnp.dot(
            m, jnp.asarray(_pack_matrix()),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return packed.astype(jnp.uint8).reshape(-1)
    pad = (-n) % 8
    m = jnp.pad(mask, (0, pad)) if pad else mask
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    packed = jnp.sum(m.reshape(-1, 8).astype(jnp.int32) * weights, axis=1)
    return packed.astype(jnp.uint8)
