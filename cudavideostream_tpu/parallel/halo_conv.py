"""Row-sharded KxK convolution with explicit ICI halo exchange.

The reference's tiled convolution stages a halo ring in ``__shared__``
memory within each thread block (``kernels.cu:97-136``). Sharded over
chips, the halo crosses the interconnect instead: each shard holds
``H/n`` rows and receives ``K//2`` boundary rows from each neighbor via
``jax.lax.ppermute`` before running the same Q16 fixed-point stencil
locally. Zero padding at the global image border is preserved exactly
(edge shards pad with zeros, matching :func:`reference_cpu.convolve`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def halo_exchange_rows(local: Array, pad: int, axis_name: str) -> Array:
    """Concatenate ``pad`` rows from each neighbor around ``local``.

    ``local`` is (rows, row_bytes); returns (rows + 2*pad, row_bytes).
    Global edge shards receive zeros, matching the reference's zero
    padding.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_halo = jnp.zeros((pad,) + local.shape[1:], local.dtype)
    bot_halo = jnp.zeros((pad,) + local.shape[1:], local.dtype)
    if n > 1:
        # my bottom rows -> next shard's top halo
        send_down = local[-pad:]
        top_from_prev = jax.lax.ppermute(
            send_down, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        # my top rows -> previous shard's bottom halo
        send_up = local[:pad]
        bot_from_next = jax.lax.ppermute(
            send_up, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
        top_halo = jnp.where(idx > 0, top_from_prev, top_halo)
        bot_halo = jnp.where(idx < n - 1, bot_from_next, bot_halo)
    return jnp.concatenate([top_halo, local, bot_halo], axis=0)


def sharded_convolve_q16(
    local_frame: Array,
    weights_q16: np.ndarray,
    local_rows: int,
    width: int,
    axis_name: str,
) -> Array:
    """Per-shard body: flat local rows -> convolved flat local rows.

    Byte-space (rows, W*3) view throughout (a (…,3) view would relayout);
    horizontal pixel shifts are 3-byte shifts.
    """
    k = weights_q16.shape[0]
    pad = k // 2
    img = local_frame.reshape(local_rows, width * 3).astype(jnp.int32)
    img = halo_exchange_rows(img, pad, axis_name)
    # horizontal zero padding is shard-local
    img = jnp.pad(img, ((0, 0), (3 * pad, 3 * pad)))
    acc = jnp.zeros((local_rows, width * 3), jnp.int32)
    for i in range(k):
        for j in range(k):
            w = int(weights_q16[i, j])
            if w:
                acc = acc + w * img[i : i + local_rows, 3 * j : 3 * j + width * 3]
    return jnp.clip(acc >> 16, 0, 255).astype(jnp.uint8).reshape(-1)
