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
    if pad == 0:
        return local  # k=1: no neighbor rows needed (local[-0:] would
        # be the WHOLE array, crashing the exchange below)
    if pad > local.shape[0]:
        raise ValueError(
            f"conv halo of {pad} rows exceeds the {local.shape[0]}-row "
            f"shard — a halo may only reach the adjacent shard; use "
            f"fewer shards or a smaller conv_k"
        )
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        zero = jnp.zeros((pad,) + local.shape[1:], local.dtype)
        return jnp.concatenate([zero, local, zero], axis=0)
    # my bottom rows -> next shard's top halo; my top rows -> previous
    # shard's bottom halo. Shards absent from a permutation's
    # destinations receive ZEROS (lax.ppermute semantics), which is
    # exactly the reference's zero padding at the global image border —
    # no edge-shard select needed.
    top_from_prev = jax.lax.ppermute(
        local[-pad:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    bot_from_next = jax.lax.ppermute(
        local[:pad], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([top_from_prev, local, bot_from_next], axis=0)


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
    from cudavideostream_tpu.ops.convolve import accumulate_q16

    k = weights_q16.shape[0]
    pad = k // 2
    img = local_frame.reshape(local_rows, width * 3).astype(jnp.int32)
    img = halo_exchange_rows(img, pad, axis_name)
    # horizontal zero padding is shard-local; the stencil itself is the
    # solo path's accumulate_q16 — one implementation, zero divergence
    img = jnp.pad(img, ((0, 0), (3 * pad, 3 * pad)))
    return accumulate_q16(img, weights_q16, local_rows, width)
