"""Deterministic stream compaction: ``(mask, vals) -> (pos, xs, vals)``.

The reference compacts with a global ``atomicInc`` append
(``kernels.cu:313-315``), which is racy-by-design and yields a
nondeterministic payload order. TPUs have no global atomics — and don't
need them: compaction is re-expressed as data-parallel primitives, and the
output order becomes ascending byte index (deterministic, wire-compatible:
the client is a pure scatter-add, ``client/opencv.cpp:64-66``).

Backends:

* :func:`compact_sort` — single ``lax.sort`` over packed ``(index, value)``
  keys. Simple, always available; O(n log n).
* :func:`compact_padded` — per-row prefix-sum compaction into a padded
  ``(rows, row_len)`` layout plus row counts; paired with
  :func:`flatten_padded` (gather) to produce the flat payload, or consumed
  directly by the host/C packer. This is the prefix-sum formulation of
  SURVEY.md §7 and the basis of the Pallas kernel.

All outputs are fixed-shape (XLA requirement): arrays have ``capacity``
entries, the first ``pos`` of which are valid; entries past ``pos`` are
zero.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array

# Packed-key limit: idx*256 + val must stay below int32 PAD.
_PAD = jnp.int32(2**31 - 1)
_MAX_PACKED_ELEMS = (2**31 - 1 - 255) // 256  # 8_388_607 bytes; 1080p is 6_220_800


def compact_sort(mask: Array, vals: Array, capacity: int) -> Tuple[Array, Array, Array]:
    """Sort-based compaction.

    Packs ``(byte_index, value)`` into one int32 key (``idx*256 + val``),
    sorts masked keys to the front, unpacks the first ``capacity``.

    Returns ``(pos, xs, vals_out)``: ``pos`` int32 scalar (true count, may
    exceed ``capacity`` — caller must check for overflow), ``xs`` int32
    ``(capacity,)``, ``vals_out`` uint8 ``(capacity,)``.
    """
    n = mask.shape[0]
    if n > _MAX_PACKED_ELEMS:
        raise ValueError(
            f"frame of {n} bytes exceeds packed-key compaction limit "
            f"{_MAX_PACKED_ELEMS}; use compact_padded"
        )
    pos = jnp.sum(mask, dtype=jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    key = jnp.where(mask, idx * 256 + vals.astype(jnp.int32), _PAD)
    skey = jax.lax.sort(key)[:capacity]
    valid = skey != _PAD
    xs = jnp.where(valid, skey >> 8, 0)
    vals_out = jnp.where(valid, skey & 255, 0).astype(jnp.uint8)
    return pos, xs, vals_out


def compact_padded(
    mask: Array, vals: Array, row_len: int = 1024
) -> Tuple[Array, Array, Array, Array]:
    """Row-wise prefix-sum compaction into a padded layout.

    Reshapes the flat frame into ``(rows, row_len)`` and compacts each row
    independently: within a row, element ``i`` with ``mask[i]`` lands at
    slot ``cumsum(mask)[i]-1``. Cross-row placement is carried by
    ``row_counts`` / ``row_offsets``.

    Returns ``(pos, xs_pad, vals_pad, row_counts)`` where ``xs_pad`` /
    ``vals_pad`` are ``(rows, row_len)`` with each row's valid prefix of
    length ``row_counts[row]`` holding global byte indices / values in
    ascending order (the rest zero).
    """
    n = mask.shape[0]
    if n % row_len:
        raise ValueError(f"frame bytes {n} not divisible by row_len {row_len}")
    rows = n // row_len
    m = mask.reshape(rows, row_len)
    v = vals.reshape(rows, row_len).astype(jnp.int32)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (rows, row_len), 0) * row_len + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, row_len), 1)
    )
    incl = jnp.cumsum(m.astype(jnp.int32), axis=1)
    row_counts = incl[:, -1]
    pos = jnp.sum(row_counts, dtype=jnp.int32)
    # scatter-free "sort within row" trick: masked elements key to their
    # target slot (incl - 1, unique within a row), unmasked elements to
    # large keys past row_len — a per-row stable sort by key then places
    # masked elements first, in ascending index order
    key = jnp.where(m, incl - 1, row_len + gidx % row_len)  # masked -> slot, else big
    # sort each row by key, carrying (gidx, v): masked elements come first
    # in slot order (slots are unique within a row), unmasked after.
    _, xs_pad, vals_pad = jax.lax.sort((key, gidx, v), dimension=1, num_keys=1)
    valid = jax.lax.broadcasted_iota(jnp.int32, (rows, row_len), 1) < row_counts[:, None]
    xs_pad = jnp.where(valid, xs_pad, 0)
    vals_pad = jnp.where(valid, vals_pad, 0).astype(jnp.uint8)
    return pos, xs_pad, vals_pad, row_counts


def flatten_padded(
    xs_pad: Array, vals_pad: Array, row_counts: Array, capacity: int
) -> Tuple[Array, Array]:
    """Gather the padded rows into flat ``(capacity,)`` payload arrays.

    For output position ``p``: find the row via searchsorted over the row
    offsets, then the slot within the row. Cost is one small binary search
    plus one gather per output element.
    """
    rows, row_len = xs_pad.shape
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(row_counts, dtype=jnp.int32)]
    )
    p = jax.lax.broadcasted_iota(jnp.int32, (capacity,), 0)
    row = jnp.searchsorted(offsets, p, side="right").astype(jnp.int32) - 1
    row = jnp.clip(row, 0, rows - 1)
    slot = p - offsets[row]
    valid = p < offsets[-1]
    flat_idx = row * row_len + jnp.clip(slot, 0, row_len - 1)
    xs = jnp.where(valid, xs_pad.reshape(-1)[flat_idx], 0)
    vals = jnp.where(valid, vals_pad.reshape(-1)[flat_idx], 0).astype(jnp.uint8)
    return xs, vals


def compact(
    mask: Array, vals: Array, capacity: int, backend: str = "sort", row_len: int = 1024
) -> Tuple[Array, Array, Array]:
    """Dispatch over compaction backends; uniform ``(pos, xs, vals)`` out."""
    if backend == "sort":
        return compact_sort(mask, vals, capacity)
    if backend == "padded":
        pos, xs_pad, vals_pad, row_counts = compact_padded(mask, vals, row_len)
        xs, v = flatten_padded(xs_pad, vals_pad, row_counts, capacity)
        return pos, xs, v
    raise ValueError(f"unknown compaction backend {backend!r}")
