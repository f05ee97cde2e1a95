"""The ``register`` compaction scheme: diff + negative feedback + stream
compaction via row-loop register staging.

**Correctness cross-check only — NOT a peer performance scheme.** On
hardware the scalar row loop does not map to the VPU: 44.97 ms at 1080p
(``benchmarks/times_tpu_v5e``), ~270x the default ``element`` scheme.
Its value is as an *independently derived* third implementation of the
exact byte semantics, kept in-tree the way the reference keeps its
rejected experiments (SURVEY.md §4 leg 4); run it in interpret mode or
on small frames. The product path never selects it.

One of the three independently derived TPU compactions of ``kernel2``
(reference ``server/src/kernels.cu:289-334``); dispatched through
``logcompact.fused_diff_compact(scheme="register")`` and cross-checked
byte-exactly against the ``element`` and ``segment`` schemes and the CPU
oracle. The CUDA design — 1024 threads, ``long4`` chunks, a global
``atomicInc`` append — maps to TPU hardware as:

* one grid pass over ``(tile_rows, 128)`` uint8 tiles of the frame (the
  (8,128) VPU lane structure replaces ``long4`` vectorization);
* the diff/threshold/negative-feedback math as vectorized int ops on the
  whole tile;
* compaction *without atomics*: within each 128-lane row an inclusive
  cumsum (7-step Hillis-Steele scan — Mosaic has no cumsum primitive)
  assigns each masked byte its output slot (deterministic, ascending
  index order — the atomicInc nondeterminism is gone) and a one-hot
  reduction materializes the compacted vector. The lane rotation needed
  for tight packing is folded into the one-hot's target index, so packing
  costs zero extra passes;
* tight packing happens in *registers*: a (8,128) staging pair
  (vals, xs) is carried through the row loop and updated with masked
  selects — never a dynamically-indexed store, which Mosaic only allows
  at sublane multiples of 8 — and flushed to the output block at aligned
  8-row boundaries;
* each tile therefore emits a tile-locally compacted block plus a count,
  consumed by logcompact's shared flat/tiled epilogues.

Worst case (all 6.2M bytes changed) is fully supported: every tile block
can hold its entire tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
GROUP = 8  # staging rows; 8*128 = 1024 elements per flush


def _cumsum_lanes(x, lane):
    """Inclusive cumsum along the 128-lane axis of a (1, 128) int32 via a
    log2(128)-step Hillis-Steele scan. ``pltpu.roll`` is circular, so
    wrapped lanes are masked to zero."""
    acc = x
    s = 1
    while s < LANES:
        shifted = pltpu.roll(acc, s, 1)
        acc = acc + jnp.where(lane >= s, shifted, 0)
        s *= 2
    return acc


def _kernel(cur_ref, prev_ref, thr_ref, new_prev_ref, vals_ref, xs_ref, cnt_ref,
            *, tile_rows: int, negfeed: bool):
    i = pl.program_id(0)
    thr = thr_ref[0]

    cur = cur_ref[:].astype(jnp.int32)
    prev = prev_ref[:].astype(jnp.int32)
    mask = jnp.abs(cur - prev) > thr
    if negfeed:
        new_prev_ref[:] = jnp.where(mask, cur_ref[:], prev_ref[:])
    else:
        new_prev_ref[:] = cur_ref[:]

    # zero the compacted blocks; flushes below fill the valid prefix
    vals_ref[:] = jnp.zeros_like(vals_ref)
    xs_ref[:] = jnp.zeros_like(xs_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1)
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 0)
    slot_k = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    tile_base = i * tile_rows * LANES
    zeros8 = jnp.zeros((GROUP, LANES), jnp.int32)

    def group_body(g, carry):
        # dynamic reads must be 8-row aligned (Mosaic constraint), so load
        # one (8,128) group and unroll its rows statically
        gbase = pl.multiple_of(g * GROUP, GROUP)
        c8 = cur_ref[pl.ds(gbase, GROUP), :].astype(jnp.int32)
        p8 = prev_ref[pl.ds(gbase, GROUP), :].astype(jnp.int32)
        df8 = c8 - p8
        m8 = jnp.abs(df8) > thr

        def group_compact(carry):
            for j in range(GROUP):
                carry = row_body(g * GROUP + j, df8[j : j + 1, :],
                                 m8[j : j + 1, :], carry)
            return carry

        any_change = jnp.any(m8)
        return jax.lax.cond(any_change, group_compact, lambda c: c, carry)

    def row_body(r, df_row, m, carry):
        off, q, st_v, st_x = carry
        incl = _cumsum_lanes(m.astype(jnp.int32), lane)
        cnt = incl[0, LANES - 1]

        def compact_row(carry):
            off, q, st_v, st_x = carry
            phi = jax.lax.rem(off, GROUP * LANES)  # fill level of staging
            shift = jax.lax.rem(phi, LANES)
            # one-hot with the rotation folded in: masked element i lands
            # at lane (slot_i + shift) % 128 of the compacted vector
            tgt = jax.lax.rem(incl - 1 + shift, LANES)
            eq = (slot_k == tgt) & m
            v_row = jnp.bitwise_and(df_row, 255)  # uint8 wrap as int32
            g_row = (tile_base + r * LANES) + lane
            comp_v = jnp.sum(jnp.where(eq, v_row, 0), axis=1).reshape(1, LANES)
            comp_x = jnp.sum(jnp.where(eq, g_row, 0), axis=1).reshape(1, LANES)
            cv8 = jnp.broadcast_to(comp_v, (GROUP, LANES))
            cx8 = jnp.broadcast_to(comp_x, (GROUP, LANES))

            # staging positions: element k goes to pos (phi+k) mod 1024 ->
            # sublane pos//128 (mod GROUP handles wrap past a flush),
            # lane (phi+k)%128 == its lane in the rotated comp vector
            r0 = phi // LANES
            spill = shift + cnt - LANES  # elements past the first row
            # selector for "element of this row lands here":
            # row r0 (mod 8): lanes [shift, shift+cnt)
            # row r0+1 (mod 8): lanes [0, spill)
            # row r0+2.. can't happen (cnt <= 128)
            sel0 = (sub8 == jax.lax.rem(r0, GROUP)) & (lane8 >= shift) & (
                lane8 < shift + cnt
            )
            sel1 = (sub8 == jax.lax.rem(r0 + 1, GROUP)) & (lane8 < spill)

            crosses = phi + cnt >= GROUP * LANES

            def no_flush(args):
                q, st_v, st_x = args
                sel = sel0 | sel1
                return q, jnp.where(sel, cv8, st_v), jnp.where(sel, cx8, st_x)

            def with_flush(args):
                q, st_v, st_x = args
                # wrapped elements occupy positions < (phi+cnt)-1024: those
                # are exactly the sel1 lanes when r0 == GROUP-1 (the only
                # way to cross). Write pre-wrap part, flush, start fresh.
                st_v = jnp.where(sel0, cv8, st_v)
                st_x = jnp.where(sel0, cx8, st_x)
                base = pl.multiple_of(q * GROUP, GROUP)
                vals_ref[pl.ds(base, GROUP), :] = st_v.astype(jnp.uint8)
                xs_ref[pl.ds(base, GROUP), :] = st_x
                st_v = jnp.where(sel1, cv8, zeros8)
                st_x = jnp.where(sel1, cx8, zeros8)
                return q + 1, st_v, st_x

            q, st_v, st_x = jax.lax.cond(
                crosses, with_flush, no_flush, (q, st_v, st_x)
            )
            return off + cnt, q, st_v, st_x

        return jax.lax.cond(
            cnt > 0, compact_row, lambda c: c, (off, q, st_v, st_x)
        )

    off, q, st_v, st_x = jax.lax.fori_loop(
        0, tile_rows // GROUP, group_body, (jnp.int32(0), jnp.int32(0), zeros8, zeros8)
    )

    # final partial flush (skip when staging is empty)
    @pl.when(jax.lax.rem(off, GROUP * LANES) > 0)
    def _():
        base = pl.multiple_of(q * GROUP, GROUP)
        vals_ref[pl.ds(base, GROUP), :] = st_v.astype(jnp.uint8)
        xs_ref[pl.ds(base, GROUP), :] = st_x

    cnt_ref[i, 0] = off


def run_register(cur2, prev2, thr, *, tile_rows: int, grid: int,
                 negfeed: bool, interpret: bool):
    """Run the register-staging kernel over ``(rows, 128)`` inputs.

    Returns ``(new_prev, xs_t, vals_t, counts)`` in the tile-block layout
    shared with logcompact's other schemes. ``tile_rows`` must be a
    multiple of :data:`GROUP` (logcompact's padding guarantees it).
    """
    rows = cur2.shape[0]
    if tile_rows % GROUP:
        raise ValueError(f"tile_rows {tile_rows} must be a multiple of {GROUP}")
    kernel = functools.partial(_kernel, tile_rows=tile_rows, negfeed=negfeed)
    new_prev, vals_t, xs_t, counts = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((grid, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((grid, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(cur2, prev2, thr)
    return new_prev, xs_t, vals_t, counts
