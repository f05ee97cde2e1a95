"""Pallas per-tile 256-bin histogram — the VMEM-resident variant of
``filters.value_histogram`` (the r4 VERDICT's one untried binarize
lead): gray pixels stream through VMEM tiles once and the 256 bin
counts accumulate in an SMEM output revisited across grid steps, so no
intermediate ever touches HBM.

Reference analogue: the shared-memory privatized histogram
(``kernels.cu:152-174`` ``generate_histogram_v2``) — per-block shared
counts merged at the end; here per-tile VMEM/SMEM counts accumulated
across the sequential grid (no atomics needed: TPU grids are serial).

Also exposes the VPU probe (:func:`vpu_probe`): the same 256-iteration
compare loop with a pure VREG accumulator and no cross-lane reduction
or scalar stores. The committed A/B (``benchmarks/binarize_pallas_ab``)
closes the r4 roofline question empirically:

* ``pallas_hist_unroll`` 0.325 ms vs the XLA compare-reduce's 0.468 on
  a materialized (M, 128) grid — statically-unrolled bins are the whole
  win (the dynamic-bin ``fori`` variant reads 1.92 ms: a live loop
  index forces a broadcast per compare; an immediate folds into it);
* the probe is NOT the floor it was designed to be (0.70 ms, unrolled
  0.70): keeping a full (tile, 128) int32 VREG accumulator live across
  256 adds spills past the register file, while the per-bin
  ``jnp.sum`` reduce retires each compare through the reduction tree —
  the "no reduction" formulation is the slower one on a 2D VPU;
* end-to-end the gap narrows to 0.486 -> 0.436 ms (``chain_*`` rows):
  XLA fused part of the compare-reduce into the gray extract, and the
  Pallas form pays one (M, 128) int32 round trip to HBM instead. The
  routed default (``filters.value_histogram`` on hardware) keeps the
  measured ~10% end-to-end win; binarize variant 1523 -> 1575 fps in
  the on-chip gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _tile(rows: int) -> int:
    best = 8
    for d in range(8, 513, 8):
        if rows % d == 0:
            best = d
    return best


def _hist_kernel(g_ref, out_ref, *, nbins: int, unroll: bool):
    i = pl.program_id(0)
    g = g_ref[:]

    @pl.when(i == 0)
    def _init():
        for b in range(nbins):
            out_ref[b, 0] = 0

    if unroll:
        for b in range(nbins):
            out_ref[b, 0] += jnp.sum((g == b).astype(jnp.int32))
    else:
        def body(b, _):
            out_ref[b, 0] += jnp.sum((g == b).astype(jnp.int32))
            return 0

        jax.lax.fori_loop(0, nbins, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def pallas_histogram(g2: jax.Array, interpret: bool = False,
                     unroll: bool = False) -> jax.Array:
    """(256,) int32 histogram of an (M, 128) int32 pixel grid with
    values in [0, 255]. Byte-exact vs ``filters.value_histogram``."""
    rows = g2.shape[0]
    tile = _tile(rows)
    grid = rows // tile
    (out,) = pl.pallas_call(
        functools.partial(_hist_kernel, nbins=256, unroll=unroll),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((256, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((256, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(g2.astype(jnp.int32))
    return out.reshape(256)


def _probe_kernel(g_ref, out_ref, *, nbins: int, unroll: bool):
    g = g_ref[:]

    if unroll:
        # static bin constants: each compare folds its operand, like
        # XLA's chunked broadcast — the fori version keeps b live in a
        # register and measured 1.6x slower (benchmarks/binarize_pallas_ab)
        acc = jnp.zeros_like(g)
        for b in range(nbins):
            acc = acc + (g == b).astype(jnp.int32)
    else:
        def body(b, acc):
            return acc + (g == b).astype(jnp.int32)

        acc = jax.lax.fori_loop(0, nbins, body, jnp.zeros_like(g))
    # one store per tile; the loop above is the measured region's work
    out_ref[pl.program_id(0), 0] = jnp.sum(acc)


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def vpu_probe(g2: jax.Array, interpret: bool = False,
              unroll: bool = False) -> jax.Array:
    """The intended compute floor of any compare-based 256-bin
    histogram: the identical 256 x (compare + add) per element, VREG
    accumulator only (no per-bin reduction, no scalar stores). Measured
    NOT to be the floor (module docstring): the live (tile, 128) int32
    accumulator spills, and :func:`pallas_histogram`'s per-bin reduce
    beats it 2x. Kept as the committed negative. Returns per-tile
    checksums (each == tile element count — every value matches exactly
    one bin), which double as a sanity check that nothing was optimized
    away."""
    rows = g2.shape[0]
    tile = _tile(rows)
    grid = rows // tile
    (out,) = pl.pallas_call(
        functools.partial(_probe_kernel, nbins=256, unroll=unroll),
        grid=(grid,),
        in_specs=[pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((grid, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((grid, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(g2.astype(jnp.int32))
    return out.reshape(grid)
