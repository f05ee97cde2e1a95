"""Branch-free Pallas TPU stream compaction.

The TPU-native ``kernel2`` (reference ``server/src/kernels.cu:289-334``),
designed for how a TPU actually executes: zero scalar control flow, no
atomics, no gathers.

Three schemes, all byte-exact against the oracle and each other:

**element (default)** — per-element LSB-first bit-serial shifting. Every
masked slot holds a packed payload ``holes*256 + delta`` in one int32
(holes < unit bytes; for the swept default tiles that is 512*128 so
packed <= 2^24 - 1, and for the huge-tile geometry past ~131 MB frames
units reach ``ceil(2^31/128/MAX_GRID)*128`` bytes so packed stays below
~2^28 — comfortably int32 either way; empty slots hold 0, which no
valid payload equals because delta 0 never ships) and must move
left by its hole count ``holes_i = flat_i - (incl_i - 1)``; the original
index is recovered at the end as ``final_position + holes``. Holes are
nondecreasing along the frame, so shifting one gap-bit at a time,
LSB-first, can never land an element on a staying one: a collision at
bit b would need ``holes_j < holes_i`` for ``j > i`` (write out
``p_j - 2^b = p_i`` with ``p = orig - (holes mod 2^b)`` and bit b set on
j but not i — it forces the higher bits of ``holes_j`` below those of
``holes_i``). Hence ~log2(tile) ≈ 16 dense roll+select passes. The bit
ORDER is essential: MSB-first collides (see
tests/test_negative_examples.py).

**segment** — bit-serial segment merging: for ``W = 1,2,4,...`` the right
sibling's compacted prefix slides left by ``gap = W - c_L`` over the left
sibling's holes, with spans computed in closed form from cumsum values at
segment boundaries; ~sum-of-bits ≈ 136 passes. Kept as an independently
derived cross-check.

**register** — row-loop register staging (:mod:`.pallas_compact`): a
one-hot reduction packs each 128-lane row, a carried (8,128) staging
block absorbs rows and flushes at aligned boundaries. A third
independently derived scheme, **correctness-only** (44.97 ms at 1080p
on hardware — the scalar row loop does not map to the VPU; use it in
interpret mode or on small frames); the three cross-check each other.

Output order is ascending byte index (deterministic; the reference's
``atomicInc`` order is nondeterministic, and the client is a pure
scatter-add so both decode identically — ``client/opencv.cpp:64-66``).
Each grid tile emits a tile-locally compacted ``(xs, vals)`` block plus a
count. Two epilogues:

* ``emit="flat"`` — XLA epilogue (exclusive cumsum over tile counts +
  ascending ``dynamic_update_slice``) concatenates tile prefixes into the
  flat ``(pos, xs, vals)`` payload, preserving the zero-padding invariant
  past ``pos``.
* ``emit="tiled"`` — no merge at all: the per-tile blocks and counts go
  straight to the host, whose scatter-gather sender
  (``native/csrc/cvstpu.c:wire_send_segments``) assembles the wire bytes
  inside one ``writev`` iovec list for free. This skips the only
  dynamic-offset stage in the whole pipeline.

Frames of any byte length below 2^31 are supported: inputs are padded
internally with ``cur == prev`` bytes (which can never ship) up to a
lane-aligned size with a well-shaped tile divisor. Worst case (all 6.2M
bytes changed) is fully supported.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Pallas grid bound. For the segment/register schemes per-tile counts
# are a (grid, 1) SMEM output window padded to ~512 B per grid step, so
# past ~2000 steps it exceeds SMEM. The element scheme's counts ride a
# per-tile VMEM column instead (no SMEM window), but the bound is kept
# uniform: per-step DMA setup makes >2000-step grids a losing geometry
# anyway, and one bound keeps the huge-frame tile geometry scheme-
# agnostic.
MAX_GRID = 2000


def _pick_tile_rows(rows: int, target: int = 512) -> int:
    """Largest divisor of ``rows`` <= target that is a multiple of 8.

    Target 512: the dense tile sweep (benchmarks/times_tiles_dense)
    shows a 392-512-row plateau ~10-15% faster than the 360-row divisor
    of 1080p's natural 48600 rows, so ``_pad_rows`` pads until a tile in
    [400, 512] exists rather than settling for a small divisor.
    """
    best = None
    for d in range(8, target + 1, 8):
        if rows % d == 0:
            best = d
    return best if best is not None else rows


def _pad_rows(rows: int) -> int:
    """Smallest padded row count >= ``rows`` that is a multiple of 8 and
    admits a tile divisor of at least min(rows, 400) rows (so oddly-sized
    inputs — per-shard slices, odd frame sizes, and 1080p itself — land
    on the swept 400-512-row optimum instead of a degenerate small
    divisor). Terminates: every multiple of 400 has the divisor 400.
    Padding is cur == prev bytes (never ship); worst observed waste is a
    few hundred rows, trivial against the tile-size win."""
    pr = (rows + 7) // 8 * 8
    while _pick_tile_rows(pr) < min(pr, 400):
        pr += 8
    return pr


def _tile_geometry(rows: int) -> Tuple[int, int]:
    """(padded_rows, tile_rows) honoring the swept 400-512-row optimum
    AND the ~2000-step grid bound (the SMEM counts window).

    Past ~131 MB of frame (rows/512 > MAX_GRID) the preferred tile would
    overflow the grid, so the tile grows to ``ceil(rows / MAX_GRID)``
    instead — the "any byte length below 2^31" contract holds all the
    way up (a 2 GiB frame runs 2000 tiles of ~8400 rows; past the swept
    range, but the kernel is tile-size-agnostic and the sweep shows only
    a gentle slope there)."""
    pr = _pad_rows(rows)
    t = _pick_tile_rows(pr)
    if pr // t > MAX_GRID:
        t = (-(-rows // MAX_GRID) + 7) // 8 * 8
        pr = -(-rows // t) * t
    return pr, t


def _tile_geometry_mask(rows: int) -> Tuple[int, int]:
    """``_tile_geometry`` for the bitmask-only emit (``emit="mask"``):
    ``tile_rows`` must be a multiple of 64 so the packed-bits output
    block ``(tile_rows // 8, LANES)`` meets Mosaic's 8-sublane block
    divisibility (the generic 1080p geometry is 48608 rows x 496-row
    tiles — a (62, 128) bits block that fails to lower on hardware;
    this one is 48640 x 512, i.e. 40 extra padded rows = 5 KB of
    cur==prev padding, still inside the swept 400-512 tile optimum).
    Terminates: every multiple of 448 rows has the divisor 448."""
    pr = -(-rows // 64) * 64
    if pr <= 512:
        return pr, pr
    while True:
        best = None
        for d in range(64, 513, 64):
            if pr % d == 0:
                best = d
        if best is not None and best >= 384:
            break
        pr += 64
    if pr // best > MAX_GRID:
        t = (-(-rows // MAX_GRID) + 63) // 64 * 64
        pr = -(-rows // t) * t
        return pr, t
    return pr, best


def _flat_roll_left(x, s: int, rows: int):
    """out[f] = x[f + s] on the row-major flattened (rows, 128) array,
    circular (callers mask wrapped reads via span guards)."""
    sl, sr = s % LANES, s // LANES
    if sl == 0:
        return pltpu.roll(x, (-sr) % rows, 0) if sr else x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    r = pltpu.roll(x, (-sl) % LANES, 1)  # lane l <- lane (l+sl) % 128
    same = pltpu.roll(r, (-sr) % rows, 0) if sr else r
    nxt = pltpu.roll(r, (-(sr + 1)) % rows, 0)
    return jnp.where(lane < LANES - sl, same, nxt)


def _flat_roll_right(x, s: int, rows: int):
    """out[f] = x[f - s], circular."""
    sl, sr = s % LANES, s // LANES
    if sl == 0:
        return pltpu.roll(x, sr % rows, 0) if sr else x
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    r = pltpu.roll(x, sl, 1)  # lane l <- lane (l-sl) % 128
    same = pltpu.roll(r, sr % rows, 0) if sr else r
    prv = pltpu.roll(r, (sr + 1) % rows, 0)
    return jnp.where(lane >= sl, same, prv)


def _mxu_incl_prefix(mi, R: int, sub_rows: int = 0):
    """Inclusive flat prefix-sum of a 0/1 mask ``mi`` of shape
    ``(R, LANES)`` — the shared cumsum of the compaction kernels
    (``_kernel_v2`` and ``_kernel_pair``; one implementation so the
    VMEM-cutoff and precision arguments can't drift between them).

    Flat inclusive cumsum on the MXU: prefix-sum IS a triangular
    matmul. Lane phase: incl = mi @ U with U[j,l] = (j <= l);
    row phase: rowpre = T @ rowtot with T[r,q] = (q <= r).
    Exactness at DEFAULT matmul precision (which truncates inputs
    to bf16 on TPU — the trap in CLAUDE.md): every INPUT here is
    an integer <= 128 (0/1 matrices; per-row totals of 128 lanes),
    all bf16-representable, and the f32 accumulator is exact far
    beyond the R*128 <= 65536 maximum — the on-chip oracle gate
    (bench.py) pins this. Replaces 7 lane + 9 sublane
    roll+add+select passes with two tiny matmuls.

    ``sub_rows``: prefix resets every ``sub_rows`` rows (sub-tiled
    units). 1 = pure lane compaction (the lane matmul IS the whole
    cumsum). The (R, R) row-phase matmul is only built for R <= 512 —
    the hardware-validated tile range; a 512 < R tile (frames past
    ~131 MB) would put a 4+ MB (R, R) f32 matrix plus several
    (R, 128) temporaries in VMEM, a configuration only ever exercised
    in interpret mode, where a hardware VMEM overflow could hide.
    Those huge-tile geometries take the Hillis-Steele roll fallback
    (lane phase stays on the MXU; f32 exactness holds to 2^24 > the
    largest supported tile's byte count, 2 GiB / MAX_GRID).
    """
    mi_f = mi.astype(jnp.float32)
    lane_u = (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    ).astype(jnp.float32)
    incl_f = jnp.dot(mi_f, lane_u)
    if sub_rows == 1:
        # each row is its own unit: no row phase at all
        return incl_f.astype(jnp.int32)
    rowtot_f = jnp.broadcast_to(incl_f[:, LANES - 1 : LANES], (R, LANES))
    if sub_rows:
        if R > 512:  # callers gate sub-tiling to the validated range
            raise ValueError("sub_rows requires tile_rows <= 512")
        # sub-tiled: the row-phase prefix resets at sub-tile
        # boundaries — the triangular matrix goes block-diagonal
        # (same matmul shape/cost as the full-tile prefix)
        rq = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        cq = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        row_t = (
            (cq <= rq) & (cq // sub_rows == rq // sub_rows)
        ).astype(jnp.float32)
        rowpre_f = jnp.dot(row_t, rowtot_f)
        return (incl_f + (rowpre_f - rowtot_f)).astype(jnp.int32)
    if R <= 512:
        row_t = (
            jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        ).astype(jnp.float32)
        rowpre_f = jnp.dot(row_t, rowtot_f)
        return (incl_f + (rowpre_f - rowtot_f)).astype(jnp.int32)
    # huge-tile roll fallback (see docstring)
    incl = incl_f.astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    rowtot = jnp.broadcast_to(incl[:, LANES - 1 : LANES], (R, LANES))
    rowpre = rowtot
    s = 1
    while s < R:
        rowpre = rowpre + jnp.where(sub >= s, pltpu.roll(rowpre, s, 0), 0)
        s *= 2
    return incl + (rowpre - rowtot)


def _pack_bits_block(mi, sub, lane, R: int):
    """Pack a tile's ``(R, LANES)`` 0/1 mask into the canonical LSB-first
    change-bitmask as an ``(R/8, LANES)`` uint8 block — the in-kernel
    half of the bitmask-only emission (``emit="mask"``).

    Layout proof: the canonical flat bitmask has bit ``f % 8`` of byte
    ``f // 8`` = mask of flat index ``f`` (``ops.diff.pack_bitmask``).
    Within a tile, flat ``f = r*128 + l`` so byte ``j = f // 8`` maps to
    row ``r = j // 16`` and lane chunk ``c = j % 16`` (lanes
    ``8c..8c+7``). An ``(R/8, 128)`` uint8 block read row-major gives
    byte ``j = g*128 + l``, i.e. ``out[g, l]`` must hold the packed byte
    of input row ``8g + l//16``, chunk ``l % 16`` — then the blocks'
    row-major concatenation across the grid IS the flat ``n_pad/8``-byte
    bitmask, no host reshuffle at all.

    Both steps ride the MXU (exact at DEFAULT precision: every input is
    an integer <= 255, bf16-representable; f32 accumulation of <= 8
    power-of-two terms is exact):

    * ``spread = mi @ P2`` with ``P2[l', l] = (l'//8 == l%16) *
      2^(l'%8)`` — each row's 16 packed bytes, replicated 8x along
      lanes so the regroup matmul can select per-chunk;
    * zero all but chunk ``r % 8`` of each row, then ``A @ z`` with
      ``A[g, r] = (r//8 == g)`` — sublane regrouping as a matmul (a
      (R,16)->(R/8,128) minor-dim reshape does not lower in Mosaic; a
      stride-8 sublane slice is equally unsupported).
    """
    lp = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lc = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    p2 = jnp.where(
        lp // 8 == lc % 16, jnp.left_shift(1, lp % 8), 0
    ).astype(jnp.float32)
    spread = jnp.dot(mi.astype(jnp.float32), p2,
                     preferred_element_type=jnp.float32)
    z = jnp.where(lane // 16 == sub % 8, spread, 0.0)
    gi = jax.lax.broadcasted_iota(jnp.int32, (R // 8, R), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (R // 8, R), 1)
    a = (gr // 8 == gi).astype(jnp.float32)
    packed = jnp.dot(a, z, preferred_element_type=jnp.float32)
    # Mosaic has no f32->u8 cast; hop through int32 (values are exact
    # integers <= 255 by construction)
    return packed.astype(jnp.int32).astype(jnp.uint8)


def _kernel_v2(cur_ref, prev_ref, thr_ref, *rest,
               tile_rows: int, negfeed: bool, region_tiles: int = 0,
               thr_is_map: bool = False, skip_static: bool = True,
               stream_tiles: int = 0, sub_rows: int = 0,
               pack16: bool = False, pair: bool = False,
               has_offset: bool = False, emit_xs: bool = True,
               emit_bits: bool = False):
    """Per-element LSB-first shift compaction — ~16 dense passes.

    Each masked element must move left by its hole count
    ``holes_i = flat_i - (incl_i - 1)``; holes is nondecreasing along the
    tile. Processing the gap bits LSB-first, a lane-level collision at
    bit b (an element arriving on a staying element) would require
    ``holes_j < holes_i`` for some ``j > i`` — impossible — so each step
    is a plain roll + select with no carried occupancy state
    (tests/test_negative_examples.py pins the bit-order argument; an
    exhaustive lane-level simulation to n=11 and the byte-exact oracle
    tests at all densities pin the result).

    Empty lanes hold 0, which is unambiguous because a valid packed
    payload ``holes*256 + delta`` is never 0 (delta 0 never ships).
    Packing the shift distance WITH the value means each pass rolls a
    single int32 array; the element's index costs no bits (it is
    ``final_position + holes``).

    When ``region_tiles > 0``, an extra overlay-region input follows the
    threshold ref: tiles below ``region_tiles`` read the current frame
    from it instead (the text strip pre-blended by XLA over a tiny
    prefix), folding the overlay into this kernel's existing frame read
    at zero marginal HBM cost — the reference pays one kernel2_char
    launch per character (``kernels.cu:466-476``).

    ``sub_rows > 0`` — SUB-TILED compaction: the block compacts as
    ``tile_rows // sub_rows`` independent sub-tiles of ``sub_rows``
    rows, emitting one count per sub-tile. The DMA/grid geometry is
    untouched (same blocks, same pipelining), but the hole range drops
    to ``sub_rows * 128``, so the pass loop shrinks from
    ``log2(tile_rows*128)`` (~16) to ``log2(sub_rows*128)`` (7 at
    sub_rows=1, the product default, where the row phase vanishes and
    each pass is one circular lane roll) — the shift passes are most of
    the kernel (benchmarks/stage_breakdown_tpu_v5e), and every pass is a full
    (tile_rows, 128) pass regardless of sub-tiling, so fewer passes is
    a direct win. The wire bytes are IDENTICAL: the host's
    scatter-gather sender concatenates per-sub-tile prefixes exactly as
    it concatenates per-tile prefixes (ascending order is preserved at
    both levels). The trade is more counts (host nonzero scan, iovec
    entries — both trivial) and a slower device-side merge_tiles for
    the "flat" landing (the density-adaptive lander measures and avoids
    it). See benchmarks/subtile_ab for the measured sweep.
    """
    rest = list(rest)
    reg_ref = rest.pop(0) if region_tiles else None
    # SMEM scalar added to every emitted (valid) byte index — lets a
    # shard_map'd caller emit GLOBAL frame indices from a per-shard
    # kernel launch (the shard base sidx*Ln is a traced value, so it
    # rides as an operand, exactly like the scalar threshold)
    off_ref = rest.pop(0) if has_offset else None
    new_prev_ref = rest.pop(0)
    xs_ref = rest.pop(0) if emit_xs else None
    vals_ref, cnt_ref = rest.pop(0), rest.pop(0)
    bits_ref = rest.pop(0) if emit_bits else None
    i = pl.program_id(0)
    # batched (super-frame) mode: B streams concatenated along the tile
    # axis, `stream_tiles` tiles each. Emitted byte indices are rebased
    # to the tile's own stream (static arithmetic on the grid index), so
    # per-stream payloads fall out of per-stream tile ranges with no
    # second pass; the overlay region likewise applies to each stream's
    # leading tiles, not just the first stream's.
    i_s = i % stream_tiles if stream_tiles else i
    # per-region sensitivity: thr is a per-byte uint8 map block when the
    # caller configured one (beyond the reference's global #define)
    thr = thr_ref[:].astype(jnp.int32) if thr_is_map else thr_ref[0]
    R = tile_rows
    n_flat = R * LANES

    cur_u8 = cur_ref[:]
    if region_tiles:
        cur_u8 = jnp.where(i_s < region_tiles, reg_ref[:], cur_u8)
    cur = cur_u8.astype(jnp.int32)
    prev = prev_ref[:].astype(jnp.int32)
    df = cur - prev
    m = jnp.abs(df) > thr
    if negfeed:
        new_prev_ref[:] = jnp.where(m, cur_u8, prev_ref[:])
    else:
        new_prev_ref[:] = cur_u8

    # Static-region fast path: a tile with no changed byte skips the
    # cumsum and every shift pass — real scenes concentrate change, so
    # most tiles of a mostly-static frame cost one elementwise pass.
    # (The reference's kernel2 always runs its full body.)
    def _compact():
        mi = m.astype(jnp.int32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        flat = sub * LANES + lane

        # MXU cumsum (shared with _kernel_pair): see _mxu_incl_prefix
        # for the precision argument and the huge-tile VMEM cutoff. At
        # sub_rows == 1 there is no row phase at all (and below, every
        # shift pass is a single lane roll).
        incl = _mxu_incl_prefix(mi, R, sub_rows)

        # Pack ``holes*256 + delta`` into ONE int32 (holes < unit bytes:
        # 2^16 for the swept <=512-row tiles, up to ~2^20 for the
        # huge-tile geometry past ~131 MB frames — packed stays below
        # ~2^28 < 2^31 in every supported case): the shift distance
        # rides with the value, so each pass rolls a single array — half
        # the vector work of carrying (payload, holes) side by side. The
        # original index needs no bits at all: an element that started
        # at flat index f lands at f - holes, so at the end
        # ``orig = final_position + holes`` recovers it exactly.
        # local flat index within the compaction unit (sub-tile or tile)
        n_unit = sub_rows * LANES if sub_rows else n_flat
        local = (sub % sub_rows) * LANES + lane if sub_rows else flat
        holes = jnp.where(m, local - (incl - 1), 0)
        x = jnp.where(m, holes * 256 + jnp.bitwise_and(df, 255), 0)
        # At sub_rows == 1 the unit is one 128-lane row, so holes < 128
        # and the packed value fits 15 bits: the shift passes run in
        # int16, processing two values per 32-bit VPU lane. (The ROADMAP
        # int16 rejection covers the row phase, where holes reach 2^16+
        # — at pure lane granularity there is no row phase.) HARDWARE
        # NEGATIVE: Mosaic cannot lower a lane rotate on 16-bit data
        # ("not implemented: Rotate with non-32-bit data",
        # benchmarks/pack16_ab) — pack16 runs only in interpret mode,
        # kept as the exactness pin for the packing arithmetic. The
        # hardware realization of the same idea is ``pair`` below.
        if pack16:
            x = x.astype(jnp.int16)

        if pair:
            # PAIR-PACKED lane compaction (sub_rows == 1 only): the
            # 15-bit units of rows r and r + R/2 share one int32 lane
            # (lo/hi 16 bits), so the 7 roll+select passes — the entire
            # remaining compaction cost — run over an (R/2, 128) array:
            # half the roll traffic, still 32-bit rotates (the only
            # width Mosaic implements). Each row is an independent unit,
            # so ANY row pairing is valid; top/bottom halves keep both
            # slices contiguous and 8-sublane-aligned (R % 16 == 0,
            # gated by the caller). The per-half take/keep masks are
            # built arithmetically: t = (v >> (8+k)) & 0x00010001 picks
            # hole-bit k of both halves, and (t << 16) - t maps each
            # half's bit to a full 0xFFFF half-mask (0x00000001 ->
            # 0x0000FFFF, 0x00010000 -> 0xFFFF0000, 0x00010001 -> -1).
            # The wrap guard (src lane >= 128 - b never takes) depends
            # only on the lane, identical for both halves. Packed
            # values stay nonnegative (hi <= 0x7FFF), so the arithmetic
            # >> never smears a sign bit.
            H = R // 2
            xp = jnp.bitwise_or(x[:H], x[H:] << 16)
            # fresh iota, NOT lane[:H]: a lane-axis broadcasted_iota is
            # stored sublane-replicated (physical sublane dim 1), and
            # Mosaic's vector_extract_strided_slice_rule aborts slicing
            # it to H rows ("Check failed: limits[i] <= dim(i) (31 vs.
            # 1)", benchmarks/pair_ab) — x itself slices fine
            lane_h = jax.lax.broadcasted_iota(jnp.int32, (H, LANES), 1)
            b, k = 1, 0
            while b < LANES:
                rx = pltpu.roll(xp, (-b) % LANES, 1)
                tt = jnp.bitwise_and(rx >> (8 + k), 0x00010001)
                m_take = jnp.where(lane_h < LANES - b, (tt << 16) - tt, 0)
                tk = jnp.bitwise_and(xp >> (8 + k), 0x00010001)
                m_keep = (tk << 16) - tk
                xp = jnp.bitwise_or(
                    jnp.bitwise_and(rx, m_take),
                    jnp.bitwise_and(
                        xp, jnp.bitwise_not(jnp.bitwise_or(m_take, m_keep))
                    ),
                )
                b, k = b * 2, k + 1
            x = jnp.concatenate(
                [jnp.bitwise_and(xp, 0xFFFF), xp >> 16], axis=0
            )

        # (A rejected variant gated each pass on ``max(holes) >= b`` via
        # a VMEM scratch + pl.when so dense-prefix tiles skip passes; the
        # measured A/B — benchmarks/pass_gate_ab — shows it costs the
        # adversarial uniform scene ~30% and buys realistic scenes ~1%,
        # because the tile-level static skip already covers them.)
        b = 1
        while not pair and b < n_unit:
            # sub_rows == 1: movement never crosses a row, so the shift
            # is a single circular lane roll (the generic flat roll pays
            # two extra rolls + a select to stitch row crossings that
            # src_ok would discard anyway)
            rx = (
                pltpu.roll(x, (-b) % LANES, 1)
                if sub_rows == 1
                else _flat_roll_left(x, b, R)
            )
            # static pattern: no wrap-in across the unit boundary (the
            # array end for full tiles, every sub-tile edge otherwise)
            src_ok = local + b < n_unit
            # occupancy tests are free: empty slots are exactly 0, so
            # "hole-bit b set" already implies the slot is occupied
            # (for the keep branch, an empty x passes 0 through either
            # way) — no separate != 0 compares needed
            take = src_ok & (jnp.bitwise_and(rx, b * 256) != 0)
            x = jnp.where(
                take, rx,
                jnp.where(jnp.bitwise_and(x, b * 256) == 0, x, 0),
            )
            b *= 2

        # unpack in-kernel, re-globalizing indices (a hole is exactly
        # x == 0 — a valid element with holes == 0 still has a nonzero
        # delta byte — so padding lanes stay 0): the caller never
        # touches the packed form, no unpack pass over HBM is needed.
        # orig = final + holes holds at any granularity: movement stays
        # inside the unit, and holes are unit-local.
        xi = x.astype(jnp.int32) if pack16 else x
        if emit_xs:
            base = i_s * n_flat + (off_ref[0] if has_offset else 0)
            xs_ref[:] = jnp.where(xi != 0, flat + (xi >> 8) + base, 0)
        vals_ref[:] = jnp.bitwise_and(xi, 255).astype(jnp.uint8)
        if emit_bits:
            bits_ref[:] = _pack_bits_block(mi, sub, lane, R)
        # counts ride a (R, 1) VMEM column — one vector store per tile
        # instead of tile_rows/sub_rows scalar SMEM extract+writes (the
        # measured cost that made fine sub-tilings regress,
        # benchmarks/subtile_ab). Row r holds the unit-LOCAL inclusive
        # count at its lane end; the caller slices each unit's last row.
        cnt_ref[:] = incl[:, LANES - 1 : LANES]

    if not skip_static:
        _compact()
    else:
        any_change = jnp.any(m)
        pl.when(any_change)(_compact)

        @pl.when(jnp.logical_not(any_change))
        def _static():
            if emit_xs:
                xs_ref[:] = jnp.zeros((R, LANES), jnp.int32)
            vals_ref[:] = jnp.zeros((R, LANES), jnp.uint8)
            cnt_ref[:] = jnp.zeros((R, 1), jnp.int32)
            if emit_bits:
                bits_ref[:] = jnp.zeros((R // 8, LANES), jnp.uint8)


def _kernel(cur_ref, prev_ref, thr_ref, *rest,
            tile_rows: int, negfeed: bool, region_tiles: int = 0,
            thr_is_map: bool = False, stream_tiles: int = 0):
    if region_tiles:
        reg_ref, new_prev_ref, xs_ref, vals_ref, cnt_ref = rest
    else:
        new_prev_ref, xs_ref, vals_ref, cnt_ref = rest
    i = pl.program_id(0)
    i_s = i % stream_tiles if stream_tiles else i  # see _kernel_v2
    thr = thr_ref[:].astype(jnp.int32) if thr_is_map else thr_ref[0]
    R = tile_rows
    n_flat = R * LANES

    cur_u8 = cur_ref[:]
    if region_tiles:
        cur_u8 = jnp.where(i_s < region_tiles, reg_ref[:], cur_u8)
    cur = cur_u8.astype(jnp.int32)
    prev = prev_ref[:].astype(jnp.int32)
    df = cur - prev
    m = jnp.abs(df) > thr
    if negfeed:
        new_prev_ref[:] = jnp.where(m, cur_u8, prev_ref[:])
    else:
        new_prev_ref[:] = cur_u8

    mi = m.astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = sub * LANES + lane

    # packed TILE-LOCAL payload (see _kernel_v2); holes are 0 and stay 0
    x = jnp.where(m, flat * 256 + jnp.bitwise_and(df, 255), 0)

    # flat inclusive cumsum: lane-phase Hillis-Steele + row-prefix add
    incl = mi
    s = 1
    while s < LANES:
        incl = incl + jnp.where(lane >= s, pltpu.roll(incl, s, 1), 0)
        s *= 2
    rowtot = jnp.broadcast_to(incl[:, LANES - 1 : LANES], (R, LANES))
    rowpre = rowtot
    s = 1
    while s < R:
        rowpre = rowpre + jnp.where(sub >= s, pltpu.roll(rowpre, s, 0), 0)
        s *= 2
    # rowpre is now inclusive-over-rows of rowtot; make exclusive
    rowpre = rowpre - rowtot
    incl = incl + rowpre

    E = incl          # incl at end of my W-segment (W=1: myself)
    S = incl - mi     # incl before my W-segment
    # broadcast incl[last] to every lane: Mosaic can't broadcast (1,1) ->
    # (R,128) directly, so max-propagate the last row's total via rolls
    total_b = jnp.where(sub == R - 1, rowpre + rowtot, 0)
    s = 1
    while s < R:
        total_b = jnp.maximum(total_b, pltpu.roll(total_b, s, 0))
        s *= 2

    W = 1
    while W < n_flat:
        in_left = jnp.bitwise_and(flat, W) == 0
        E_mid = jnp.where(in_left, E, _flat_roll_right(E, W, R))
        E_end = jnp.where(in_left, _flat_roll_left(E, W, R), E)
        S_seg = jnp.where(in_left, S, _flat_roll_right(S, W, R))
        if n_flat & (n_flat - 1):  # non-power-of-2 tile: clamp reads past
            segstart = jnp.bitwise_and(flat, ~(2 * W - 1))
            E_mid = jnp.where(segstart + W > n_flat, total_b, E_mid)
            E_end = jnp.where(segstart + 2 * W > n_flat, total_b, E_end)
        c_l = E_mid - S_seg
        c_r = E_end - E_mid
        gap = W - c_l
        pos_in = jnp.bitwise_and(flat, 2 * W - 1)

        b = 1
        while b <= W:
            sigma = jnp.bitwise_and(gap, b - 1)  # lower bits already applied
            lo = W - sigma                       # block's current left edge
            src = pos_in + b
            take = (
                (jnp.bitwise_and(gap, b) != 0)
                & (src >= lo)
                & (src < lo + c_r)
            )
            x = jnp.where(take, _flat_roll_left(x, b, R), x)
            b *= 2

        E, S = E_end, S_seg
        W *= 2

    total = E  # uniform: count of the whole tile
    x = jnp.where(flat < total, x, 0)
    xs_ref[:] = jnp.where(x != 0, (x >> 8) + i_s * n_flat, 0)
    vals_ref[:] = jnp.bitwise_and(x, 255).astype(jnp.uint8)
    cnt_ref[i, 0] = incl[R - 1, LANES - 1]


def _run_kernel(cur2, prev2, thr, *, scheme, tile_rows, grid,
                negfeed, interpret, region2=None, thr_is_map=False,
                skip_static=True, stream_tiles=0, sub_rows=0,
                pack16=False, pair=False, index_off=None,
                emit_xs=True, emit_bits=False):
    """Dispatch one pallas_call; returns ``(new_prev, xs_t, vals_t,
    counts, bits)`` with the tile blocks in ``(rows, LANES)`` layout and
    ``counts`` normalized to one int32 per compaction unit
    (``grid * tile_rows/sub_rows`` entries when sub-tiled, ``grid``
    otherwise). ``region2`` is an optional overlay-region prefix (a
    multiple of ``tile_rows`` rows) blended over the leading tiles
    in-kernel. ``thr`` is an SMEM scalar, or a per-byte ``(rows, LANES)``
    uint8 map when ``thr_is_map``. ``stream_tiles`` > 0 marks a batched
    super-frame: every ``stream_tiles`` tiles are one independent
    stream — indices rebase per stream and the region (stacked
    per-stream blocks) applies to each stream's leading tiles.

    ``emit_xs=False`` (element scheme only) drops the int32 index blocks
    entirely — the single largest kernel HBM write (4n bytes, half of
    all kernel traffic at 1080p); ``xs_t`` comes back None.
    ``emit_bits=True`` adds the packed LSB-first change-bitmask as a
    ``(rows/8, LANES)`` uint8 output (``bits``; None otherwise) — the
    bitmask-only emission for mask/v4 serving, where the wire format
    and the kernel output finally share one representation
    (the TPU-native endgame of ``kernels.cu:289-334``)."""
    rows = cur2.shape[0]
    if (not emit_xs or emit_bits) and scheme != "element":
        raise ValueError("emit_xs=False / emit_bits: element scheme only")
    if emit_bits and tile_rows % 64:
        # the packed-bits block (tile_rows//8, LANES) needs 8-sublane
        # divisibility on hardware (Mosaic block constraint) — callers
        # must size via _tile_geometry_mask
        raise ValueError(
            f"emit_bits needs tile_rows % 64 == 0, got {tile_rows}")
    if scheme == "register":
        from cudavideostream_tpu.ops import pallas_compact

        if region2 is not None or thr_is_map or stream_tiles:
            raise ValueError(
                "overlay fusion / threshold maps / batching: "
                "element/segment schemes only"
            )
        return pallas_compact.run_register(
            cur2, prev2, thr, tile_rows=tile_rows, grid=grid,
            negfeed=negfeed, interpret=interpret,
        ) + (None,)
    if region2 is not None and stream_tiles:
        # a per-stream region input needs the non-monotone index map
        # (i // st) * rt + min(i % st, rt - 1), which defeats Mosaic's
        # DMA pipelining (measured 4x the cost of an XLA substitution
        # pass at B=8) — callers pre-substitute instead
        raise ValueError("overlay_region is solo-only; see models.batched")
    region_tiles = 0 if region2 is None else region2.shape[0] // tile_rows
    if sub_rows and scheme != "element":
        raise ValueError("sub_rows: element scheme only")
    if pack16 and sub_rows != 1:
        raise ValueError("pack16 needs sub_rows == 1 (holes < 128)")
    if pair and (sub_rows != 1 or tile_rows % 16):
        raise ValueError("pair needs sub_rows == 1 and a 16-row-multiple "
                         "tile (aligned half slices)")
    if pair and pack16:
        raise ValueError("pair and pack16 are exclusive pass layouts")
    if index_off is not None and scheme != "element":
        raise ValueError("index_offset: element scheme only")
    if scheme == "element":
        kernel = functools.partial(
            _kernel_v2, tile_rows=tile_rows, negfeed=negfeed,
            region_tiles=region_tiles, thr_is_map=thr_is_map,
            skip_static=skip_static, stream_tiles=stream_tiles,
            sub_rows=sub_rows, pack16=pack16, pair=pair,
            has_offset=index_off is not None,
            emit_xs=emit_xs, emit_bits=emit_bits,
        )
    else:
        kernel = functools.partial(
            _kernel, tile_rows=tile_rows, negfeed=negfeed,
            region_tiles=region_tiles, thr_is_map=thr_is_map,
            stream_tiles=stream_tiles,
        )
    thr_spec = (
        pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
        if thr_is_map
        else pl.BlockSpec(memory_space=pltpu.SMEM)
    )
    in_specs = [
        pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        thr_spec,
    ]
    inputs = [cur2, prev2, thr]
    if region_tiles:
        # leading tiles read the pre-blended block; later grid steps pin
        # the index map to the last region block (fetched once, unused)
        in_specs.append(
            pl.BlockSpec(
                (tile_rows, LANES),
                lambda i, _rt=region_tiles: (jnp.minimum(i, _rt - 1), 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(region2)
    if index_off is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(index_off)
    if scheme == "element":
        # counts ride a per-tile (tile_rows, 1) VMEM column (row r =
        # unit-local inclusive count at r's lane end) — one vector store
        # per tile, no SMEM window at all; normalized below by slicing
        # each unit's last row
        cnt_spec = pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        cnt_shape = jax.ShapeDtypeStruct((rows, 1), jnp.int32)
    else:
        # segment scheme: one whole-tile count per grid step (sub_rows
        # is element-scheme-only, enforced above)
        cnt_spec = pl.BlockSpec((grid, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        cnt_shape = jax.ShapeDtypeStruct((grid, 1), jnp.int32)
    tile_spec = pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    tile_u8 = jax.ShapeDtypeStruct((rows, LANES), jnp.uint8)
    out_specs = [tile_spec]
    out_shape = [tile_u8]                       # new_prev
    if emit_xs:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((rows, LANES), jnp.int32))
    out_specs += [tile_spec, cnt_spec]
    out_shape += [tile_u8, cnt_shape]           # vals, counts
    if emit_bits:
        out_specs.append(
            pl.BlockSpec((tile_rows // 8, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((rows // 8, LANES), jnp.uint8)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
    outs = list(outs)
    new_prev = outs.pop(0)
    xs_t = outs.pop(0) if emit_xs else None
    vals_t, counts = outs.pop(0), outs.pop(0)
    bits = outs.pop(0) if emit_bits else None
    if scheme == "element":
        unit_rows = sub_rows if sub_rows else tile_rows
        counts = counts.reshape(rows // unit_rows, unit_rows)[:, -1]
    else:
        counts = counts.reshape(grid)
    return new_prev, xs_t, vals_t, counts, bits


@functools.partial(
    jax.jit,
    static_argnames=("threshold", "negative_feedback", "interpret", "scheme",
                     "emit", "skip_static", "sub_rows", "pack16", "pair"),
)
def fused_diff_compact(
    current: Array,
    previous: Array,
    threshold: int = 20,
    negative_feedback: bool = True,
    interpret: bool = False,
    scheme: str = "element",
    emit: str = "flat",
    overlay_region: Array | None = None,
    threshold_map: Array | None = None,
    skip_static: bool = True,
    sub_rows: int = 0,
    pack16: bool = False,
    pair: bool = False,
    index_offset: Array | None = None,
):
    """Fused kernel2: diff + negative feedback + stream compaction.

    Flat uint8 frames of any length with int32 byte indices (< 2 GB) —
    1080p, 4K, 8K and any row-shard of them qualify: the shift passes
    pack tile-LOCAL indices, so the packed int32 representation never
    bounds the frame. Oddly-sized inputs are padded internally with
    ``cur == prev`` bytes, which can never ship and never perturb the
    negative-feedback state.

    ``scheme``: ``"element"`` (default) = per-element LSB-first shifts,
    ~log2(tile) dense passes; ``"segment"`` = bit-serial segment merging,
    ~sum-of-bits passes; ``"register"`` = row-loop register staging. All
    three are independently derived and byte-exact cross-checks.

    ``emit="flat"`` returns ``(pos, xs, vals, new_prev)`` — ``xs`` int32
    ascending (zero past pos), ``vals`` uint8 (zero past pos), ``new_prev``
    uint8, all of the *input* length.

    ``emit="tiled"`` returns ``(pos, counts, xs_t, vals_t, new_prev)`` —
    per-tile compacted blocks ``(grid, tile_bytes)`` whose tile ``t``
    holds ``counts[t]`` valid entries, skipping the merge epilogue; the
    host's scatter-gather sender assembles the identical wire bytes for
    free (``wire.tiled_to_flat`` / ``native wire_send_segments``).

    ``emit="mask"`` returns ``(pos, counts, vals_t, bits, new_prev)`` —
    the BITMASK-ONLY emission for mask-flavor serving: no int32 index
    blocks are materialized at all (they were half of the kernel's HBM
    writes — 24.9 MB/frame at 1080p, ``benchmarks/trace_flagship_tpu_v5e``),
    and the packed LSB-first change-bitmask (``bits``, flat ``n_pad/8``
    uint8, the exact ``diff.pack_bitmask`` layout) is produced inside
    the kernel from the mask it already holds in VMEM instead of by a
    separate 2n-byte XLA re-read of (new_prev, prev). Byte indices are
    recoverable exactly from ``bits`` (LSB-first unpack order IS
    ascending byte order — ``TiledLander._rebuild_mask_xs``), so mask
    landings and wire v4 lose nothing. Element scheme only.

    ``overlay_region`` (element/segment schemes): a prefix of the frame
    with the text strip already blended (tiny — the strip's image rows).
    The kernel substitutes it for ``current`` on the leading tiles, so
    the overlay costs no extra pass over the frame; diff, negative
    feedback, and the payload all see the overlaid bytes, exactly as if
    the caller had overlaid the whole frame first.

    ``threshold_map`` (element/segment schemes): a per-byte uint8
    sensitivity map of the input length; byte ``i`` ships iff
    ``|df_i| > threshold_map[i]`` — per-region sensitivity the
    reference's global ``#define`` cannot express. Overrides
    ``threshold``.

    ``sub_rows`` (element scheme): compact in independent ``sub_rows``-row
    sub-tiles inside each DMA block — fewer shift passes at identical
    wire bytes (see ``_kernel_v2``). The emitted counts/blocks are then
    per SUB-tile: ``counts (grid * tile_rows/sub_rows,)``, blocks
    ``(n_sub_tiles, sub_rows*128)``. Silently ignored when it doesn't
    divide the chosen tile geometry (huge frames) — the output shapes
    follow whatever granularity actually ran.

    Tiled-emit ``counts`` ship in the narrowest dtype that holds a full
    unit (uint8 at ``sub_rows=1``, int16 below 256-row units, else
    int32) — see ``_narrow_counts``. Consumers must not sum them without
    upcasting; ``pos`` is the pre-computed int32 total.

    ``pair`` (element scheme, ``sub_rows=1`` only): pack the 15-bit
    units of two rows into each int32 lane so the shift passes — the
    entire remaining compaction cost — run over half the rows (see
    ``_kernel_v2``). Identical outputs; silently ignored when the
    geometry doesn't support it (sub_rows != 1 or an unpaired tile).

    ``index_offset`` (element scheme): a traced int32 scalar added to
    every valid emitted byte index in-kernel (an SMEM operand, like the
    scalar threshold). A ``shard_map``'d caller passes its shard base
    (``sidx * local_bytes``) so per-shard kernel launches emit GLOBAL
    frame indices with no post-pass over the payload — the device-side
    globalization pass it replaces costs a full extra HBM round over
    the int32 index buffer.
    """
    n = current.shape[0]
    geometry = _tile_geometry_mask if emit == "mask" else _tile_geometry
    rows, tile_rows = geometry(-(-n // LANES))
    if sub_rows and (tile_rows % sub_rows or tile_rows > 512
                     or scheme != "element" or emit == "flat"):
        # flat emit: the merge epilogue is unit-serial, so sub-tiling
        # would trade 6 cheap passes for thousands of serial merge
        # steps — the sub-tiled layout exists for the tiled emit.
        # tile_rows > 512 (frames past ~131 MB): the sub-tiled row
        # phase would build an (R, R) block-diagonal matrix past the
        # hardware-validated VMEM range (_mxu_incl_prefix) — those
        # geometries compact at whole-tile granularity instead.
        sub_rows = 0
    n_pad = rows * LANES
    # tile-LOCAL packing bounds the packed rep by the tile size, so the
    # frame itself is limited only by int32 byte indices
    if n_pad >= 1 << 31:
        raise ValueError("frame byte indices exceed int32")
    if n_pad != n:
        current = jnp.pad(current, (0, n_pad - n))
        previous = jnp.pad(previous, (0, n_pad - n))
    grid = rows // tile_rows

    region2 = None
    if overlay_region is not None and overlay_region.shape[0] > 0:
        # pad the region to whole tiles with the frame's own bytes (a
        # no-op blend), so covered tiles can substitute it wholesale
        r_len = overlay_region.shape[0]
        r_rows = -(-r_len // LANES)
        r_tiles = -(-r_rows // tile_rows)
        r_bytes = r_tiles * tile_rows * LANES  # <= n_pad since r_len <= n
        region = jnp.concatenate([overlay_region, current[r_len:r_bytes]])
        region2 = region.reshape(-1, LANES)

    cur2 = current.reshape(rows, LANES)
    prev2 = previous.reshape(rows, LANES)
    thr_is_map = threshold_map is not None
    if thr_is_map:
        # pad value is irrelevant: padded bytes have cur == prev, and
        # |0| > t is false for every uint8 t
        if threshold_map.shape[0] != n:
            raise ValueError("threshold_map length must equal the frame's")
        thr = jnp.pad(threshold_map, (0, n_pad - n)).reshape(rows, LANES)
    else:
        thr = jnp.full((1,), threshold, jnp.int32)

    index_off = None
    if index_offset is not None:
        index_off = jnp.asarray(index_offset, jnp.int32).reshape(1)

    new_prev, xs_t, vals_t, counts, bits = _run_kernel(
        cur2, prev2, thr, scheme=scheme, tile_rows=tile_rows, grid=grid,
        negfeed=negative_feedback, interpret=interpret, region2=region2,
        thr_is_map=thr_is_map, skip_static=skip_static, sub_rows=sub_rows,
        pack16=pack16 and sub_rows == 1,
        pair=pair and sub_rows == 1 and tile_rows % 16 == 0 and not pack16,
        index_off=index_off,
        emit_xs=emit != "mask", emit_bits=emit == "mask",
    )

    # emission granularity: sub-tiles when sub_rows ran, else tiles
    unit_rows = sub_rows if sub_rows else tile_rows
    n_units = rows // unit_rows
    unit_bytes = unit_rows * LANES
    counts = counts.reshape(n_units)
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    pos = offsets[n_units]
    new_prev = new_prev.reshape(n_pad)[:n]

    if emit == "mask":
        return (pos, _narrow_counts(counts, unit_bytes),
                vals_t.reshape(n_units, unit_bytes),
                bits.reshape(n_pad // 8), new_prev)

    if emit == "tiled":
        return (pos, _narrow_counts(counts, unit_bytes),
                xs_t.reshape(n_units, unit_bytes),
                vals_t.reshape(n_units, unit_bytes), new_prev)

    # flat emit: merge the per-tile prefixes device-side. Past the
    # serial-DUS crossover (huge frames re-tile to grids well past 256;
    # each DUS step is pure dependency latency) take the same two-stage
    # pair-compaction merge as merge_tiles — outputs are zero past pos
    # either way, and the two-stage pad may exceed n (slice first).
    if n_units <= MERGE_SERIAL_MAX_UNITS:
        xs, vals = _merge_tiles_impl(
            counts, xs_t.reshape(n_units, unit_bytes),
            vals_t.reshape(n_units, unit_bytes)
        )
    else:
        xs, vals = _merge_tiles_two_stage(
            counts, xs_t.reshape(n_units, unit_bytes),
            vals_t.reshape(n_units, unit_bytes), interpret=interpret,
        )
    return pos, xs[:n], vals[:n], new_prev


@functools.partial(
    jax.jit,
    static_argnames=("n_streams", "threshold", "negative_feedback",
                     "interpret", "scheme", "skip_static", "sub_rows",
                     "pair"),
)
def fused_diff_compact_batched(
    current: Array,
    previous: Array,
    n_streams: int,
    threshold: int = 20,
    negative_feedback: bool = True,
    interpret: bool = False,
    scheme: str = "element",
    threshold_map: Array | None = None,
    skip_static: bool = True,
    sub_rows: int = 0,
    pair: bool = False,
):
    """Batched kernel2: B independent streams in ONE pallas_call.

    The B padded frames concatenate along the tile axis — a super-frame
    whose grid is ``B * tiles_per_stream`` — so the per-tile code is
    *identical* to the solo kernel. The kernel rebases emitted byte
    indices per stream (static arithmetic on the grid index), so
    per-stream payloads are just per-stream tile ranges.

    ``current``/``previous`` are FLAT ``(B * n,)`` uint8 — deliberately:
    a ``(B, n)`` uint8 array on TPU pads the sublane dim of its
    ``(B, n)`` tiling to 8, so for B < 8 every pass over it reads up to
    8x the bytes (measured: 1.05 ms vs 0.48 ms at B=1 for this very
    kernel). Flat buffers keep the solo layout; callers carry state
    flat (see ``models.batched``).

    ``threshold_map``: optional shared ``(n,)`` per-byte map. (No
    ``overlay_region`` here: a per-stream region input needs a
    non-monotone block index map, which defeats Mosaic's DMA
    pipelining — measured 4x the cost of callers substituting strips
    with one XLA select pass; see ``models.batched._fast_impl``.)

    Returns ``(pos (B,), counts (B, Tps), xs_t (B, Tps, tile_bytes),
    vals_t (B, Tps, tile_bytes), new_prev (B * n,))`` — stream ``b``'s
    wire payload is exactly ``TiledPayload(pos[b], counts[b], xs_t[b],
    vals_t[b])`` (tiled emit only: this is the product wire path).
    """
    B = n_streams
    if current.ndim != 1 or current.shape[0] % B:
        raise ValueError("expect flat (B*n,) frames")
    n = current.shape[0] // B
    rows, tile_rows = _tile_geometry(-(-n // LANES))
    if sub_rows and (tile_rows % sub_rows or tile_rows > 512
                     or scheme != "element"):
        # same VMEM cutoff as the solo path (_mxu_incl_prefix)
        sub_rows = 0
    n_pad = rows * LANES
    if n_pad >= 1 << 31:
        raise ValueError("frame byte indices exceed int32")
    if n_pad != n:
        # per-stream padding via pure 1-D concat: reshaping through a
        # (B, n) intermediate would materialize the padded-sublane
        # layout every frame (the 8x trap this wrapper exists to avoid —
        # measured: this very branch cost 3 ms/frame at B=1 when it
        # briefly padded through (B, n))
        z = jnp.zeros(n_pad - n, jnp.uint8)
        current = jnp.concatenate(
            [p for b in range(B) for p in (current[b * n:(b + 1) * n], z)]
        )
        previous = jnp.concatenate(
            [p for b in range(B) for p in (previous[b * n:(b + 1) * n], z)]
        )
    tps = rows // tile_rows
    grid = B * tps
    tile_bytes = tile_rows * LANES
    if grid > MAX_GRID:
        # see MAX_GRID: an SMEM-window hard limit for the segment/
        # register schemes, a deliberate uniform bound for element —
        # refuse loudly here rather than risk a hardware-only failure
        # the CPU interpreter cannot catch
        # (models.batched chunks into multiple calls instead)
        raise ValueError(
            f"batched grid {grid} (= {B} streams x {tps} tiles) exceeds "
            f"the ~{MAX_GRID}-step SMEM counts-window bound; use fewer "
            f"streams per kernel call"
        )

    thr_is_map = threshold_map is not None
    if thr_is_map:
        if threshold_map.shape[0] != n:
            raise ValueError("threshold_map length must equal the frame's")
        tm = jnp.pad(threshold_map, (0, n_pad - n)).reshape(rows, LANES)
        # 1-D-style concat, not jnp.tile: tile's (B, n) broadcast
        # intermediate takes a padded-sublane layout for B < 8 and its
        # reshape back is a slow strided copy (measured on the frame
        # path: +2.9 ms at B=2)
        thr = jnp.concatenate([tm] * B, axis=0)
    else:
        thr = jnp.full((1,), threshold, jnp.int32)

    cur2 = current.reshape(B * rows, LANES)
    prev2 = previous.reshape(B * rows, LANES)
    new_prev, xs_t, vals_t, counts, _ = _run_kernel(
        cur2, prev2, thr, scheme=scheme, tile_rows=tile_rows, grid=grid,
        negfeed=negative_feedback, interpret=interpret,
        thr_is_map=thr_is_map, skip_static=skip_static, stream_tiles=tps,
        sub_rows=sub_rows,
        pair=pair and sub_rows == 1 and tile_rows % 16 == 0,
    )
    unit_rows = sub_rows if sub_rows else tile_rows
    units_per_stream = rows // unit_rows
    unit_bytes = unit_rows * LANES
    counts = counts.reshape(B, units_per_stream)
    pos = jnp.sum(counts, axis=1)
    counts = _narrow_counts(counts, unit_bytes)
    if n_pad != n:
        # 1-D slicing, again avoiding any (B, n)-shaped intermediate
        lin = new_prev.reshape(B * n_pad)
        new_prev_flat = jnp.concatenate(
            [lin[b * n_pad:b * n_pad + n] for b in range(B)]
        )
    else:
        new_prev_flat = new_prev.reshape(B * n)
    return (
        pos,
        counts,
        xs_t.reshape(B, units_per_stream, unit_bytes),
        vals_t.reshape(B, units_per_stream, unit_bytes),
        new_prev_flat,
    )


def _kernel_pair(xs_ref, vals_ref, out_xs_ref, out_vals_ref, cnt_ref, *,
                 tile_rows: int):
    """Pair compaction: compact ``(xs, vals)`` by ``vals != 0``.

    The device half of the FAST merge for finely-tiled payloads (see
    :func:`merge_tiles`): the element scheme's LSB-first shift passes,
    but moving TWO arrays — the packed ``holes*256 + delta`` drives the
    decisions and the global ``xs`` value rides along under the same
    takes/keeps (it cannot be packed in: byte indices need up to 31
    bits themselves). Validity is exactly ``vals != 0`` — a shipped
    delta is never 0 and tile blocks are zero past their counts.
    """
    i = pl.program_id(0)
    R = tile_rows

    v = vals_ref[:].astype(jnp.int32)
    m = v != 0
    mi = m.astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = sub * LANES + lane

    # shared MXU cumsum — including the R > 512 roll fallback, which
    # this kernel reaches for huge frames (its _tile_geometry is the
    # flagship's, so a >131 MB payload re-tiles past 512 rows)
    incl = _mxu_incl_prefix(mi, R)

    holes = jnp.where(m, flat - (incl - 1), 0)
    x = jnp.where(m, holes * 256 + v, 0)
    x2 = xs_ref[:]
    n_flat = R * LANES
    b = 1
    while b < n_flat:
        rx = _flat_roll_left(x, b, R)
        rx2 = _flat_roll_left(x2, b, R)
        src_ok = flat + b < n_flat
        take = src_ok & (jnp.bitwise_and(rx, b * 256) != 0)
        keep = jnp.bitwise_and(x, b * 256) == 0
        x = jnp.where(take, rx, jnp.where(keep, x, 0))
        x2 = jnp.where(take, rx2, jnp.where(keep, x2, 0))
        b *= 2

    out_vals_ref[:] = jnp.bitwise_and(x, 255).astype(jnp.uint8)
    # xs validity follows x's (an xs VALUE of 0 — byte index 0 — is
    # legitimate; x != 0 is the occupancy flag)
    out_xs_ref[:] = jnp.where(x != 0, x2, 0)
    cnt_ref[i, 0] = incl[R - 1, LANES - 1]


def _pair_compact(xs_flat: Array, vals_flat: Array, interpret: bool = False):
    """Compact flat ``(xs, vals)`` by ``vals != 0`` into per-tile blocks
    ``(grid, tile_bytes)`` + counts, at the whole-tile grid geometry."""
    n = xs_flat.shape[0]
    rows, tile_rows = _tile_geometry(-(-n // LANES))
    n_pad = rows * LANES
    if n_pad != n:
        xs_flat = jnp.pad(xs_flat, (0, n_pad - n))
        vals_flat = jnp.pad(vals_flat, (0, n_pad - n))
    grid = rows // tile_rows
    xs_t, vals_t, counts = pl.pallas_call(
        functools.partial(_kernel_pair, tile_rows=tile_rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((grid, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xs_flat.reshape(rows, LANES), vals_flat.reshape(rows, LANES))
    tile_bytes = tile_rows * LANES
    return (counts.reshape(grid), xs_t.reshape(grid, tile_bytes),
            vals_t.reshape(grid, tile_bytes))


# unit count above which the serial DUS-chain merge loses to the
# two-stage pair-compaction merge (each DUS step costs ~0.1 ms of
# serial latency; the pair kernel costs ~2x the flagship kernel's
# passes — see benchmarks/subtile_ab's 12 ms serial row at 6075 units)
MERGE_SERIAL_MAX_UNITS = 256


def _narrow_counts(counts: Array, unit_bytes: int) -> Array:
    """Emit tiled-payload counts in the narrowest dtype that holds a
    full unit (a count never exceeds ``unit_bytes``). The host fetches
    counts every tiled frame, and at fine sub-tilings the int32 array is
    the largest metadata item — 190 KB at 1080p ``sub_rows=1`` vs 48 KB
    as uint8. Device consumers upcast for free (``jnp.cumsum(...,
    dtype=int32)``); the native sender coerces host-side
    (``native.wire_send_segments_fd``)."""
    if unit_bytes < 256:
        return counts.astype(jnp.uint8)
    if unit_bytes < 32768:
        return counts.astype(jnp.int16)
    return counts


def _merge_tiles_impl(counts: Array, xs_t: Array, vals_t: Array):
    """Concatenate per-tile compacted prefixes into flat (xs, vals).

    The device half of the merge epilogue, standalone: tile ``t``
    contributes its first ``counts[t]`` entries at offset
    ``sum(counts[:t])``. Outputs are full padded length
    ``grid * tile_bytes``, zero past ``pos`` (the tiles' own invariant).
    """
    grid, tile_bytes = xs_t.shape
    n_pad = grid * tile_bytes
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    xs_flat = xs_t.reshape(n_pad)
    vals_flat = vals_t.reshape(n_pad)

    def body(i, accs):
        ax, av = accs
        off = (offsets[i],)
        bx = jax.lax.dynamic_slice(xs_flat, (i * tile_bytes,), (tile_bytes,))
        bv = jax.lax.dynamic_slice(vals_flat, (i * tile_bytes,), (tile_bytes,))
        # one loop, two independent updates per step: half the serial
        # dynamic-op chain of two separate merge loops
        return (
            jax.lax.dynamic_update_slice(ax, bx, off),
            jax.lax.dynamic_update_slice(av, bv, off),
        )

    return jax.lax.fori_loop(
        0, grid, body,
        (jnp.zeros(n_pad, jnp.int32), jnp.zeros(n_pad, jnp.uint8)),
    )


_merge_tiles_serial = jax.jit(_merge_tiles_impl)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _merge_tiles_two_stage(counts, xs_t, vals_t, interpret=False):
    """Sub-tiled (many-unit) merge: a serial DUS chain over thousands of
    units costs ~milliseconds of pure dependency latency (measured 12 ms
    at 6075 units, benchmarks/subtile_ab), so first re-compact the
    flattened blocks with the PAIR kernel (validity = ``vals != 0``, the
    blocks' own invariant) down to the coarse whole-tile granularity,
    then run the short serial merge over those ~100 tiles."""
    U, ub = xs_t.shape
    c2, xs2, vals2 = _pair_compact(
        xs_t.reshape(U * ub), vals_t.reshape(U * ub), interpret=interpret
    )
    return _merge_tiles_impl(c2, xs2, vals2)


def merge_tiles(counts, xs_t, vals_t):
    """Device-side tile merge for executors that fetched a tiled payload
    but face a link where the flat prefix moves far fewer bytes
    (runtime.executor's density-adaptive fetch). Output arrays are
    zero past ``pos``; their padded length may exceed ``U * ub`` on the
    two-stage path — callers slice ``[:pos]`` prefixes."""
    if xs_t.shape[0] <= MERGE_SERIAL_MAX_UNITS:
        return _merge_tiles_serial(counts, xs_t, vals_t)
    return _merge_tiles_two_stage(
        counts, xs_t, vals_t, interpret=jax.default_backend() == "cpu"
    )


def _kernel_vals(vals_ref, out_vals_ref, cnt_ref, *, tile_rows: int):
    """Vals-only compaction: compact a uint8 stream by ``vals != 0`` —
    the device half of :func:`merge_vals`. Exactly the pair kernel
    (``_kernel_pair``) minus the riding xs array: the packed
    ``holes*256 + val`` drives the LSB-first shift passes alone, so the
    merge for bitmask-only payloads never touches an int32 index stream
    (2n HBM bytes instead of the pair kernel's ~10n)."""
    i = pl.program_id(0)
    R = tile_rows

    v = vals_ref[:].astype(jnp.int32)
    m = v != 0
    mi = m.astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    flat = sub * LANES + lane

    incl = _mxu_incl_prefix(mi, R)
    holes = jnp.where(m, flat - (incl - 1), 0)
    x = jnp.where(m, holes * 256 + v, 0)
    n_flat = R * LANES
    b = 1
    while b < n_flat:
        rx = _flat_roll_left(x, b, R)
        src_ok = flat + b < n_flat
        take = src_ok & (jnp.bitwise_and(rx, b * 256) != 0)
        x = jnp.where(
            take, rx,
            jnp.where(jnp.bitwise_and(x, b * 256) == 0, x, 0),
        )
        b *= 2

    out_vals_ref[:] = jnp.bitwise_and(x, 255).astype(jnp.uint8)
    cnt_ref[i, 0] = incl[R - 1, LANES - 1]


def _vals_compact(vals_flat: Array, interpret: bool = False):
    """Compact a flat uint8 stream by ``vals != 0`` into per-tile blocks
    ``(grid, tile_bytes)`` + counts, at the whole-tile grid geometry."""
    n = vals_flat.shape[0]
    rows, tile_rows = _tile_geometry(-(-n // LANES))
    n_pad = rows * LANES
    if n_pad != n:
        vals_flat = jnp.pad(vals_flat, (0, n_pad - n))
    grid = rows // tile_rows
    vals_t, counts = pl.pallas_call(
        functools.partial(_kernel_vals, tile_rows=tile_rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grid, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((grid, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(vals_flat.reshape(rows, LANES))
    tile_bytes = tile_rows * LANES
    return counts.reshape(grid), vals_t.reshape(grid, tile_bytes)


def _merge_vals_impl(counts: Array, vals_t: Array):
    """Serial DUS-chain concatenation of per-tile vals prefixes (the
    vals half of :func:`_merge_tiles_impl`)."""
    grid, tile_bytes = vals_t.shape
    n_pad = grid * tile_bytes
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    vals_flat = vals_t.reshape(n_pad)

    def body(i, av):
        bv = jax.lax.dynamic_slice(vals_flat, (i * tile_bytes,),
                                   (tile_bytes,))
        return jax.lax.dynamic_update_slice(av, bv, (offsets[i],))

    return jax.lax.fori_loop(0, grid, body, jnp.zeros(n_pad, jnp.uint8))


_merge_vals_serial = jax.jit(_merge_vals_impl)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _merge_vals_two_stage(counts, vals_t, interpret=False):
    U, ub = vals_t.shape
    c2, vals2 = _vals_compact(vals_t.reshape(U * ub), interpret=interpret)
    return _merge_vals_impl(c2, vals2)


def merge_vals(counts, vals_t):
    """Device-side VALS-ONLY tile merge for bitmask-only payloads
    (``emit="mask"``): the mask landing fetches the merged vals prefix +
    the bits window and rebuilds indices host-side, so merging (or even
    materializing) the xs stream is pure waste — ``merge_tiles`` on the
    product sub_rows=1 geometry pays the two-stage PAIR kernel, which
    reads + writes the 4n-byte int32 stream nothing consumes. Same
    output contract as ``merge_tiles``'s vals half: zero past ``pos``,
    padded length may exceed ``U * ub`` — slice ``[:pos]`` prefixes."""
    if vals_t.shape[0] <= MERGE_SERIAL_MAX_UNITS:
        return _merge_vals_serial(counts, vals_t)
    return _merge_vals_two_stage(
        counts, vals_t, interpret=jax.default_backend() == "cpu"
    )
