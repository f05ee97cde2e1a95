"""Byte-exactness of every device operator against the golden CPU oracle.

This is the rebuild's version of the reference's ``checkDifference``
harness (``tests/algorithms_benchmarks.cu:12-22``): random synthetic
frames, device output compared elementwise — except the gate here is
exact equality, not eyeballing.
"""

import numpy as np
import pytest

from cudavideostream_tpu.ops import reference_cpu as ref
from tests.conftest import make_frame_pair

jnp = pytest.importorskip("jax.numpy")


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(42)
    return make_frame_pair(rng, 48 * 64 * 3)


class TestDiffCompact:
    @pytest.mark.parametrize("backend", ["sort", "padded"])
    def test_matches_oracle(self, pair, backend):
        from cudavideostream_tpu.ops import compact, diff

        prev, cur = pair
        n = cur.size
        pos_ref, xs_ref, vals_ref, new_prev_ref = ref.diff_encode(cur, prev)

        mask, vals, new_prev = diff.diff_mask(jnp.asarray(cur), jnp.asarray(prev), 20)
        pos, xs, v = compact.compact(mask, vals, n, backend=backend, row_len=256)
        pos = int(pos)
        assert pos == pos_ref
        np.testing.assert_array_equal(np.asarray(new_prev), new_prev_ref)
        np.testing.assert_array_equal(np.asarray(xs)[:pos], xs_ref)
        np.testing.assert_array_equal(np.asarray(v)[:pos], vals_ref)
        # padding is zeroed
        assert int(np.asarray(xs)[pos:].sum()) == 0
        assert int(np.asarray(v)[pos:].sum()) == 0

    @pytest.mark.parametrize("backend", ["sort", "padded"])
    def test_extremes(self, backend):
        from cudavideostream_tpu.ops import compact, diff

        n = 2048
        prev = np.zeros(n, dtype=np.uint8)
        same = prev.copy()
        allchg = np.full(n, 200, dtype=np.uint8)
        for cur, expect in ((same, 0), (allchg, n)):
            mask, vals, _ = diff.diff_mask(jnp.asarray(cur), jnp.asarray(prev), 20)
            pos, xs, v = compact.compact(mask, vals, n, backend=backend, row_len=256)
            assert int(pos) == expect

    def test_no_negative_feedback(self, pair):
        from cudavideostream_tpu.ops import diff

        prev, cur = pair
        _, _, new_prev = diff.diff_mask(
            jnp.asarray(cur), jnp.asarray(prev), 20, negative_feedback=False
        )
        np.testing.assert_array_equal(np.asarray(new_prev), cur)


class TestFilters:
    def test_grayscale_average(self, pair):
        from cudavideostream_tpu.ops import filters

        _, cur = pair
        np.testing.assert_array_equal(
            np.asarray(filters.grayscale_average(jnp.asarray(cur))),
            ref.grayscale_average(cur),
        )

    def test_grayscale_weighted(self, pair):
        from cudavideostream_tpu.ops import filters

        _, cur = pair
        np.testing.assert_array_equal(
            np.asarray(filters.grayscale_weighted(jnp.asarray(cur))),
            ref.grayscale_weighted(cur),
        )

    def test_histogram(self, pair):
        from cudavideostream_tpu.ops import filters

        _, cur = pair
        g = ref.grayscale_weighted(cur)
        np.testing.assert_array_equal(
            np.asarray(filters.gray_histogram(jnp.asarray(g))),
            ref.gray_histogram(g),
        )
        # nibble-factorized MXU path == compare-reduce path, exactly
        np.testing.assert_array_equal(
            np.asarray(filters.gray_histogram(jnp.asarray(g), mxu=True)),
            np.asarray(filters.gray_histogram(jnp.asarray(g), mxu=False)),
        )

    @pytest.mark.parametrize("unroll", [False, True])
    def test_pallas_histogram_interpret(self, unroll):
        # The on-chip binarize default (filters.gray_histogram routes
        # (M,128) grids here off-CPU); interpret mode pins byte-
        # exactness vs the XLA compare-reduce on the CPU suite. Small
        # grid: interpret mode walks 256 reduces per tile.
        from cudavideostream_tpu.ops import filters
        from cudavideostream_tpu.ops.hist_pallas import pallas_histogram

        rng = np.random.default_rng(7)
        g = rng.integers(0, 256, size=(64, 128), dtype=np.int64)
        g[0, 0] = 0
        g[-1, -1] = 255
        g = jnp.asarray(g, jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(pallas_histogram(g, interpret=True, unroll=unroll)),
            np.asarray(filters.value_histogram(g)),
        )

    @pytest.mark.parametrize(
        "hist_fn",
        [
            lambda: {10: 5, 30: 5},            # tie -> later wins
            lambda: {200: 9, 100: 7},
            lambda: {0: 100},                  # degenerate single update run
            lambda: {255: 1},
            lambda: {},                        # all-zero histogram
        ],
    )
    def test_top2_matches_scan(self, hist_fn):
        from cudavideostream_tpu.ops import filters

        h = np.zeros(256, dtype=np.int64)
        for k, v in hist_fn().items():
            h[k] = v
        imax, isec = filters.top2_prefix_max(jnp.asarray(h))
        assert (int(imax), int(isec)) == ref.top2_scan(h)

    def test_top2_random_histograms(self, rng):
        from cudavideostream_tpu.ops import filters

        for _ in range(20):
            h = rng.integers(0, 50, 256)
            h[rng.integers(0, 256, 5)] = rng.integers(100, 1000, 5)
            imax, isec = filters.top2_prefix_max(jnp.asarray(h))
            assert (int(imax), int(isec)) == ref.top2_scan(h)
            t = filters.binarize_threshold(jnp.asarray(h))
            assert int(t) == ref.binarize_threshold(h)

    def test_binarize_pipeline(self, pair):
        from cudavideostream_tpu.ops import filters

        _, cur = pair
        np.testing.assert_array_equal(
            np.asarray(filters.binarize_pipeline(jnp.asarray(cur))),
            ref.binarize_pipeline(cur),
        )

    def test_binarize_pipeline_fused_equals_unfused(self, pair):
        """The fused chain (per-pixel gray once, no 3-channel gray
        write/re-read) is byte-identical to the write-then-re-read
        sequence and the oracle — at both the aligned (M, 384) layout
        and the non-aligned pixel fallback."""
        from cudavideostream_tpu.ops import filters

        _, cur = pair
        for frame in (cur, cur[: (len(cur) // 384) * 384 + 3 * 7]):
            f = jnp.asarray(frame)
            fused = np.asarray(filters.binarize_pipeline(f, fused=True))
            unfused = np.asarray(filters.binarize_pipeline(f, fused=False))
            np.testing.assert_array_equal(fused, unfused)
            np.testing.assert_array_equal(fused, ref.binarize_pipeline(frame))

    def test_gray_pixels_matches_weighted(self, pair):
        from cudavideostream_tpu.ops import filters

        _, cur = pair
        gv = np.asarray(filters.gray_pixels(jnp.asarray(cur))).reshape(-1)
        g3 = np.asarray(filters.grayscale_weighted(jnp.asarray(cur)))
        np.testing.assert_array_equal(np.repeat(gv, 3), g3)
        np.testing.assert_array_equal(
            np.asarray(filters.value_histogram(
                filters.gray_pixels(jnp.asarray(cur)))),
            np.asarray(filters.gray_histogram(jnp.asarray(g3))),
        )

    def test_heatmap(self, pair):
        from cudavideostream_tpu.ops import filters

        prev, cur = pair
        np.testing.assert_array_equal(
            np.asarray(filters.heatmap(jnp.asarray(cur), jnp.asarray(prev))),
            ref.heatmap(cur, prev),
        )

    def test_red_modes(self, pair):
        from cudavideostream_tpu.ops import diff, filters

        prev, cur = pair
        _, xs_ref, _, _ = ref.diff_encode(cur, prev)
        mask, _, _ = diff.diff_mask(jnp.asarray(cur), jnp.asarray(prev), 20)
        np.testing.assert_array_equal(
            np.asarray(filters.red_black(mask)), ref.red_black(xs_ref, cur.size)
        )
        np.testing.assert_array_equal(
            np.asarray(filters.red_overlap(jnp.asarray(prev), mask)),
            ref.red_overlap(prev, xs_ref),
        )


class TestConvolve:
    @pytest.mark.parametrize("k", [3, 4, 5, 7, 9])
    def test_gaussian(self, pair, k):
        from cudavideostream_tpu.ops import convolve

        _, cur = pair
        wq = ref.quantize_kernel_q16(ref.gaussian_kernel(k))
        np.testing.assert_array_equal(
            np.asarray(convolve.convolve_q16(jnp.asarray(cur), wq, 48, 64)),
            ref.convolve(cur, ref.gaussian_kernel(k), 48, 64),
        )

    def test_mean(self, pair):
        from cudavideostream_tpu.ops import convolve

        _, cur = pair
        wq = ref.quantize_kernel_q16(ref.mean_kernel(5))
        np.testing.assert_array_equal(
            np.asarray(convolve.convolve_q16(jnp.asarray(cur), wq, 48, 64)),
            ref.convolve(cur, ref.mean_kernel(5), 48, 64),
        )

    @pytest.mark.parametrize("k", [3, 5])
    def test_median(self, pair, k):
        from cudavideostream_tpu.ops import convolve

        _, cur = pair
        np.testing.assert_array_equal(
            np.asarray(convolve.median_filter(jnp.asarray(cur), k, 48, 64)),
            ref.median_filter(cur, k, 48, 64),
        )


class TestOverlay:
    def test_matches_oracle(self, pair):
        from cudavideostream_tpu.ops import overlay
        from cudavideostream_tpu.utils import fonts

        _, cur = pair
        atlas = fonts.make_atlas(scale=2)
        text = "FPS: 42 BW: 123 kbps"
        ids = fonts.encode_text(text, 24)
        out = overlay.overlay_blit(
            jnp.asarray(cur),
            jnp.asarray(atlas),
            jnp.asarray(ids, dtype=jnp.int32),
            jnp.int32(len(text)),
            48,
            64,
        )
        np.testing.assert_array_equal(
            np.asarray(out),
            ref.overlay_blit(cur, atlas, fonts.encode_text(text), 48, 64),
        )

    def test_empty_text_is_identity(self, pair):
        from cudavideostream_tpu.ops import overlay
        from cudavideostream_tpu.utils import fonts

        _, cur = pair
        atlas = fonts.make_atlas(scale=2)
        ids = fonts.encode_text("", 24)
        out = overlay.overlay_blit(
            jnp.asarray(cur),
            jnp.asarray(atlas),
            jnp.asarray(ids, dtype=jnp.int32),
            jnp.int32(0),
            48,
            64,
        )
        np.testing.assert_array_equal(np.asarray(out), cur)


SCHEMES = ["element", "segment", "register"]


class TestCompactionSchemesAgree:
    @pytest.mark.parametrize("scheme", SCHEMES)
    def test_scheme_matches_oracle(self, pair, scheme):
        """Each independently-derived Pallas compaction scheme is
        byte-exact against the golden CPU oracle."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, xs, vals, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True, scheme=scheme
        )
        pos = int(pos)
        assert pos == epos
        np.testing.assert_array_equal(np.asarray(xs)[:pos], exs)
        np.testing.assert_array_equal(np.asarray(vals)[:pos], evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)
        assert int(np.asarray(xs)[pos:].sum()) == 0

    @pytest.mark.parametrize("scheme", SCHEMES[1:])
    def test_cross_check_vs_element(self, pair, scheme):
        """The three schemes must produce identical outputs pairwise."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        a = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True, scheme="element"
        )
        b = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True, scheme=scheme
        )
        assert int(a[0]) == int(b[0])
        for x, y in zip(a[1:], b[1:]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.parametrize("n", [9088, 9000, 5184, 129])
    def test_unaligned_lengths_padded_internally(self, rng, n):
        """Arbitrary frame sizes (per-shard slices of 1080p, tiny
        buffers) are padded inside the kernel wrapper with cur == prev
        bytes; the payload and state are those of the unpadded frame."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = make_frame_pair(rng, n)
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, xs, vals, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True
        )
        assert xs.shape == (n,) and new_prev.shape == (n,)
        assert int(pos) == epos
        np.testing.assert_array_equal(np.asarray(xs)[:epos], exs)
        np.testing.assert_array_equal(np.asarray(vals)[:epos], evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    @pytest.mark.parametrize("scheme", SCHEMES)
    def test_tiled_emit_matches_flat(self, pair, scheme):
        """emit='tiled' skips the merge epilogue; concatenating the tile
        prefixes host-side must reproduce the flat payload exactly."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            scheme=scheme, emit="tiled",
        )
        assert int(pos) == epos
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        assert int(counts.sum()) == epos
        xs = np.concatenate([xs_t[t, : counts[t]] for t in range(len(counts))])
        vals = np.concatenate([vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(xs, exs)
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)
        # zero-padding invariant inside every tile block
        for t in range(len(counts)):
            assert int(xs_t[t, counts[t]:].sum()) == 0
            assert int(vals_t[t, counts[t]:].sum()) == 0

    @pytest.mark.parametrize("sub", [1, 2, 4, 8, 16])
    def test_subtiled_emit_matches_flat(self, pair, sub):
        """Sub-tiled compaction (fewer shift passes, counts/blocks per
        sub-tile unit — benchmarks/subtile_ab): concatenating the unit
        prefixes must reproduce the flat payload exactly, at every
        granularity, with the zero-padding invariant per unit."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=sub,
        )
        assert int(pos) == epos
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        # units really are sub-tiles — unless sub doesn't divide the
        # tile geometry, where the documented silent fallback keeps
        # whole-tile units (here: 72-row tiles, so sub=16 falls back)
        rows = -(-cur.shape[0] // 128)
        from cudavideostream_tpu.ops.logcompact import _tile_geometry

        _, tile_rows = _tile_geometry(rows)
        expect_unit = sub if tile_rows % sub == 0 else tile_rows
        assert xs_t.shape[1] == expect_unit * 128
        # counts ship in the narrowest dtype that fits a unit (the
        # host fetches them every tiled frame — _narrow_counts)
        unit_bytes = expect_unit * 128
        expect_dtype = (np.uint8 if unit_bytes < 256
                        else np.int16 if unit_bytes < 32768 else np.int32)
        assert counts.dtype == expect_dtype
        assert counts.max() <= unit_bytes  # a count never exceeds a unit
        xs = np.concatenate([xs_t[t, : counts[t]] for t in range(len(counts))])
        vals = np.concatenate([vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(xs, exs)
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)
        for t in range(len(counts)):
            assert int(xs_t[t, counts[t]:].sum()) == 0
            assert int(vals_t[t, counts[t]:].sum()) == 0

    def test_pack16_matches_oracle(self, pair):
        """sub_rows=1 int16 shift passes (holes < 128 so the packed
        value fits 15 bits — benchmarks/pack16_ab): byte-exact vs the
        oracle and dtype-invariant vs the int32 path."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        out16 = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pack16=True,
        )
        out32 = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pack16=False,
        )
        for a, b in zip(out16, out32):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        pos, counts, xs_t, vals_t, new_prev = out16
        assert int(pos) == epos
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        xs = np.concatenate([xs_t[t, : counts[t]] for t in range(len(counts))])
        vals = np.concatenate([vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(xs, exs)
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    def test_pack16_int16_ceiling(self):
        """The packed value's true maximum IS int16 max: a row whose
        only change sits in the last lane with delta byte 255
        (cur=255, prev=0 → df=+255) packs 127*256 + 255 = 32767.
        Craft that row, plus all-changed (holes=0) and empty rows, and
        a non-(128*8)-aligned tail; pack16 must stay byte-exact."""
        from cudavideostream_tpu.ops import logcompact

        n = 128 * 11 + 57  # ragged tail exercises internal padding
        prev = np.zeros(n, dtype=np.uint8)
        cur = prev.copy()
        cur[127] = 255            # row 0: holes=127, delta=255 -> 32767
        cur[128:256] = 200        # row 1: all changed, holes=0
        # rows 2-3 empty; row 4: sparse interior pattern
        cur[4 * 128 + 5] = 30
        cur[4 * 128 + 126] = 99
        cur[-1] = 255             # last ragged row's final byte
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pack16=True,
        )
        assert int(pos) == epos
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        xs = np.concatenate([xs_t[t, : counts[t]] for t in range(len(counts))])
        vals = np.concatenate([vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(xs, exs)
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    @pytest.mark.parametrize("density,seed", [(0.01, 1), (0.3, 2), (0.95, 3)])
    def test_pack16_density_fuzz(self, density, seed):
        """pack16 == pack32 == oracle across sparse/mixed/dense scenes
        at an unaligned geometry."""
        from cudavideostream_tpu.ops import logcompact

        rng = np.random.default_rng(seed)
        n = 128 * 40 + 19
        prev = rng.integers(0, 256, n, dtype=np.uint8)
        delta = rng.integers(21, 236, n, dtype=np.uint8)
        chg = rng.random(n) < density
        cur = np.where(chg, (prev.astype(np.int32) + delta) % 256, prev
                       ).astype(np.uint8)
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        for p16 in (True, False):
            pos, counts, xs_t, vals_t, new_prev = (
                logcompact.fused_diff_compact(
                    jnp.asarray(cur), jnp.asarray(prev), interpret=True,
                    emit="tiled", sub_rows=1, pack16=p16,
                ))
            assert int(pos) == epos, p16
            counts = np.asarray(counts)
            xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
            xs = np.concatenate(
                [xs_t[t, : counts[t]] for t in range(len(counts))])
            vals = np.concatenate(
                [vals_t[t, : counts[t]] for t in range(len(counts))])
            np.testing.assert_array_equal(xs, exs)
            np.testing.assert_array_equal(vals, evals)
            np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    @pytest.mark.parametrize("density,seed", [(0.01, 4), (0.3, 5), (0.95, 6)])
    def test_pair_density_fuzz(self, density, seed):
        """Pair-packed lane compaction (two 15-bit row units per int32
        lane; the hardware-realizable successor to pack16 — see
        benchmarks/pack16_ab) == pack32 == oracle across scenes, at an
        unaligned geometry whose tile (48 rows) engages the pair path."""
        from cudavideostream_tpu.ops import logcompact

        rng = np.random.default_rng(seed)
        n = 128 * 40 + 19
        prev = rng.integers(0, 256, n, dtype=np.uint8)
        delta = rng.integers(21, 236, n, dtype=np.uint8)
        chg = rng.random(n) < density
        cur = np.where(chg, (prev.astype(np.int32) + delta) % 256, prev
                       ).astype(np.uint8)
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        base = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pair=False,
        )
        out = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pair=True,
        )
        for a, b in zip(out, base):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        pos, counts, xs_t, vals_t, new_prev = out
        assert int(pos) == epos
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        xs = np.concatenate([xs_t[t, : counts[t]] for t in range(len(counts))])
        vals = np.concatenate(
            [vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(xs, exs)
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    def test_pair_ceiling_scene(self):
        """The 15-bit ceiling (holes=127, delta=255 → 32767) in BOTH
        halves of a paired lane at once, plus all-changed, empty, and
        ragged-tail rows — the bit-mask arithmetic ((t<<16)-t) must not
        smear across halves. Tile is 16 rows here, so rows r and r+8
        share a lane."""
        from cudavideostream_tpu.ops import logcompact

        n = 128 * 11 + 57  # -> 16-row tile, pair engages (H=8 aligned)
        prev = np.zeros(n, dtype=np.uint8)
        cur = prev.copy()
        cur[127] = 255                 # row 0 (lo half): ceiling unit
        cur[8 * 128 + 127] = 255       # row 8 (hi half of the same lane)
        cur[128:256] = 200             # row 1: all changed, holes=0
        cur[9 * 128 + 5] = 30          # row 9: sparse (hi half vs row 1)
        cur[-1] = 255                  # ragged tail byte
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pair=True,
        )
        assert int(pos) == epos
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        xs = np.concatenate([xs_t[t, : counts[t]] for t in range(len(counts))])
        vals = np.concatenate(
            [vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(xs, exs)
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)

    def test_pair_unpaired_tile_falls_back(self, pair):
        """A geometry whose tile rows aren't a multiple of 16 (the
        module fixture's 9216 bytes → 72-row tile) silently ignores
        ``pair`` — outputs identical to the plain sub_rows=1 path."""
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        base = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pair=False,
        )
        out = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=1, pair=True,
        )
        for a, b in zip(out, base):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pair_batched_matches_solo(self, rng):
        """The batched super-frame kernel with pair=True equals B
        independent solo pair calls (and the oracle) per stream."""
        from cudavideostream_tpu.ops import logcompact

        B, n = 3, 128 * 40 + 19
        prevs = [rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
                 for _ in range(B)]
        curs = []
        for p in prevs:
            chg = rng.random(n) < 0.1
            curs.append(np.where(
                chg, (p.astype(np.int32) + 100) % 256, p).astype(np.uint8))
        cur_f = jnp.asarray(np.concatenate(curs))
        prev_f = jnp.asarray(np.concatenate(prevs))
        pos, counts, xs_t, vals_t, new_prev = (
            logcompact.fused_diff_compact_batched(
                cur_f, prev_f, B, interpret=True, sub_rows=1, pair=True,
            ))
        pos = np.asarray(pos)
        counts = np.asarray(counts)
        xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
        new_prev = np.asarray(new_prev)
        for b in range(B):
            epos, exs, evals, eprev = ref.diff_encode(curs[b], prevs[b])
            assert int(pos[b]) == epos
            xs = np.concatenate(
                [xs_t[b, t, : counts[b, t]] for t in range(counts.shape[1])])
            vals = np.concatenate(
                [vals_t[b, t, : counts[b, t]] for t in range(counts.shape[1])])
            np.testing.assert_array_equal(xs, exs)
            np.testing.assert_array_equal(vals, evals)
            np.testing.assert_array_equal(new_prev[b * n:(b + 1) * n], eprev)

    def test_merge_two_stage_matches_serial(self, rng):
        """Past MERGE_SERIAL_MAX_UNITS, merge_tiles switches to the
        pair-compaction kernel + coarse serial merge; the flat payload
        must match the serial DUS-chain merge (and the oracle) exactly."""
        from cudavideostream_tpu.ops import logcompact

        n = 600_000
        prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        cur = np.where(
            rng.random(n) < 0.06,
            (prev.astype(np.int32) + 100) % 256, prev
        ).astype(np.uint8)
        epos, exs, evals, _ = ref.diff_encode(cur, prev)
        pos, counts, xs_t, vals_t, _ = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=8,
        )
        assert counts.shape[0] > logcompact.MERGE_SERIAL_MAX_UNITS
        xs2, vals2 = logcompact._merge_tiles_two_stage(
            counts, xs_t, vals_t, interpret=True
        )
        assert int(pos) == epos
        np.testing.assert_array_equal(np.asarray(xs2)[:epos], exs)
        np.testing.assert_array_equal(np.asarray(vals2)[:epos], evals)
        assert not np.asarray(xs2)[epos:].any()
        assert not np.asarray(vals2)[epos:].any()
        # and the public dispatcher picks it (same bytes)
        xs3, vals3 = logcompact.merge_tiles(counts, xs_t, vals_t)
        np.testing.assert_array_equal(np.asarray(xs3)[:epos], exs)
        np.testing.assert_array_equal(np.asarray(vals3)[:epos], evals)

    def test_subtiled_dense_and_static(self, rng):
        """Worst case (all bytes changed) and no-op frames at sub-tiled
        granularity."""
        from cudavideostream_tpu.ops import logcompact

        n = 9216
        prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        allchg = ((prev.astype(np.int32) + 100) % 256).astype(np.uint8)
        for cur in (allchg, prev.copy()):
            epos, exs, evals, eprev = ref.diff_encode(cur, prev)
            pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
                jnp.asarray(cur), jnp.asarray(prev), interpret=True,
                emit="tiled", sub_rows=8,
            )
            assert int(pos) == epos
            counts = np.asarray(counts)
            fx = (np.concatenate([np.asarray(xs_t)[t, :c]
                                  for t, c in enumerate(counts)])
                  if epos else np.zeros(0, np.int32))
            np.testing.assert_array_equal(fx, exs)
            np.testing.assert_array_equal(np.asarray(new_prev), eprev)


class TestBatchedKernel:
    """fused_diff_compact_batched: B streams in one super-frame grid must
    equal B solo tiled runs bit-for-bit (counts, tile blocks, state)."""

    @pytest.mark.parametrize(
        "B,n",
        [
            (1, 9216), (3, 9216), (2, 9216 + 17),
            # pad-triggering geometries: n whose row count has no
            # divisor in the preferred tile range, so the per-stream
            # 1-D concat padding path runs (a layout regression hid
            # here once — see fused_diff_compact_batched)
            (2, 128 * 401), (4, 1000),
        ],
    )
    def test_matches_solo_and_oracle(self, rng, B, n):
        from cudavideostream_tpu.ops.logcompact import (
            fused_diff_compact,
            fused_diff_compact_batched,
        )

        prev = rng.integers(0, 256, (B, n), dtype=np.uint8)
        cur = prev.copy()
        for b in range(B):
            idx = rng.choice(n, size=n // 7, replace=False)
            cur[b, idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)
        pos, counts, xs_t, vals_t, newp = fused_diff_compact_batched(
            jnp.asarray(cur.reshape(-1)), jnp.asarray(prev.reshape(-1)),
            n_streams=B, interpret=True,
        )
        newp = np.asarray(newp).reshape(B, n)
        for b in range(B):
            sp, sc, sxs, svals, snp = fused_diff_compact(
                jnp.asarray(cur[b]), jnp.asarray(prev[b]),
                interpret=True, emit="tiled",
            )
            assert int(np.asarray(pos)[b]) == int(sp)
            np.testing.assert_array_equal(np.asarray(counts)[b], np.asarray(sc))
            np.testing.assert_array_equal(np.asarray(xs_t)[b], np.asarray(sxs))
            np.testing.assert_array_equal(np.asarray(vals_t)[b], np.asarray(svals))
            np.testing.assert_array_equal(newp[b], np.asarray(snp))
            rpos, rxs, rvals, rnewp = ref.diff_encode(cur[b], prev[b])
            assert int(sp) == rpos
            np.testing.assert_array_equal(newp[b], rnewp)

    def test_flat_shape_required(self, rng):
        from cudavideostream_tpu.ops.logcompact import fused_diff_compact_batched

        with pytest.raises(ValueError, match="flat"):
            fused_diff_compact_batched(
                jnp.zeros((2, 9216), jnp.uint8), jnp.zeros((2, 9216), jnp.uint8),
                n_streams=2, interpret=True,
            )


def test_huge_tile_row_cumsum_fallback(rng):
    """Tiles past 512 rows (forced for frames past ~131 MB, where
    rows/MAX_GRID exceeds the swept tile range) switch the row cumsum
    from the (R, R) MXU matmul — which would not fit VMEM on hardware —
    to Hillis-Steele rolls (_mxu_incl_prefix). Byte-exact either way."""
    from cudavideostream_tpu.ops import logcompact

    n = 2304 * 128  # two 1152-row tiles
    prev = rng.integers(0, 256, n, dtype=np.uint8)
    cur = prev.copy()
    idx = rng.choice(n, size=n // 9, replace=False)
    cur[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)

    orig_pick, orig_pad = logcompact._pick_tile_rows, logcompact._pad_rows
    logcompact._pick_tile_rows = lambda r, target=512: 1152
    logcompact._pad_rows = lambda r: -(-r // 1152) * 1152
    logcompact.fused_diff_compact.clear_cache()
    try:
        pos, xs, vals, newp = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True
        )
    finally:
        logcompact._pick_tile_rows = orig_pick
        logcompact._pad_rows = orig_pad
        logcompact.fused_diff_compact.clear_cache()
    rpos, rxs, rvals, rnewp = ref.diff_encode(cur, prev)
    assert int(pos) == rpos
    np.testing.assert_array_equal(np.asarray(xs)[:rpos], rxs)
    np.testing.assert_array_equal(np.asarray(vals)[:rpos], rvals)
    np.testing.assert_array_equal(np.asarray(newp), rnewp)


def _force_tiles(logcompact, tile_rows):
    """Monkey-patch the tile geometry (restore via the returned tuple)."""
    orig = (logcompact._pick_tile_rows, logcompact._pad_rows)
    logcompact._pick_tile_rows = lambda r, target=512: tile_rows
    logcompact._pad_rows = lambda r, t=tile_rows: -(-r // t) * t
    logcompact.fused_diff_compact.clear_cache()
    return orig


def _restore_tiles(logcompact, orig):
    logcompact._pick_tile_rows, logcompact._pad_rows = orig
    logcompact.fused_diff_compact.clear_cache()


def test_huge_tile_pair_kernel_fallback(rng):
    """The two-stage merge's pair kernel shares _mxu_incl_prefix, so a
    huge-tile geometry (R > 512) takes the roll fallback there too
    instead of building an unbounded (R, R) VMEM matrix."""
    from cudavideostream_tpu.ops import logcompact

    n = 2304 * 128  # two 1152-row tiles after the forced geometry
    vals = np.zeros(n, np.uint8)
    idx = np.sort(rng.choice(n, size=n // 11, replace=False))
    vals[idx] = rng.integers(1, 256, idx.size, dtype=np.uint8)  # never 0
    xs = np.zeros(n, np.int32)
    xs[idx] = idx.astype(np.int32) * 3 + 1  # arbitrary global indices

    orig = _force_tiles(logcompact, 1152)
    try:
        counts, xs_t, vals_t = logcompact._pair_compact(
            jnp.asarray(xs), jnp.asarray(vals), interpret=True
        )
    finally:
        _restore_tiles(logcompact, orig)
    counts = np.asarray(counts)
    xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
    got_xs, got_vals = [], []
    tb = 1152 * 128
    for t in range(counts.size):
        lo, hi = t * tb, (t + 1) * tb
        keep = vals[lo:hi] != 0
        np.testing.assert_array_equal(xs_t[t][: counts[t]], xs[lo:hi][keep])
        np.testing.assert_array_equal(vals_t[t][: counts[t]], vals[lo:hi][keep])
        assert counts[t] == int(keep.sum())
        assert not vals_t[t][counts[t]:].any()


def test_flat_emit_two_stage_crossover(rng):
    """emit="flat" past MERGE_SERIAL_MAX_UNITS units routes through the
    two-stage pair-compaction merge (not a 260+-step serial DUS chain),
    byte-exact vs the oracle."""
    from cudavideostream_tpu.ops import logcompact

    tile = 8
    n_units = logcompact.MERGE_SERIAL_MAX_UNITS + 4
    n = n_units * tile * 128
    prev = rng.integers(0, 256, n, dtype=np.uint8)
    cur = prev.copy()
    idx = rng.choice(n, size=n // 13, replace=False)
    cur[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)

    orig = _force_tiles(logcompact, tile)
    try:
        pos, xs, vals, newp = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True
        )
        pos, xs, vals, newp = (
            int(pos), np.asarray(xs), np.asarray(vals), np.asarray(newp))
    finally:
        _restore_tiles(logcompact, orig)
    rpos, rxs, rvals, rnewp = ref.diff_encode(cur, prev)
    assert pos == rpos
    np.testing.assert_array_equal(xs[:rpos], rxs)
    np.testing.assert_array_equal(vals[:rpos], rvals)
    np.testing.assert_array_equal(newp, rnewp)


def test_subtile_ignored_past_512_rows(rng):
    """Frames whose huge-tile geometry exceeds 512 rows silently drop
    sub-tiling (the block-diagonal (R, R) row matmul is VMEM-unsafe
    there): counts come back at whole-tile granularity, byte-exact."""
    from cudavideostream_tpu.ops import logcompact

    n = 1280 * 128  # two 640-row tiles: inside (512, 1024]
    prev = rng.integers(0, 256, n, dtype=np.uint8)
    cur = prev.copy()
    idx = rng.choice(n, size=n // 9, replace=False)
    cur[idx] = rng.integers(0, 256, idx.size, dtype=np.uint8)

    orig = _force_tiles(logcompact, 640)
    try:
        pos, counts, xs_t, vals_t, newp = logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="tiled", sub_rows=8,
        )
    finally:
        _restore_tiles(logcompact, orig)
    counts = np.asarray(counts)
    assert counts.shape == (2,)  # whole tiles, not 2 * 640/8 sub-tiles
    rpos, rxs, rvals, rnewp = ref.diff_encode(cur, prev)
    assert int(pos) == rpos
    flat_xs, flat_vals = [], []
    tb = 640 * 128
    xs_t, vals_t = np.asarray(xs_t), np.asarray(vals_t)
    for t in range(2):
        flat_xs.append(xs_t[t][: counts[t]])
        flat_vals.append(vals_t[t][: counts[t]])
    np.testing.assert_array_equal(np.concatenate(flat_xs), rxs)
    np.testing.assert_array_equal(np.concatenate(flat_vals), rvals)
    np.testing.assert_array_equal(np.asarray(newp), rnewp)


def test_heatmap_lut_cache_first_populated_under_trace(rng):
    """The LUT caches hold numpy, not jnp: a jnp value cached while the
    FIRST caller was tracing (e.g. the sharded pipeline) would be a
    leaked tracer, and every later eager caller would crash with
    UnexpectedTracerError (the exact ordering bug test_parallel-before-
    test_device_ops exposed)."""
    import jax

    from cudavideostream_tpu.ops import filters

    # simulate a fresh process whose first heatmap call is inside a jit
    saved = (filters._HEATMAP_LUT_PACKED, filters._HEATMAP_LUT_DEV)
    filters._HEATMAP_LUT_PACKED = None
    filters._HEATMAP_LUT_DEV = None
    try:
        n = 6144
        prev = rng.integers(0, 256, n, dtype=np.uint8)
        cur = rng.integers(0, 256, n, dtype=np.uint8)
        jitted = jax.jit(filters.heatmap)(jnp.asarray(cur), jnp.asarray(prev))
        eager = filters.heatmap(jnp.asarray(cur), jnp.asarray(prev))
        np.testing.assert_array_equal(np.asarray(jitted), np.asarray(eager))
        np.testing.assert_array_equal(np.asarray(eager), ref.heatmap(cur, prev))
    finally:
        filters._HEATMAP_LUT_PACKED, filters._HEATMAP_LUT_DEV = saved
