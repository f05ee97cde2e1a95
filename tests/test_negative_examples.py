"""Negative examples kept in-tree, the way the reference keeps its
race-condition histogram kernel as a teaching artifact
(``tests/binarization/histogram/gpu-v1.cu:25-36``, report.tex:3235).

These tests *demonstrate why rejected designs fail*, pinning the design
arguments made in the accepted kernels' docstrings.
"""

import numpy as np

from cudavideostream_tpu.ops import reference_cpu as ref


class TestShiftCompactionBitOrderMatters:
    """Per-element bit-serial shift compaction is collision-free iff the
    gap bits are processed LSB-first. MSB-first collides on the minimal
    case below — the proof for LSB-first (holes are monotone, so a
    collision at bit b would force holes_j < holes_i for j > i) is the
    correctness foundation of logcompact's v2 scheme."""

    @staticmethod
    def lane_sim(mask, order):
        n = len(mask)
        holes = np.cumsum(~mask) - (~mask)
        lanes = [(i, int(holes[i])) if mask[i] else None for i in range(n)]
        maxb = max(1, int(holes.max(initial=0)).bit_length())
        bits = range(maxb) if order == "lsb" else range(maxb - 1, -1, -1)
        for b in bits:
            new = [None] * n
            for l in range(n):
                src = l + (1 << b)
                incoming = (
                    src < n and lanes[src] is not None
                    and (lanes[src][1] >> b) & 1
                )
                staying = lanes[l] is not None and not ((lanes[l][1] >> b) & 1)
                if incoming and staying:
                    return "collision"
                new[l] = lanes[src] if incoming else (lanes[l] if staying else None)
            lanes = new
        got = [lanes[k][0] if lanes[k] else None for k in range(int(mask.sum()))]
        return got == [i for i in range(n) if mask[i]]

    def test_msb_first_collides(self):
        # holes: elem1 -> 1 (bit1 clear), elem3 -> 2 (bit1 set). MSB
        # first moves elem3 onto elem1 before elem1 has vacated.
        mask = np.array([0, 1, 0, 1], bool)
        assert self.lane_sim(mask, "msb") == "collision"
        assert self.lane_sim(mask, "lsb") is True

    def test_lsb_first_exhaustive(self):
        import itertools

        for n in range(2, 11):
            for bits in itertools.product([0, 1], repeat=n):
                m = np.array(bits, bool)
                if m.sum():
                    assert self.lane_sim(m, "lsb") is True, bits

    def test_shipped_kernel_handles_the_same_case(self):
        """The oracle (and therefore the shipped kernel, which is tested
        byte-exact against it) compacts this case correctly."""
        prev = np.array([0, 0, 0, 0], np.uint8)
        cur = np.array([0, 100, 0, 100], np.uint8)
        pos, xs, vals, _ = ref.diff_encode(cur, prev)
        assert pos == 2
        assert xs.tolist() == [1, 3]


class TestNondeterministicOrderRejected:
    def test_order_matters_for_byte_identity(self):
        """The reference's atomicInc payload order varies run to run; two
        permutations of the same payload are different *bytes on the
        wire* even though clients decode them identically. The framework
        mandates ascending order so streams are reproducible."""
        from cudavideostream_tpu.runtime import wire

        xs = np.array([5, 9], np.int32)
        vals = np.array([1, 2], np.uint8)
        a = wire.pack_payload(2, xs, vals)
        b = wire.pack_payload(2, xs[::-1].copy(), vals[::-1].copy())
        assert a != b  # byte-identity needs a canonical order
        # but both decode to the same frame
        f1 = ref.client_apply(np.zeros(16, np.uint8), xs, vals)
        f2 = ref.client_apply(np.zeros(16, np.uint8), xs[::-1], vals[::-1])
        np.testing.assert_array_equal(f1, f2)


class TestFloatConvRejected:
    def test_float32_accumulation_flips_the_truncated_byte(self):
        """Why conv weights are Q16 fixed-point: float32 accumulation
        order changes the *truncated output byte* on real inputs, so a
        float spec cannot be bit-stable across compilers that reassociate
        or fuse. The pixel window below is a concrete 3x3 neighborhood
        (found by search over uint8 windows) where forward and reverse
        summation of the very same Gaussian-weighted terms straddle an
        integer boundary: 137.99998 vs 138.0."""
        w = ref.gaussian_kernel(3).astype(np.float32).ravel()
        px = np.array(
            [182, 91, 145, 10, 179, 222, 59, 181, 162], np.float32
        )
        terms = w * px
        fwd = np.float32(0)
        for a in terms:
            fwd = np.float32(fwd + a)
        rev = np.float32(0)
        for a in terms[::-1]:
            rev = np.float32(rev + a)
        assert int(fwd) != int(rev), (fwd, rev)  # different output BYTES

        # the shipped Q16 path is exactly associative on the same window
        q = ref.quantize_kernel_q16(ref.gaussian_kernel(3)).ravel()
        ipx = px.astype(np.int64)
        acc1 = int(np.sum(q * ipx))
        acc2 = int(np.sum((q * ipx)[::-1]))
        assert acc1 == acc2  # integer math: any order, same bytes
