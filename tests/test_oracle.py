"""Property and micro-case tests for the golden CPU reference.

The oracle is the spec; these tests pin its behavior with hand-computed
cases (threshold boundaries, uint8 wraparound, tie-breaking) and the
system-level invariant the whole product rests on: applying the payload
to the client's frame reproduces the server's reconstruction byte-exactly.
"""

import numpy as np
import pytest

from cudavideostream_tpu.ops import reference_cpu as ref
from tests.conftest import make_frame_pair


class TestDiffEncode:
    def test_threshold_boundary(self):
        # |df| must be STRICTLY greater than threshold to ship
        # (kernels.cu:312: df < -T || df > T).
        prev = np.array([100, 100, 100, 100], dtype=np.uint8)
        cur = np.array([120, 121, 79, 80], dtype=np.uint8)  # df: 20,21,-21,-20
        pos, xs, vals, new_prev = ref.diff_encode(cur, prev, threshold=20)
        assert pos == 2
        assert xs.tolist() == [1, 2]
        assert vals.tolist() == [21, (-21) % 256]
        # negative feedback: sub-threshold bytes revert to previous
        assert new_prev.tolist() == [100, 121, 79, 100]

    def test_wraparound_delta(self):
        prev = np.array([250, 5], dtype=np.uint8)
        cur = np.array([5, 250], dtype=np.uint8)  # df: -245, +245
        pos, xs, vals, new_prev = ref.diff_encode(cur, prev, threshold=20)
        assert pos == 2
        assert vals.tolist() == [11, 245]
        rec = ref.client_apply(prev, xs, vals)
        assert rec.tolist() == cur.tolist()

    def test_client_reproduces_reconstruction(self, rng):
        prev, cur = make_frame_pair(rng, 4096)
        pos, xs, vals, new_prev = ref.diff_encode(cur, prev)
        assert ref.client_apply(prev, xs, vals).tolist() == new_prev.tolist()

    def test_reconstruction_within_threshold_of_truth(self, rng):
        # The reconstruction never strays more than `threshold` from the
        # real frame — the product's visual-fidelity guarantee.
        prev, cur = make_frame_pair(rng, 4096)
        _, _, _, new_prev = ref.diff_encode(cur, prev, threshold=20)
        err = np.abs(new_prev.astype(np.int32) - cur.astype(np.int32))
        assert int(err.max()) <= 20

    def test_negative_feedback_accumulates_drift(self):
        # A +15/frame ramp is invisible per-frame but must ship once the
        # accumulated delta vs the client's value crosses the threshold
        # (the drift artifact report.tex:271-306 exists to prevent).
        prev = np.array([100], dtype=np.uint8)
        sent = []
        for stepi in range(1, 4):
            cur = np.array([100 + 15 * stepi], dtype=np.uint8)
            pos, xs, vals, prev = ref.diff_encode(cur, prev, threshold=20)
            sent.append(pos)
        # frame1: df=15 (hold), frame2: df=30 (ship), frame3: df=15 (hold)
        assert sent == [0, 1, 0]
        assert prev.tolist() == [130]

    def test_no_feedback_mode(self):
        prev = np.array([100], dtype=np.uint8)
        cur = np.array([110], dtype=np.uint8)
        _, _, _, new_prev = ref.diff_encode(cur, prev, negative_feedback=False)
        assert new_prev.tolist() == [110]

    def test_all_and_none_changed(self, rng):
        prev = rng.integers(0, 255, 256, endpoint=True, dtype=np.uint8)
        pos, xs, vals, new_prev = ref.diff_encode(prev, prev)
        assert pos == 0 and new_prev.tolist() == prev.tolist()
        cur = ((prev.astype(np.int32) + 128) % 256).astype(np.uint8)
        pos, xs, vals, new_prev = ref.diff_encode(cur, prev)
        assert pos == 256
        assert ref.client_apply(prev, xs, vals).tolist() == cur.tolist()

    def test_payload_order_ascending(self, rng):
        prev, cur = make_frame_pair(rng, 4096)
        _, xs, _, _ = ref.diff_encode(cur, prev)
        assert np.all(np.diff(xs) > 0)


class TestGrayscale:
    def test_average_exact(self):
        f = np.array([10, 20, 31], dtype=np.uint8)  # sum 61 // 3 = 20
        assert ref.grayscale_average(f).tolist() == [20, 20, 20]

    def test_weighted_bgr_weights(self):
        # pure B pixel: 114*255//1000 = 29
        assert ref.grayscale_weighted(np.array([255, 0, 0], np.uint8)).tolist() == [29] * 3
        # pure G: 587*255//1000 = 149
        assert ref.grayscale_weighted(np.array([0, 255, 0], np.uint8)).tolist() == [149] * 3
        # pure R: 299*255//1000 = 76
        assert ref.grayscale_weighted(np.array([0, 0, 255], np.uint8)).tolist() == [76] * 3

    def test_all_channels_equal(self, rng):
        f = rng.integers(0, 255, 3 * 1000, endpoint=True, dtype=np.uint8)
        for fn in (ref.grayscale_average, ref.grayscale_weighted):
            g = fn(f).reshape(-1, 3)
            assert np.all(g[:, 0] == g[:, 1]) and np.all(g[:, 1] == g[:, 2])


class TestBinarization:
    def test_histogram_counts_pixels(self, rng):
        f = rng.integers(0, 255, 3 * 500, endpoint=True, dtype=np.uint8)
        g = ref.grayscale_average(f)
        h = ref.gray_histogram(g)
        assert h.sum() == 500
        assert h[g[0]] >= 1

    def test_top2_later_index_wins_ties(self):
        h = np.zeros(256, dtype=np.int64)
        h[10] = 5
        h[30] = 5  # tie: later index takes max, 10 becomes runner-up
        imax, isec = ref.top2_scan(h)
        assert (imax, isec) == (30, 10)

    def test_top2_distinct(self):
        h = np.zeros(256, dtype=np.int64)
        h[200] = 9
        h[100] = 7
        # scan order: i=100 first becomes max; i=200 displaces it.
        assert ref.top2_scan(h) == (200, 100)

    def test_threshold_clamps(self):
        h = np.zeros(256, dtype=np.int64)
        h[0] = 10
        h[4] = 9
        assert ref.binarize_threshold(h) == 50  # (0+4)/2=2 -> clamp 50
        h = np.zeros(256, dtype=np.int64)
        h[255] = 10
        h[251] = 9
        assert ref.binarize_threshold(h) == 200  # 253 -> clamp 200

    def test_threshold_degenerate_single_bin(self):
        # All mass in bin 0: isec=-1, C trunc((0-1)/2)=0 -> clamp 50.
        h = np.zeros(256, dtype=np.int64)
        h[0] = 100
        assert ref.binarize_threshold(h) == 50

    def test_binarize_strictly_greater(self):
        g = np.array([50, 51, 49], dtype=np.uint8)
        assert ref.binarize(g, 50).tolist() == [0, 255, 0]

    def test_pipeline_output_binary(self, rng):
        f = rng.integers(0, 255, 3 * 2000, endpoint=True, dtype=np.uint8)
        out = ref.binarize_pipeline(f)
        assert set(np.unique(out)).issubset({0, 255})


class TestHeatmap:
    def test_lut_endpoints(self):
        lut = ref.heatmap_lut()
        assert lut.shape == (766, 3)
        # d=0: b=sin(pi/2)=1 -> 255, g=0, r=sin(-pi/2)<0 -> 0
        assert lut[0].tolist() == [255, 0, 0]
        # d=255 (midpoint): g=sin(pi/2)=255 dominates
        assert lut[255][1] == 255
        # d=510: r=sin(pi/2)->255, b clamped 0
        assert lut[510].tolist() == [0, 0, 255]

    def test_heatmap_static_frame_is_blue(self):
        f = np.arange(30, dtype=np.uint8)
        out = ref.heatmap(f, f).reshape(-1, 3)
        assert np.all(out == [255, 0, 0])  # BGR blue


class TestRedVisualizers:
    def test_red_black_marks_r_channel(self):
        xs = np.array([0, 4, 8], dtype=np.int32)  # pixels 0,1,2 (any channel)
        out = ref.red_black(xs, 12).reshape(-1, 3)
        assert out[:, 2].tolist() == [255, 255, 255, 0]
        assert out[:, 0].sum() == 0 and out[:, 1].sum() == 0

    def test_red_overlap_preserves_rest(self, rng):
        prev = rng.integers(0, 255, 30, endpoint=True, dtype=np.uint8)
        xs = np.array([3], dtype=np.int32)  # pixel 1
        out = ref.red_overlap(prev, xs)
        expect = prev.copy()
        expect[5] = 255
        assert out.tolist() == expect.tolist()


class TestConvolution:
    def test_gaussian_kernel_normalized(self):
        for k in (3, 4, 5, 7, 9):
            w = ref.gaussian_kernel(k)
            assert abs(w.sum() - 1.0) < 1e-12
            assert w.shape == (k, k)

    def test_identity_kernel(self, rng):
        f = rng.integers(0, 255, 8 * 8 * 3, endpoint=True, dtype=np.uint8)
        w = np.zeros((3, 3))
        w[1, 1] = 1.0
        assert ref.convolve(f, w, 8, 8).tolist() == f.tolist()

    def test_mean_matches_float_within_1(self, rng):
        h, w = 16, 24
        f = rng.integers(0, 255, h * w * 3, endpoint=True, dtype=np.uint8)
        out = ref.convolve(f, ref.mean_kernel(3), h, w)
        # float64 zero-padded reference
        img = f.reshape(h, w, 3).astype(np.float64)
        pad = np.zeros((h + 2, w + 2, 3))
        pad[1:-1, 1:-1] = img
        acc = sum(
            pad[i : i + h, j : j + w] / 9.0 for i in range(3) for j in range(3)
        )
        diff = np.abs(out.astype(np.int32) - acc.astype(np.int32).ravel())
        assert int(diff.max()) <= 1

    def test_zero_padding_darkens_border(self):
        f = np.full(6 * 6 * 3, 255, dtype=np.uint8)
        out = ref.convolve(f, ref.mean_kernel(3), 6, 6).reshape(6, 6, 3)
        assert out[0, 0, 0] < out[3, 3, 0]

    def test_median_filter(self):
        # 3x3 image, single channel replicated; median of corner window
        # (4 zeros padding + 4 values + center) picks the middle.
        f = np.repeat(np.arange(9, dtype=np.uint8) * 10, 3)
        out = ref.median_filter(f, 3, 3, 3).reshape(3, 3, 3)
        # center pixel: window = 0..80, median = 40
        assert out[1, 1, 0] == 40


class TestOverlay:
    def test_blit_overwrites_cell(self, rng):
        from cudavideostream_tpu.utils import fonts

        atlas = fonts.make_atlas(scale=2)
        h, w = 32, 64
        f = rng.integers(0, 255, h * w * 3, endpoint=True, dtype=np.uint8)
        ids = fonts.encode_text("F:1")
        out = ref.overlay_blit(f, atlas, ids, h, w).reshape(h, w, 3)
        ch, cw = atlas.shape[1], atlas.shape[2]
        for j, cid in enumerate(ids):
            np.testing.assert_array_equal(out[0:ch, j * cw : (j + 1) * cw], atlas[cid])
        # outside the text band the frame is untouched
        np.testing.assert_array_equal(
            out[ch:, :], f.reshape(h, w, 3)[ch:, :]
        )


class TestStepOracle:
    @pytest.mark.parametrize("viz", [0, 1, 2, 3, 4, 5])
    def test_modes_run_and_reconstruct(self, rng, viz, small_config):
        import dataclasses

        from cudavideostream_tpu.config import Visualizer

        cfg = dataclasses.replace(small_config, visualizer=Visualizer(viz))
        prev, cur = make_frame_pair(rng, cfg.frame_bytes)
        new_prev, pos, xs, vals, aux = ref.step_oracle(prev, cur, cfg)
        assert ref.client_apply(prev, xs, vals).tolist() == new_prev.tolist()
        if viz == 0:
            assert aux is None
        else:
            assert aux.shape == (cfg.frame_bytes,)
