"""End-to-end fused-step tests: device pipeline vs the full-step oracle,
multi-frame streaming with state carry, and client reconstruction."""

import dataclasses

import numpy as np
import pytest

from cudavideostream_tpu.config import CompactionBackend, StreamConfig, Visualizer
from cudavideostream_tpu.models import DeltaStreamPipeline
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.utils import fonts
from tests.conftest import make_frame_pair


def run_match(cfg, n_frames=3, text="FPS: 30 BW: 5 kbps", seed=0):
    rng = np.random.default_rng(seed)
    pipe = DeltaStreamPipeline(cfg)
    base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
    prev_dev = pipe.init_state(base)
    prev_ref = base.copy()
    atlas = pipe.atlas_np
    for t in range(n_frames):
        _, cur = make_frame_pair(rng, cfg.frame_bytes)
        ids = fonts.encode_text(text) if text else []
        exp_prev, exp_pos, exp_xs, exp_vals, exp_aux = ref.step_oracle(
            prev_ref,
            cur,
            cfg,
            atlas=atlas if text else None,
            char_ids=ids,
            conv_weights=pipe.conv_weights,
        )
        prev_dev, pos, xs, vals, aux = pipe.step(prev_dev, cur, text=text)
        pos = int(pos)
        assert pos == exp_pos, f"frame {t}: pos {pos} != {exp_pos}"
        np.testing.assert_array_equal(np.asarray(prev_dev), exp_prev)
        np.testing.assert_array_equal(np.asarray(xs)[:pos], exp_xs)
        np.testing.assert_array_equal(np.asarray(vals)[:pos], exp_vals)
        if exp_aux is None:
            assert aux is None
        else:
            np.testing.assert_array_equal(np.asarray(aux), exp_aux)
        prev_ref = exp_prev
    return pipe


class TestPipelineMatchesOracle:
    def test_default_config(self, small_config):
        run_match(small_config)

    @pytest.mark.parametrize("viz", list(Visualizer))
    def test_all_visualizers(self, small_config, viz):
        cfg = dataclasses.replace(small_config, visualizer=viz)
        run_match(cfg, n_frames=2)

    def test_noise_filter(self, small_config):
        cfg = dataclasses.replace(small_config, noise_filter=True, conv_k=3)
        run_match(cfg, n_frames=2)

    def test_noise_filter_k5(self, small_config):
        cfg = dataclasses.replace(small_config, noise_filter=True, conv_k=5)
        run_match(cfg, n_frames=1)

    @pytest.mark.parametrize("backend", list(CompactionBackend))
    def test_compaction_backends(self, small_config, backend):
        cfg = dataclasses.replace(small_config, compaction=backend)
        run_match(cfg, n_frames=2)

    def test_no_text(self, small_config):
        run_match(small_config, text="")

    def test_no_negative_feedback(self, small_config):
        cfg = dataclasses.replace(small_config, negative_feedback=False)
        run_match(cfg, n_frames=2)

    def test_custom_threshold(self, small_config):
        cfg = dataclasses.replace(small_config, threshold=5)
        run_match(cfg, n_frames=2)


class TestStreaming:
    def test_client_reconstruction_over_stream(self, small_config):
        """The whole product invariant: a client applying every payload to
        the base frame tracks the server's state byte-exactly."""
        rng = np.random.default_rng(9)
        cfg = small_config
        pipe = DeltaStreamPipeline(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        prev = pipe.init_state(base)
        client = base.copy()
        for t in range(5):
            _, cur = make_frame_pair(rng, cfg.frame_bytes)
            prev, pos, xs, vals, _ = pipe.step(prev, cur, text=f"FPS: {t}")
            pos = int(pos)
            client = ref.client_apply(
                client, np.asarray(xs)[:pos], np.asarray(vals)[:pos]
            )
            np.testing.assert_array_equal(client, np.asarray(prev))

    def test_static_scene_ships_nothing(self, small_config):
        rng = np.random.default_rng(3)
        pipe = DeltaStreamPipeline(small_config)
        base = rng.integers(0, 255, small_config.frame_bytes, endpoint=True, dtype=np.uint8)
        prev = pipe.init_state(base)
        prev, pos, *_ = pipe.step(prev, base, text="FPS: 1")
        first = int(pos)  # overlay appears -> some bytes ship
        prev, pos, *_ = pipe.step(prev, base, text="FPS: 1")
        assert int(pos) == 0  # second identical frame+text ships nothing
        assert first > 0


class TestThresholdMap:
    """Per-region sensitivity maps (beyond the reference's global
    #define): byte i ships iff |df_i| > map[i]."""

    @staticmethod
    def make_map(n, rng):
        # insensitive first half (thr 80), hair-trigger second half (thr 2)
        tm = np.full(n, 80, np.uint8)
        tm[n // 2 :] = 2
        return tm

    @pytest.mark.parametrize("backend", list(CompactionBackend))
    def test_matches_oracle_all_backends(self, small_config, backend, rng):
        cfg = dataclasses.replace(small_config, compaction=backend)
        tm = self.make_map(cfg.frame_bytes, rng)
        pipe = DeltaStreamPipeline(cfg, threshold_map=tm)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        prev_dev = pipe.init_state(base)
        prev_ref = base.copy()
        for t in range(2):
            _, cur = make_frame_pair(rng, cfg.frame_bytes)
            exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
                prev_ref, cur, cfg, atlas=pipe.atlas_np,
                char_ids=fonts.encode_text("FPS: 1"), threshold_map=tm,
            )
            prev_dev, pos, xs, vals, _ = pipe.step(prev_dev, cur, text="FPS: 1")
            pos = int(pos)
            assert pos == exp_pos
            np.testing.assert_array_equal(np.asarray(prev_dev), exp_prev)
            np.testing.assert_array_equal(np.asarray(xs)[:pos], exp_xs)
            np.testing.assert_array_equal(np.asarray(vals)[:pos], exp_vals)
            prev_ref = exp_prev

    def test_tiled_emit_with_map(self, small_config, rng):
        from cudavideostream_tpu.runtime import wire
        from cudavideostream_tpu.runtime.executor import StreamExecutor

        cfg = dataclasses.replace(small_config, tiled_payload=True)
        tm = self.make_map(cfg.frame_bytes, rng)
        ex = StreamExecutor(cfg, pipeline=DeltaStreamPipeline(cfg, threshold_map=tm))
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        ex.start(base)
        _, cur = make_frame_pair(rng, cfg.frame_bytes)
        pos, payload, _, _ = ex.process(cur)
        assert isinstance(payload, wire.TiledPayload)
        exp_pos, exp_xs, exp_vals, _ = ref.diff_encode(cur, base, tm)
        assert pos == exp_pos
        fx, fv = payload.to_flat()
        np.testing.assert_array_equal(fx, exp_xs)
        np.testing.assert_array_equal(fv, exp_vals)

    def test_red_mode_with_zero_threshold_region(self, small_config, rng):
        """A map containing zeros defeats the negfeed mask shortcut; the
        explicit diff branch must engage and stay byte-exact."""
        cfg = dataclasses.replace(
            small_config, visualizer=Visualizer.RED_BLACK
        )
        tm = self.make_map(cfg.frame_bytes, rng)
        tm[:100] = 0
        pipe = DeltaStreamPipeline(cfg, threshold_map=tm)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
        prev_dev = pipe.init_state(base)
        _, cur = make_frame_pair(rng, cfg.frame_bytes)
        exp_prev, exp_pos, exp_xs, exp_vals, exp_aux = ref.step_oracle(
            base, cur, cfg, threshold_map=tm,
        )
        prev_dev, pos, xs, vals, aux = pipe.step(prev_dev, cur, text="")
        assert int(pos) == exp_pos
        np.testing.assert_array_equal(np.asarray(aux), exp_aux)

    def test_bad_map_size_rejected(self, small_config):
        with pytest.raises(ValueError):
            DeltaStreamPipeline(small_config, threshold_map=np.zeros(7, np.uint8))


def test_pair_lanes_product_path(rng):
    """The default product step at a geometry whose tile ENGAGES the
    pair-packed pass loop (config.pair_lanes=True is the shipping
    default), with the two features that ride the same kernel — overlay
    text and a per-byte threshold map — active at once. The standard
    48x64 fixture's 72-row tile silently demotes pair, so without this
    pin the default-on product path would only ever run on hardware."""
    from cudavideostream_tpu.ops import logcompact
    from cudavideostream_tpu.runtime import wire
    from cudavideostream_tpu.runtime.executor import StreamExecutor

    cfg = StreamConfig(height=64, width=64, overlay_scale=4,
                       tiled_payload=True)
    assert cfg.pair_lanes
    rows = -(-cfg.frame_bytes // 128)
    _, tile_rows = logcompact._tile_geometry(rows)
    assert tile_rows % 16 == 0, "geometry must engage the pair path"

    tm = np.full(cfg.frame_bytes, 80, np.uint8)
    tm[cfg.frame_bytes // 2:] = 2
    pipe = DeltaStreamPipeline(cfg, threshold_map=tm)
    ex = StreamExecutor(cfg, pipeline=pipe)
    base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
    ex.start(base)
    prev_ref = base.copy()
    for t in range(2):
        _, cur = make_frame_pair(rng, cfg.frame_bytes)
        text = f"FPS: {30 + t}"
        pos, payload, _, _ = ex.process(cur, text=text)
        exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
            prev_ref, cur, cfg, atlas=pipe.atlas_np,
            char_ids=fonts.encode_text(text), threshold_map=tm,
        )
        assert isinstance(payload, wire.TiledPayload)
        assert pos == exp_pos
        fx, fv = payload.to_flat()
        np.testing.assert_array_equal(fx, exp_xs)
        np.testing.assert_array_equal(fv, exp_vals)
        prev_ref = exp_prev


def test_red_mode_without_negative_feedback(small_config):
    """The mask cannot be derived from the state update when negative
    feedback is off (new_prev == cur); the explicit diff branch must
    produce identical aux output."""
    import dataclasses

    cfg = dataclasses.replace(
        small_config,
        visualizer=Visualizer.RED_OVERLAP,
        negative_feedback=False,
    )
    run_match(cfg, n_frames=2)


class TestBatchedPipeline:
    """B independent streams in one jitted step must equal B solo
    pipelines byte-for-byte (it's the same step under vmap)."""

    def run_both(self, cfg, B=3, n_frames=2, tiled=False, expect_fast=None,
                 threshold_map=None):
        from cudavideostream_tpu.models import BatchedDeltaPipeline

        rng = np.random.default_rng(17)
        bases = rng.integers(
            0, 255, (B, cfg.frame_bytes), endpoint=True, dtype=np.uint8
        )
        texts = [f"FPS: {10 * b}" for b in range(B)]
        batched = BatchedDeltaPipeline(cfg, B, threshold_map=threshold_map)
        if expect_fast is not None:
            assert batched._fast == expect_fast
        state = batched.init_state(bases)
        solos = [
            DeltaStreamPipeline(cfg, threshold_map=threshold_map)
            for _ in range(B)
        ]
        solo_states = [solos[b].init_state(bases[b]) for b in range(B)]
        for t in range(n_frames):
            frames = np.stack(
                [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(B)]
            )
            out = batched.step(state, frames, texts)
            state = out[0]
            for b in range(B):
                solo = solos[b].step(solo_states[b], frames[b], text=texts[b])
                solo_states[b] = solo[0]
                np.testing.assert_array_equal(
                    np.asarray(state).reshape(B, -1)[b],
                    np.asarray(solo_states[b]),
                )
                if tiled:
                    _, pos, counts, xs_t, vals_t, aux = out
                    _, spos, scounts, sxs_t, svals_t, saux = solo
                    assert int(pos[b]) == int(spos)
                    np.testing.assert_array_equal(
                        np.asarray(xs_t)[b], np.asarray(sxs_t)
                    )
                    np.testing.assert_array_equal(
                        np.asarray(vals_t)[b], np.asarray(svals_t)
                    )
                else:
                    _, pos, xs, vals, aux = out
                    _, spos, sxs, svals, saux = solo
                    assert int(pos[b]) == int(spos)
                    np.testing.assert_array_equal(
                        np.asarray(xs)[b], np.asarray(sxs)
                    )
                    np.testing.assert_array_equal(
                        np.asarray(vals)[b], np.asarray(svals)
                    )
                if saux is None:
                    assert aux is None
                else:
                    # batched aux is FLAT (B*n,): reshape host-side
                    np.testing.assert_array_equal(
                        np.asarray(aux).reshape(B, -1)[b], np.asarray(saux)
                    )

    def test_flat_matches_solo(self, small_config):
        self.run_both(small_config)

    def test_tiled_matches_solo(self, small_config):
        self.run_both(
            dataclasses.replace(small_config, tiled_payload=True), tiled=True
        )

    @pytest.mark.parametrize("vis", [
        Visualizer.HEATMAP, Visualizer.BINARIZE, Visualizer.RED_OVERLAP,
    ])
    def test_tiled_visualizer_rides_fast_path(self, small_config, vis):
        """Visualizers no longer demote the super-frame fast path: the
        elementwise ones ride the flat super-frame, binarize's histogram
        runs per stream — all byte-exact vs solo pipelines."""
        self.run_both(
            dataclasses.replace(
                small_config, tiled_payload=True, visualizer=vis
            ),
            tiled=True, expect_fast=True,
        )

    def test_tiled_noise_filter_rides_fast_path(self, small_config):
        self.run_both(
            dataclasses.replace(
                small_config, tiled_payload=True, noise_filter=True
            ),
            tiled=True, expect_fast=True,
        )

    def test_red_fallback_negfeed_off_fast(self, small_config):
        """The red visualizers' diff_mask fallback (negative_feedback
        off disables the new_prev != prev shortcut) on the fast path,
        byte-exact vs solo."""
        self.run_both(
            dataclasses.replace(
                small_config, tiled_payload=True, negative_feedback=False,
                visualizer=Visualizer.RED_BLACK,
            ),
            tiled=True, expect_fast=True,
        )

    def test_red_fallback_threshold_map_fast(self, small_config):
        """threshold_map with min 0 also forces the diff_mask fallback —
        and exercises the per-stream map concat (batched.py) — on the
        fast path, byte-exact vs solo."""
        tm = np.zeros(small_config.frame_bytes, np.uint8)
        tm[: small_config.frame_bytes // 2] = 30  # mixed sensitivities
        self.run_both(
            dataclasses.replace(
                small_config, tiled_payload=True,
                visualizer=Visualizer.RED_OVERLAP,
            ),
            tiled=True, expect_fast=True, threshold_map=tm,
        )

    def test_tiled_noise_filter_plus_binarize_fast(self, small_config):
        self.run_both(
            dataclasses.replace(
                small_config, tiled_payload=True, noise_filter=True,
                visualizer=Visualizer.BINARIZE,
            ),
            tiled=True, expect_fast=True,
        )

    def test_chunked_past_grid_bound_matches_solo(self, small_config,
                                                  monkeypatch):
        """B * tiles_per_stream past MAX_GRID splits into several
        super-frame pallas calls instead of dropping to the vmap path.
        MAX_GRID is patched down so a small batch actually chunks."""
        import cudavideostream_tpu.models.batched as batched_mod
        from cudavideostream_tpu.models import BatchedDeltaPipeline
        from cudavideostream_tpu.ops import logcompact

        monkeypatch.setattr(logcompact, "MAX_GRID", 2)
        cfg = dataclasses.replace(small_config, tiled_payload=True)
        pipe = BatchedDeltaPipeline(cfg, 5)
        assert pipe._fast and pipe._chunk_streams == 2  # 3 kernel calls
        self.run_both(cfg, B=5, tiled=True, expect_fast=True)

    def test_visualizer_aux_batched(self, small_config):
        from cudavideostream_tpu.models import BatchedDeltaPipeline

        cfg = dataclasses.replace(small_config, visualizer=Visualizer.HEATMAP)
        rng = np.random.default_rng(2)
        B = 2
        bases = rng.integers(0, 255, (B, cfg.frame_bytes), endpoint=True, dtype=np.uint8)
        pipe = BatchedDeltaPipeline(cfg, B)
        state = pipe.init_state(bases)
        frames = np.stack(
            [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(B)]
        )
        state, pos, xs, vals, aux = pipe.step(state, frames)
        assert aux.shape == (B * cfg.frame_bytes,)  # flat: see step()
        aux = np.asarray(aux).reshape(B, cfg.frame_bytes)
        for b in range(B):
            _, _, _, _, exp_aux = ref.step_oracle(bases[b], frames[b], cfg)
            np.testing.assert_array_equal(aux[b], exp_aux)

    def test_host_backend_rejected(self, small_config):
        from cudavideostream_tpu.config import CompactionBackend
        from cudavideostream_tpu.models import BatchedDeltaPipeline

        cfg = dataclasses.replace(
            small_config, compaction=CompactionBackend.HOST
        )
        with pytest.raises(ValueError):
            BatchedDeltaPipeline(cfg, 2)


def test_batched_fast_path_respects_grid_bound():
    """The super-frame grid must stay under the ~2000-step SMEM
    counts-window bound (a hardware-only failure CPU tests can't see):
    larger batches stay on the fast path but CHUNK into several kernel
    calls of at most _chunk_streams streams, and the kernel wrapper
    itself must refuse an oversized grid loudly."""
    import jax.numpy as jnp

    from cudavideostream_tpu.models import BatchedDeltaPipeline
    from cudavideostream_tpu.ops.logcompact import (
        MAX_GRID,
        fused_diff_compact_batched,
    )

    from cudavideostream_tpu.ops.logcompact import _tile_geometry

    cfg = StreamConfig(tiled_payload=True)
    rows, tile = _tile_geometry(-(-cfg.frame_bytes // 128))
    tps = rows // tile
    b_max = MAX_GRID // tps
    assert BatchedDeltaPipeline(cfg, b_max)._fast
    over = BatchedDeltaPipeline(cfg, b_max + 1)
    assert over._fast and over._chunk_streams == b_max
    B = b_max + 1
    with pytest.raises(ValueError, match="SMEM"):
        fused_diff_compact_batched(
            jnp.zeros(B * cfg.frame_bytes, jnp.uint8),
            jnp.zeros(B * cfg.frame_bytes, jnp.uint8),
            n_streams=B, interpret=True,
        )


def test_device_resident_frame_identical(small_config):
    """A jax-array frame takes the no-download path in pipe.step and
    must produce the identical payload/state as the numpy frame."""
    import jax.numpy as jnp

    from cudavideostream_tpu.models import DeltaStreamPipeline

    rng = np.random.default_rng(21)
    base = rng.integers(0, 255, small_config.frame_bytes, endpoint=True,
                        dtype=np.uint8)
    f1 = rng.integers(0, 255, small_config.frame_bytes, endpoint=True,
                      dtype=np.uint8)
    pipe_a = DeltaStreamPipeline(small_config)
    pipe_b = DeltaStreamPipeline(small_config)
    sa = pipe_a.init_state(base)
    sb = pipe_b.init_state(base)
    out_a = pipe_a.step(sa, f1, text="FPS: 3")
    out_b = pipe_b.step(sb, jnp.asarray(f1), text="FPS: 3")
    assert int(out_a[1]) == int(out_b[1])
    np.testing.assert_array_equal(np.asarray(out_a[0]), np.asarray(out_b[0]))
    np.testing.assert_array_equal(np.asarray(out_a[2]), np.asarray(out_b[2]))
    np.testing.assert_array_equal(np.asarray(out_a[3]), np.asarray(out_b[3]))
