"""Depth-K batched payload landing (TiledLander.land_fused_many +
BatchedLandExecutor + server --land-batch).

The hardware motivation is benchmarks/loopback_tpu_tunnel: at 1080p the
landing was one ~30 ms link round trip PER FRAME; batching K frames per
``device_get`` divides that latency by K — the rebuild's analogue of the
reference's ring of six in-flight pinned buffers (threads.cpp:84-106).
Every test is byte-exact vs the CPU reference oracle: the batching and
the narrow flat merged emit must never change a single wire byte.
"""

import dataclasses
import threading

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.client import DeltaStreamClient
from cudavideostream_tpu.runtime.executor import (
    BatchedLandExecutor,
    StreamExecutor,
    TiledLander,
)
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource


def _cfg(**kw):
    # 96x128x3 = 36864 bytes = 288 units of 128 at sub_rows=1: larger
    # than TiledLander.RANGE_MIN so the speculative window genuinely
    # slides (see TestLanderRangeFetch for the same choice)
    base = dict(height=96, width=128, overlay_scale=4,
                tiled_payload=True, fetch_mode="tiles")
    base.update(kw)
    return StreamConfig(**base)


def _band_frame(base, start, width, delta):
    f = base.copy()
    end = min(start + width, f.size)
    f[start:end] += np.uint8(delta)
    return f


def _check(results, frames, prev):
    """Assert landed results byte-equal the reference encode, frame by
    frame; returns the advanced reference prev."""
    assert len(results) == len(frames)
    for (pos, xs, vals, _aux), frame in zip(results, frames):
        pr, xr, vr, prev = ref.diff_encode(frame, prev)
        assert pos == pr
        if isinstance(xs, wire.TiledPayload):
            fx, fv = xs.to_flat()
        else:
            fx, fv = xs, vals
        np.testing.assert_array_equal(fx, xr)
        np.testing.assert_array_equal(fv, vr)
    return prev


class TestBatchedLandExecutor:
    @pytest.mark.parametrize("fetch_mode", ["tiles", "flat", "auto"])
    def test_drift_cut_and_empty_byte_exact(self, rng, fetch_mode):
        """Depth-4 batches across a drifting band, a scene cut (window
        miss), an EMPTY frame, and a density burst — every landed frame
        byte-equals the CPU reference."""
        cfg = _cfg(fetch_mode=fetch_mode)
        ex = BatchedLandExecutor(cfg, depth=4)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()

        scripted = []
        start = 0
        for k in range(9):           # two full batches + one queued
            scripted.append(_band_frame(base, start, 3000, 60 + k))
            start += 1200
        scripted.append(scripted[-1].copy())               # EMPTY frame
        scripted.append(_band_frame(base, cfg.frame_bytes - 6000, 5000, 90))
        scripted.append(rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                                     dtype=np.uint8))      # density burst
        scripted.append(_band_frame(base, 2000, 2600, 33)) # sub-depth tail

        pending = []
        for frame in scripted:
            out = ex.process(frame)
            pending.append(frame)
            if out is not None:
                assert isinstance(out, list) and len(out) == 4
                prev = _check(out, pending[:4], prev)
                pending = pending[4:]
        tail = ex.flush()
        assert ex.flush() is None          # queue drained
        prev = _check(tail, pending, prev)
        # the device state agrees with the oracle's prev after all that
        np.testing.assert_array_equal(ex.resync(), prev)

    def test_depth1_matches_solo_executor(self, rng):
        """depth=1 is the solo landing wrapped in a list."""
        cfg = _cfg()
        bat = BatchedLandExecutor(cfg, depth=1)
        solo = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        bat.start(base)
        solo.start(base)
        for k in range(4):
            frame = _band_frame(base, 700 * k, 2500, 40 + k)
            (bp, bxs, bvals, _), = bat.process(frame)
            sp, sxs, svals, _ = solo.process(frame)
            assert bp == sp
            bf = bxs.to_flat() if isinstance(bxs, wire.TiledPayload) \
                else (bxs, bvals)
            sf = sxs.to_flat() if isinstance(sxs, wire.TiledPayload) \
                else (sxs, svals)
            np.testing.assert_array_equal(bf[0], sf[0])
            np.testing.assert_array_equal(bf[1], sf[1])

    def test_flat_speculation_hits(self, rng):
        """fetch_mode='flat' speculates the merged narrow prefix: after
        the cold batch, steady drift lands in one round trip."""
        cfg = _cfg(fetch_mode="flat")
        ex = BatchedLandExecutor(cfg, depth=3)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        frames = [_band_frame(base, 900 * k, 2800, 30 + k) for k in range(9)]
        pending, landed = [], []
        for f in frames:
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[: len(out)], prev)
                pending = pending[len(out):]
                landed.extend(out)
        # flat results are flat (xs, vals) pairs, not TiledPayload
        assert all(not isinstance(r[1], wire.TiledPayload) for r in landed)
        # batches 2 and 3 should speculative-hit (batch 1 is the cold probe)
        assert ex._lander.spec_counts["hit"] >= 4
        assert ex._lander.fetch_counts["flat"] >= 6

    def test_requires_tiled_payload(self):
        with pytest.raises(ValueError, match="tiled_payload"):
            BatchedLandExecutor(StreamConfig(height=48, width=64,
                                             overlay_scale=4), depth=2)
        with pytest.raises(ValueError, match="depth"):
            BatchedLandExecutor(_cfg(), depth=0)

    def test_resync_drops_queue(self, rng):
        cfg = _cfg()
        ex = BatchedLandExecutor(cfg, depth=4)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        f = _band_frame(base, 100, 2000, 55)
        assert ex.process(f) is None
        raw = ex.resync()
        assert ex.flush() is None
        _, _, _, want = ref.diff_encode(f, base.copy())
        np.testing.assert_array_equal(raw, want)


class TestNarrowFlat:
    def test_rebuild_flat_xs(self):
        """The narrow merged prefix (xs % tile_cap) rebuilds to exact
        int32 globals via the counts window."""
        tile_cap = 128
        counts_span = np.array([3, 0, 128, 1], np.uint8)  # units 5..8
        t_lo = 5
        rng = np.random.default_rng(1)
        parts = []
        for off, c in enumerate(counts_span):
            loc = np.sort(rng.choice(tile_cap, size=int(c), replace=False))
            parts.append(loc.astype(np.int64) + (t_lo + off) * tile_cap)
        want = np.concatenate(parts).astype(np.int32)
        pos = want.size
        lo = (want % tile_cap).astype(np.uint8)
        lo = np.concatenate([lo, np.zeros(17, np.uint8)])  # padded prefix
        got = TiledLander._rebuild_flat_xs(lo, counts_span, pos, t_lo,
                                           tile_cap)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == np.int32
        # int32 passthrough (geometries with no narrow dtype)
        got32 = TiledLander._rebuild_flat_xs(
            np.concatenate([want, np.zeros(5, np.int32)]),
            counts_span, pos, t_lo, tile_cap)
        np.testing.assert_array_equal(got32, want)

    def test_flat_len_ladder(self):
        lander = TiledLander("flat")
        cap = 6220800
        prev = 0
        for want in range(1, 400000, 7919):
            L = lander._flat_len(want, cap)
            assert L >= min(want, cap)
            # 5-bit-mantissa rounding: over-fetch <= one step (~1/16,
            # floored at q/8) — the flat prefix IS payload bytes, so
            # the old 1.25x-geometric bound was 23 KB/frame of slack
            # at the 102-fps record config
            step = max(lander.FLAT_MIN // 8,
                       1 << max(want.bit_length() - 5, 0))
            assert L <= max(lander.FLAT_MIN, want + step)
            assert L % (lander.FLAT_MIN // 8) == 0 or L == cap
            assert L >= prev or L == cap
            prev = max(prev, L) if L < cap else prev
        assert lander._flat_len(10 ** 9, cap) == cap
        # the record-config regression: want=74439 must not round past
        # 78 KB (the geometric ladder's 98304 cost 23 KB/frame of slack)
        assert lander._flat_len(74439, cap) <= 77824

    def test_land_many_flat_narrow_byte_exact(self, rng):
        """The land_many flat path (multiserve's) now fetches the narrow
        merged prefix — wire-identical to the tiles path."""
        import jax.numpy as jnp

        from cudavideostream_tpu.ops import logcompact

        cfg = _cfg(fetch_mode="flat")
        from cudavideostream_tpu.models import DeltaStreamPipeline

        pipe = DeltaStreamPipeline(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        state = pipe.init_state(base)
        frame = _band_frame(base, 5000, 3000, 70)
        state, pos_d, counts_d, xs_t, vals_t, _aux = pipe.step(state, frame)
        pos = int(np.asarray(pos_d))
        counts = np.asarray(counts_d)
        lander = TiledLander("flat")
        res = lander.land(pos, counts, counts_d, xs_t, vals_t)
        xs, vals = res
        pr, xr, vr, _ = ref.diff_encode(frame, base.copy())
        assert pos == pr
        np.testing.assert_array_equal(xs, xr)
        np.testing.assert_array_equal(vals, vr)
        assert lander.fetch_counts["flat"] == 1


class TestMaskLanding:
    """The "mask" fetch flavor: packed change-bits window + merged vals
    prefix (~1 B per changed byte over the link — config.emit_bitmask,
    TiledLander._pick_kind)."""

    def test_pipeline_emits_exact_bitmask(self, rng):
        """step()'s bits output == packbits of the oracle's change set,
        for both negative-feedback settings (the negfeed path derives
        the mask from the kernel's own prev update; the other recomputes
        the diff)."""
        for negfeed in (True, False):
            cfg = _cfg(emit_bitmask=True, negative_feedback=negfeed)
            from cudavideostream_tpu.models import DeltaStreamPipeline

            pipe = DeltaStreamPipeline(cfg)
            base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                                dtype=np.uint8)
            state = pipe.init_state(base)
            frame = _band_frame(base, 4000, 2500, 60)
            state, pos_d, _c, _x, _v, bits_d, _aux = pipe.step(state, frame)
            _, xr, _, _ = ref.diff_encode(frame, base.copy())
            got = np.asarray(bits_d)
            # bits cover the tiled emit's padded unit extent (>= n);
            # pad bits are zero by construction
            want_bits = np.zeros(got.size * 8, np.uint8)
            want_bits[xr] = 1
            np.testing.assert_array_equal(
                got, np.packbits(want_bits, bitorder="little"))

    @pytest.mark.parametrize("fetch_mode", ["mask", "auto"])
    def test_drift_cut_empty_byte_exact(self, rng, fetch_mode):
        cfg = _cfg(fetch_mode=fetch_mode, emit_bitmask=True)
        ex = BatchedLandExecutor(cfg, depth=3)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        scripted = [_band_frame(base, 1100 * k, 3000, 50 + k)
                    for k in range(7)]
        scripted.append(scripted[-1].copy())                # EMPTY
        scripted.append(_band_frame(base, cfg.frame_bytes - 7000, 6000, 90))
        scripted.append(rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                                     dtype=np.uint8))       # burst
        pending = []
        for f in scripted:
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[: len(out)], prev)
                pending = pending[len(out):]
        tail = ex.flush()
        if tail is not None:
            prev = _check(tail, pending, prev)
        np.testing.assert_array_equal(ex.resync(), prev)
        if fetch_mode == "mask":
            assert ex._lander.fetch_counts["mask"] >= 7
            assert ex._lander.spec_counts["hit"] >= 3

    def test_auto_picks_mask_on_slow_links(self, rng):
        """Under a measured slow link, a locally dense scene makes the
        bits window + vals prefix the cheapest flavor and auto flips to
        it (the decision math in _pick_kind)."""
        cfg = _cfg(fetch_mode="auto", emit_bitmask=True)
        ex = BatchedLandExecutor(cfg, depth=2)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        ex.link.bps = 1e6          # slow link: bytes dominate
        ex.link.merge_s = 1e-5
        pending = []
        for k in range(8):         # dense contiguous band, slow drift
            f = _band_frame(base, 600 * k, 12000, 40 + k)
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[: len(out)], prev)
                pending = pending[len(out):]
            ex.link.bps = 1e6
            ex.link.merge_s = 1e-5
        assert ex._lander.fetch_counts["mask"] > 0

    def test_solo_executor_mask_byte_exact(self, rng):
        cfg = _cfg(fetch_mode="mask", emit_bitmask=True)
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        for k in range(5):
            f = _band_frame(base, 900 * k, 2600, 30 + k)
            pos, xs, vals, _ = ex.process(f)
            pr, xr, vr, prev = ref.diff_encode(f, prev)
            assert pos == pr
            if isinstance(xs, wire.TiledPayload):
                xs, vals = xs.to_flat()
            np.testing.assert_array_equal(xs, xr)
            np.testing.assert_array_equal(vals, vr)

    def test_rebuild_mask_xs(self):
        tile_cap = 128
        rng = np.random.default_rng(7)
        want = np.sort(rng.choice(4096, size=300, replace=False)) + 5 * 128
        bits = np.zeros(6 * 128 + 4096, np.uint8)
        bits[want - 5 * 128] = 1   # window starts at unit 5
        packed = np.packbits(bits, bitorder="little")
        got = TiledLander._rebuild_mask_xs(packed, 300, 5, tile_cap)
        np.testing.assert_array_equal(got, want.astype(np.int32))
        assert got.dtype == np.int32
        with pytest.raises(RuntimeError, match="invariant"):
            TiledLander._rebuild_mask_xs(packed, 299, 5, tile_cap)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="emit_bitmask"):
            StreamConfig(height=48, width=64, tiled_payload=True,
                         fetch_mode="mask")
        with pytest.raises(ValueError, match="tiled_payload"):
            StreamConfig(height=48, width=64, emit_bitmask=True)

    def test_multiserve_rejects_mask(self):
        """The batched pipeline doesn't emit change-bits: a hand-built
        mask config must be refused, not silently landed through a
        different flavor. (The sharded executor needs no guard: it
        rejects every tiled_payload config, and emit_bitmask requires
        tiled_payload.)"""
        from cudavideostream_tpu.runtime.multiserve import MultiStreamServer
        from cudavideostream_tpu.runtime.sources import SyntheticSource

        cfg = _cfg(fetch_mode="mask", emit_bitmask=True)
        with pytest.raises(ValueError, match="mask"):
            MultiStreamServer(cfg, [SyntheticSource(cfg)], verbose=False)


class TestDriftAwareSpec:
    def test_window_tightens_to_observed_drift(self, rng):
        """A slow-drifting wide band: after the lander observes the
        motion, the speculative window's margin shrinks from the blind
        ``span//4 * K`` prior toward ``4x`` the measured per-frame
        drift — fewer bytes per landing — while batches keep
        speculative-hitting and stay byte-exact."""
        # 384x512x3 = 589824 B = 4608 units of 128: span//4 clears the
        # 64-unit margin floor so blind vs drift-aware genuinely differ
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="tiles")
        K = 4
        ex = BatchedLandExecutor(cfg, depth=K)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        band, step = 40000, 128            # ~312 units span, 1 unit/frame
        pending = []
        specs = []
        for k in range(4 * K):
            f = _band_frame(base, 2000 + step * k, band, 50 + k)
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[:K], prev)
                pending = pending[K:]
                specs.append(ex._lander._spec)
        tail = ex.flush()
        if tail:
            prev = _check(tail, pending, prev)
        np.testing.assert_array_equal(ex.resync(), prev)

        lander = ex._lander
        n_tiles = cfg.frame_bytes // 128
        span = (band // 128) + 2           # band straddles unit edges
        blind_L = lander._range_len(span + 2 * (max(64, span // 4) * K),
                                    n_tiles)
        # the first spec is blind (cold), later ones tighten below it
        assert specs[-1][2] < blind_L
        # velocity EMA learned ~1 unit/frame (signed), and the linear
        # motion predicts with near-zero error: margin floor dominates
        assert lander._vel_pf is not None and abs(lander._vel_pf - 1) <= 1
        assert lander._err_pf is not None and lander._err_pf <= 4
        assert specs[-1][4] in (0, 1, 2)   # per-frame predicted step
        # tightening must not cost the hit rate (batch 1 is the probe)
        assert lander.spec_counts["hit"] >= 2 * K
        assert lander.spec_counts["miss"] <= K

    def test_velocity_prediction_converges_zero_miss(self, rng):
        """Linear drift at depth 16: the velocity EMA learns the signed
        per-frame motion exactly, per-frame predicted starts track the
        band, the window collapses to span + margin-floor (NOT the
        4*K*drift union — at K=16 that fetched ~7x the span per frame),
        and — after the cold probe batch — every landing speculative-
        hits. Byte-exact throughout (mask flavor: bits window + vals)."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        K = 16
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        band, step = int(0.01 * n), 4096   # ~46 units span, 32 units/frame
        pending = []
        for t in range(8 * K):
            f = _band_frame(base, (t * step) % (n - band), band,
                            77 if t % 2 == 0 else 154)
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[:K], prev)
                pending = pending[K:]
        tail = ex.flush()
        if tail:
            prev = _check(tail, pending, prev)
        np.testing.assert_array_equal(ex.resync(), prev)
        lander = ex._lander
        # velocity learned exactly (32 units/frame, signed forward)
        assert abs(lander._vel_pf - step / 128) <= 1
        # zero misses after the cold probe: prediction, not re-fetching
        assert lander.spec_counts["miss"] == 0
        assert lander.spec_counts["hit"] >= 7 * K
        # window collapsed to span + margin floor, far below the union:
        # blind margin = max(64, span//4)*K; converged L <= span + 2*256
        span_units = band // 128 + 2
        assert lander._spec[2] <= span_units + 512
        assert lander._spec[4] == step // 128

    def test_depth1_jitter_feeds_error_ema(self, rng):
        """At landing depth 1 there are no within-batch adjacent pairs,
        so the prediction-error EMA used to see only err=0.0 samples and
        the margin pinned at the 64-unit floor — a jittery scene then
        speculative-missed persistently (r4 advisor finding). The
        cross-batch endpoint deviation must feed the EMA: after a
        zero-mean jittery walk, ``_err_pf`` reflects the jitter
        amplitude and the landings stay byte-exact."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="tiles")
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        band = 40000                       # ~312 units of 128
        s = 20000                          # noisy walk: the diff window
        for k in range(12):                # endpoints jitter ~32 units
            s += 0 if k % 2 else 8192      # steps alternate 0 / 64 units
            f = _band_frame(base, s, band, 50 + k)
            out = ex.process(f)
            prev = _check([out], [f], prev)
        np.testing.assert_array_equal(ex.resync(), prev)
        lander = ex._lander
        # the cross-batch deviation is the ONLY evidence at K=1: the
        # EMA must have learned the ~32-unit deviation from the mean
        # velocity (old behavior: _err_pf == 0.0 exactly)
        assert lander._err_pf is not None and lander._err_pf > 8

    def test_volatile_overlay_frames_do_not_widen_window(self, rng):
        """The 1 Hz status overlay ships glyph bytes when the text
        changes; those frames' device spans cover overlay+scene as one
        wide window. The host knows which frames those are (it composed
        the text) and flags them volatile: they land via the exact miss
        path while the speculative window keeps tracking the SCENE only
        — measured on hardware, the unflagged learner held a 2.3x-wider
        window (sustained_tpu_tunnel r4 block). Byte-exact throughout."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        K = 8
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        ex.start(base)
        band, step = int(0.01 * n), 4096
        # scene band drifts in the BOTTOM half; overlay glyphs land in
        # the top rows — a change in both makes the naive span huge
        lo = n // 2
        recon = base.copy()                  # client-side reconstruction
        for t in range(8 * K):
            text = f"FPS {t // 20}"          # changes every 20 frames
            f = _band_frame(base, lo + (t * step) % (n // 2 - band),
                            band, 77 if t % 2 == 0 else 154)
            out = ex.process(f, text=text)
            for (pos, xs, vals, _aux) in (out or []):
                if hasattr(xs, "to_flat"):
                    xs, vals = xs.to_flat()
                recon[np.asarray(xs)] += np.asarray(vals)  # uint8 wrap
        for (pos, xs, vals, _aux) in (ex.flush() or []):
            if hasattr(xs, "to_flat"):
                xs, vals = xs.to_flat()
            recon[np.asarray(xs)] += np.asarray(vals)
        np.testing.assert_array_equal(recon, ex.resync())
        lander = ex._lander
        # the window tracked the scene band, not the overlay union:
        # converged L stays near the band span (+ margin floors), far
        # below the overlay->band distance (~n/2/128 units)
        span_units = band // 128 + 2
        assert lander._spec[2] <= span_units + 1024
        assert lander._spec[2] < (n // 2) // 128
        # misses bounded by the text-change frames (+ the cold probe)
        n_changes = (8 * K - 1) // 20 + 1
        assert lander.spec_counts["miss"] <= n_changes + K
        assert lander.spec_counts["hit"] >= 5 * K

    def test_converged_fetch_slack_bounded(self, rng):
        """Fetch-byte discipline: on a stable drifting band the landed
        vals prefix P converges to within ~1/8 of pos (the 5-bit-
        mantissa ladder bounds rounding at ~1/16 and the learned growth
        floor drops 1024/frame -> 256/frame once the pos-delta EMA has
        samples). The geometric ladder + cold floor this replaces held
        P at 1.48x pos — 31 KB/frame of slack at the 102-fps record
        config (benchmarks/loopback_tpu_tunnel r4 record block:
        land_KBpf=108.0 of which 64.7 payload)."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        K = 8
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        band, step = int(0.10 * n), 4096    # pos ~= 59k entries
        pending = []
        for t in range(6 * K):
            f = _band_frame(base, (t * step) % (n - band), band,
                            77 if t % 2 == 0 else 154)
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[:K], prev)
                pending = pending[K:]
        tail = ex.flush()
        if tail:
            prev = _check(tail, pending, prev)
        np.testing.assert_array_equal(ex.resync(), prev)
        lander = ex._lander
        pos = band + step                   # steady-state changed bytes
        assert lander._spec[0] == "mask"
        assert lander._spec[3] - pos <= pos // 8
        # and the discipline costs no extra round trips
        assert lander.spec_counts["miss"] == 0

    def test_cut_rewide_then_retighten(self, rng):
        """A scene cut spikes the observed drift (window re-widens, the
        cut frame itself is a miss that re-fetches exactly), then the
        EMA decays and the window tightens again. Byte-exact throughout."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="tiles")
        K = 3
        ex = BatchedLandExecutor(cfg, depth=K)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        frames = [_band_frame(base, 2000 + 128 * k, 30000, 40 + k)
                  for k in range(2 * K)]
        # cut: the band jumps to the far end of the frame
        frames += [_band_frame(base, cfg.frame_bytes - 40000 + 128 * k,
                               30000, 70 + k) for k in range(3 * K)]
        pending = []
        for f in frames:
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[:K], prev)
                pending = pending[K:]
        tail = ex.flush()
        if tail:
            prev = _check(tail, pending, prev)
        np.testing.assert_array_equal(ex.resync(), prev)
        # hits resumed after the cut (final batches hit again)
        assert ex._lander.spec_counts["hit"] >= K


class TestHostAuthoredOverlay:
    """Text-change frames land through the normal speculative window,
    with the overlay's payload entries AUTHORED BY THE HOST from its
    strip shadow (executor.OverlayShadow) — no full-union-span miss
    fetch, no extra link round trip per text change."""

    def _run(self, ex, frames_texts):
        recon = None
        for f, text in frames_texts:
            out = ex.process(f, text=text)
            for (pos, xs, vals, _aux) in (out or []):
                if hasattr(xs, "to_flat"):
                    xs, vals = xs.to_flat()
                if recon is None:
                    recon = self._base.copy()
                recon[np.asarray(xs, np.int64)] += np.asarray(vals)
        for (pos, xs, vals, _aux) in (ex.flush() or []):
            if hasattr(xs, "to_flat"):
                xs, vals = xs.to_flat()
            recon[np.asarray(xs, np.int64)] += np.asarray(vals)
        return recon

    def test_text_changes_land_without_miss(self, rng):
        """Steady scene + 1-per-10-frames text changes: ZERO speculative
        misses after the cold probe batch (the old path missed on every
        text change — a full-union bits fetch + one extra ~30 ms RTT,
        benchmarks/sustained_tpu_tunnel r4 block), byte-exact, and the
        strip shadow stays identical to the device prev strip."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        K = 8
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        self._base = base = rng.integers(0, 255, n, endpoint=True,
                                         dtype=np.uint8)
        ex.start(base)
        band, step, lo = int(0.02 * n), 4096, n // 2
        frames_texts = []
        for t in range(8 * K):
            f = _band_frame(base, lo + (t * step) % (n // 2 - band),
                            band, 77 if t % 2 == 0 else 154)
            frames_texts.append((f, f"FPS {t // 10:04d}"))
        recon = self._run(ex, frames_texts)
        np.testing.assert_array_equal(recon, ex.resync())
        lander = ex._lander
        ov = lander._ov
        assert ov is not None and ov.enabled
        # every text change landed through the speculative window
        assert lander.spec_counts["miss"] == 0
        assert lander.spec_counts["hit"] >= 7 * K
        # shadow invariant: shadow == device prev over the strip rows
        np.testing.assert_array_equal(
            ov.shadow.reshape(-1), ex.resync()[: ov.strip_bytes])

    def test_text_shrink_falls_back_exact(self, rng):
        """A shrinking text reveals scene bytes the host cannot author;
        those frames fall back to the exact miss path — byte-exactness
        is never at stake, and the shadow re-syncs from the landed
        payload."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        K = 4
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        self._base = base = rng.integers(0, 255, n, endpoint=True,
                                         dtype=np.uint8)
        ex.start(base)
        band, step, lo = int(0.02 * n), 4096, n // 2
        texts = ["FPS 1234567", "FPS 1234567", "SHORT", "SHORT",
                 "FPS 7654321", "FPS 7654321"] * 4
        frames_texts = [
            (_band_frame(base, lo + (t * step) % (n // 2 - band),
                         band, 77 if t % 2 == 0 else 154), texts[t])
            for t in range(len(texts))
        ]
        recon = self._run(ex, frames_texts)
        np.testing.assert_array_equal(recon, ex.resync())
        ov = ex._lander._ov
        np.testing.assert_array_equal(
            ov.shadow.reshape(-1), ex.resync()[: ov.strip_bytes])

    def test_scene_through_strip_rows_stays_exact(self, rng):
        """A scene band that sweeps THROUGH the overlay strip rows: the
        clamped scene window can't cover it, the coverage gate fails,
        and the frames land via the exact miss path — while the shadow
        keeps tracking the strip through payload application (scene
        entries land in the strip region here)."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        K = 4
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        self._base = base = rng.integers(0, 255, n, endpoint=True,
                                         dtype=np.uint8)
        ex.start(base)
        band = int(0.05 * n)
        frames_texts = []
        for t in range(6 * K):
            # band drifts from the very top (inside the strip rows)
            f = _band_frame(base, (t * 2048) % (n - band), band,
                            77 if t % 2 == 0 else 154)
            frames_texts.append((f, f"FPS {t // 6:04d}"))
        recon = self._run(ex, frames_texts)
        np.testing.assert_array_equal(recon, ex.resync())
        ov = ex._lander._ov
        np.testing.assert_array_equal(
            ov.shadow.reshape(-1), ex.resync()[: ov.strip_bytes])

    def test_desynced_shadow_rejected_by_index_gate(self, rng):
        """The coverage gate must be sound on its own, not only via the
        shadow-maintenance invariants (r4 advisor finding): a desynced
        shadow that predicts the right entry COUNT and the right VALUE
        sequence but the wrong INDICES must be rejected by the per-unit
        histogram check against the fetched ``counts[:u_strip]`` window
        — the frame then lands via the always-exact miss path."""
        from cudavideostream_tpu.runtime import executor as exmod

        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        ex = StreamExecutor(cfg)
        n = cfg.frame_bytes
        self._base = base = rng.integers(0, 255, n, endpoint=True,
                                         dtype=np.uint8)
        ex.start(base)
        lander = ex._lander
        ov = lander._ov
        assert ov is not None and ov.enabled

        # warm the speculative window with clean scene frames
        band, lo = int(0.02 * n), n // 2
        recon = base.copy()
        for t in range(4):
            f = _band_frame(base, lo + t * 2048, band, 60 + t)
            pos, xs, vals, _aux = ex.process(f, text="FPS 0000")
            if hasattr(xs, "to_flat"):
                xs, vals = xs.to_flat()
            recon[np.asarray(xs, np.int64)] += np.asarray(vals)

        # sabotage the shadow: translate it so delta() authors the same
        # VALUES at SHIFTED indices (an opaque glyph blit over a rolled
        # shadow diffs with identical per-cell value sequences whenever
        # the roll is a whole glyph cell — the worst case for a
        # value-only gate); per-unit counts then disagree
        real = exmod.OverlayShadow.delta

        forged = {}

        def fake_delta(self_ov, text):
            out = real(self_ov, text)
            if out is None or out[0].size == 0:
                return out
            oxs, ovals = out
            forged["hit"] = True
            return oxs + np.int32(ov.cw3), ovals  # one cell to the right

        ov.delta = fake_delta.__get__(ov, exmod.OverlayShadow)
        miss0 = lander.spec_counts["miss"]
        f = _band_frame(base, lo + 5 * 2048, band, 90)
        pos, xs, vals, _aux = ex.process(f, text="FPS 1111")
        if hasattr(xs, "to_flat"):
            xs, vals = xs.to_flat()
        recon2 = recon.copy()
        recon2[np.asarray(xs, np.int64)] += np.asarray(vals)
        assert forged.get("hit"), "forged delta never consulted"
        # the forged indices were rejected -> miss path -> still exact
        assert lander.spec_counts["miss"] > miss0
        np.testing.assert_array_equal(recon2, ex.resync())

    def test_solo_executor_hint_path(self, rng):
        """The depth-1 solo executor rides the same machinery: text
        changes land speculatively with host-authored overlay entries."""
        cfg = StreamConfig(height=384, width=512, overlay_scale=4,
                           tiled_payload=True, fetch_mode="mask",
                           emit_bitmask=True)
        ex = StreamExecutor(cfg)
        n = cfg.frame_bytes
        self._base = base = rng.integers(0, 255, n, endpoint=True,
                                         dtype=np.uint8)
        ex.start(base)
        band, step, lo = int(0.02 * n), 4096, n // 2
        recon = base.copy()
        for t in range(24):
            f = _band_frame(base, lo + (t * step) % (n // 2 - band),
                            band, 77 if t % 2 == 0 else 154)
            pos, xs, vals, _aux = ex.process(f, text=f"FPS {t // 6:04d}")
            if hasattr(xs, "to_flat"):
                xs, vals = xs.to_flat()
            recon[np.asarray(xs, np.int64)] += np.asarray(vals)
        np.testing.assert_array_equal(recon, ex.resync())
        # text changed at t=6,12,18 (t=0 is the cold probe): at most
        # the probe misses
        assert ex._lander.spec_counts["miss"] <= 1


class TestServerLandBatch:
    @pytest.mark.parametrize("wire_format", ["v1", "v3"])
    def test_loopback_byte_exact(self, wire_format):
        """server --tiled --land-batch 3 over a real socket: the client
        reconstruction byte-equals the oracle replay, including the
        sub-depth flush tail."""
        cfg = _cfg(port=0, wire_format=wire_format)
        n_frames = 7  # 2 full batches + a 1-frame tail
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=3),
            executor=BatchedLandExecutor(cfg, depth=3),
            verbose=False, overlay_status=False,
        )
        server.listen()
        t = threading.Thread(target=server.serve,
                             kwargs={"max_frames": n_frames}, daemon=True)
        t.start()
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                cfg.width,
                                wire_format="auto" if wire_format != "v1"
                                else "v1")
        cli.connect()
        replay = SyntheticSource(cfg, seed=3)
        prev = next(replay).copy()
        np.testing.assert_array_equal(cli.frame, prev)
        for _ in range(n_frames):
            frame = next(replay)
            prev, _, _, _, _ = ref.step_oracle(prev, frame, cfg)
            _, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
        cli.close()
        t.join(timeout=60)

    def test_loopback_mask_byte_exact(self):
        """--tiled --fetch mask --land-batch over a real socket."""
        cfg = _cfg(port=0, wire_format="v3", fetch_mode="mask",
                   emit_bitmask=True)
        n_frames = 7
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=5),
            executor=BatchedLandExecutor(cfg, depth=3),
            verbose=False, overlay_status=False,
        )
        server.listen()
        t = threading.Thread(target=server.serve,
                             kwargs={"max_frames": n_frames}, daemon=True)
        t.start()
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                cfg.width, wire_format="auto")
        cli.connect()
        replay = SyntheticSource(cfg, seed=5)
        prev = next(replay).copy()
        np.testing.assert_array_equal(cli.frame, prev)
        for _ in range(n_frames):
            frame = next(replay)
            prev, _, _, _, _ = ref.step_oracle(prev, frame, cfg)
            _, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
        cli.close()
        t.join(timeout=60)

    def test_cli_rejects_bad_combos(self):
        from cudavideostream_tpu.runtime.server import main

        with pytest.raises(SystemExit):
            main(["--land-batch", "4"])  # no --tiled
        with pytest.raises(SystemExit):
            main(["--land-batch", "4", "--tiled", "--pipelined"])
        with pytest.raises(SystemExit):
            main(["--fetch", "mask"])    # no --tiled
        with pytest.raises(SystemExit):
            main(["--bitmask"])          # no --tiled


class TestWireV4Serving:
    """wire v4 + config.mask_payload: the ZERO-INDEX path. The landing
    returns the raw bits window (wire.MaskPayload), the v4 encoder trims
    and forwards it untranslated — no index stream is materialized
    anywhere on the server."""

    def test_lander_returns_mask_payload(self, rng):
        cfg = _cfg(fetch_mode="mask", emit_bitmask=True, mask_payload=True)
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        saw_mask = 0
        for k in range(5):
            f = _band_frame(base, 900 * k, 2600, 30 + k)
            pos, xs, vals, _ = ex.process(f)
            pr, xr, vr, prev = ref.diff_encode(f, prev)
            assert pos == pr
            if isinstance(xs, wire.MaskPayload):
                saw_mask += 1
                assert vals is None
                assert xs.start_byte % 8 == 0
                fx, fv = xs.to_flat()
            elif isinstance(xs, wire.TiledPayload):
                fx, fv = xs.to_flat()
            else:
                fx, fv = xs, vals
            np.testing.assert_array_equal(fx, xr)
            np.testing.assert_array_equal(fv, vr)
        assert saw_mask >= 4  # pinned mask mode: every non-cold landing

    def test_loopback_v4_zero_index_byte_exact(self, tmp_path):
        """server --tiled --fetch mask --land-batch 3 --wire v4 over a
        real socket: the client (auto-sniffing v4) reconstructs
        byte-exactly, the recorded capture replays with winmask frames
        in its stats, and the replayer re-serves it byte-identically."""
        from cudavideostream_tpu.runtime.replay import ReplayServer

        cfg = _cfg(port=0, wire_format="v4", fetch_mode="mask",
                   emit_bitmask=True, mask_payload=True)
        n_frames = 7
        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=5),
            executor=BatchedLandExecutor(cfg, depth=3),
            verbose=False, overlay_status=False,
        )
        server.listen()
        t = threading.Thread(target=server.serve,
                             kwargs={"max_frames": n_frames}, daemon=True)
        t.start()
        rec = str(tmp_path / "session.cvs")
        cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                cfg.width, wire_format="auto", record=rec)
        cli.connect()
        assert cli.wire_format == "v4"
        replay = SyntheticSource(cfg, seed=5)
        prev = next(replay).copy()
        np.testing.assert_array_equal(cli.frame, prev)
        recons = []
        for _ in range(n_frames):
            frame = next(replay)
            prev, _, _, _, _ = ref.step_oracle(prev, frame, cfg)
            _, recon = cli.read_frame()
            np.testing.assert_array_equal(recon, prev)
            recons.append(recon.copy())
        cli.close()
        t.join(timeout=60)
        # the capture replays: framing scan finds every frame, stats
        # name the winmask mode, and a second client decodes identically
        rep = ReplayServer(rec, cfg.frame_bytes, port=0, verbose=False)
        assert len(rep.marks) == n_frames
        stats = rep.stats()
        assert any(m == wire.MODE_WINMASK for _, m, _ in stats), stats
        rep.listen()
        t2 = threading.Thread(target=rep.serve, daemon=True)
        t2.start()
        cli2 = DeltaStreamClient("127.0.0.1", rep.port, cfg.height,
                                 cfg.width, wire_format="auto")
        cli2.connect()
        assert cli2.wire_format == "v4"
        for want in recons:
            _, recon = cli2.read_frame()
            np.testing.assert_array_equal(recon, want)
        cli2.close()
        t2.join(timeout=60)
        rep.close()

    def test_config_validation(self):
        with pytest.raises(ValueError, match="mask_payload"):
            StreamConfig(mask_payload=True)
        with pytest.raises(ValueError, match="mask_payload"):
            StreamConfig(tiled_payload=True, mask_payload=True)
