"""Lander warm start: cross-session persistence of the LEARNED link +
speculation state (server --link-cache) and the pre-serve link
calibration burst (--calibrate).

The reference ships its first frame at full speed because its ring of
six pinned buffers is preallocated (threads.cpp:84-106); the rebuild's
lander instead LEARNS the link bandwidth, the scene's velocity, and the
speculative window — and the r4 sustained hardware run spent a third of
a 300-frame session in that transient (first-30 47.3 ms/frame vs
last-30 8.6, benchmarks/sustained_tpu_tunnel). These tests pin the
mechanism: exported state seeds a fresh executor, a seeded session's
FIRST batch speculative-hits, stale caches are refused, and nothing is
ever less than byte-exact.
"""

import json
import threading

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.executor import (
    BatchedLandExecutor,
    StreamExecutor,
)


def _cfg(**kw):
    base = dict(height=96, width=128, overlay_scale=4,
                tiled_payload=True, fetch_mode="mask", emit_bitmask=True)
    base.update(kw)
    return StreamConfig(**base)


def _band_frame(base, start, width, delta):
    f = base.copy()
    end = min(start + width, f.size)
    f[start:end] += np.uint8(delta)
    return f


def _check(results, frames, prev):
    assert len(results) == len(frames)
    for (pos, xs, vals, _aux), frame in zip(results, frames):
        pr, xr, vr, prev = ref.diff_encode(frame, prev)
        assert pos == pr
        if isinstance(xs, (wire.TiledPayload, wire.MaskPayload)):
            fx, fv = xs.to_flat()
        else:
            fx, fv = xs, vals
        np.testing.assert_array_equal(np.asarray(fx), xr)
        fv = np.asarray(fv)
        np.testing.assert_array_equal(fv[:pr] if fv.size > pr else fv, vr)
    return prev


def _drift_session(cfg, base, depth, n, seed_from=None, start=0):
    """Run a linearly drifting band; returns (executor, prev)."""
    ex = BatchedLandExecutor(cfg, depth=depth)
    if seed_from is not None:
        assert ex.load_link_cache(seed_from)
    ex.start(base)
    prev = base.copy()
    pending = []
    for t in range(n):
        f = _band_frame(base, start + t * 512, 4000, 60 + t % 100)
        out = ex.process(f)
        pending.append(f)
        if out is not None:
            prev = _check(out, pending[: len(out)], prev)
            pending = pending[len(out):]
    tail = ex.flush()
    if tail:
        prev = _check(tail, pending, prev)
    return ex, prev


class TestExportSeed:
    def test_roundtrip_through_cache_file(self, tmp_path):
        cfg = _cfg()
        rng = np.random.default_rng(7)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex, _ = _drift_session(cfg, base, depth=2, n=10)
        st = ex._lander.export_state()
        assert st["vel_pf"] is not None and st["spec"] is not None
        path = str(tmp_path / "link.json")
        ex.save_link_cache(path)

        ex2 = StreamExecutor(cfg)
        assert ex2.load_link_cache(path)
        assert ex2._lander._vel_pf == pytest.approx(st["vel_pf"])
        assert ex2._lander._err_pf == pytest.approx(st["err_pf"])
        assert list(ex2._lander._spec) == st["spec"]

    def test_seeded_first_batch_hits(self, tmp_path):
        """A fresh session seeded from the cache speculative-HITS its
        first batch where the cold one pays the blind probe — the
        mechanism behind the sustained-throughput ask. The scene resumes
        where the cached window points (the restart-resume scenario);
        byte-exactness holds either way."""
        cfg = _cfg()
        rng = np.random.default_rng(8)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        K, n = 3, 12
        ex, _ = _drift_session(cfg, base, depth=K, n=n)
        path = str(tmp_path / "link.json")
        ex.save_link_cache(path)
        # cold control: first batch is the probe (all misses)
        cold, _ = _drift_session(cfg, base, depth=K, n=K,
                                 start=n * 512)
        assert cold._lander.spec_counts["hit"] == 0
        # warm: the seeded window + velocity cover the resumed scene.
        # Frame 0 can never hit: the session's first frame carries the
        # text-change volatile flag (_last_text None -> ""), and rides
        # the always-exact miss path by design.
        warm, _ = _drift_session(cfg, base, depth=K, n=K,
                                 seed_from=path, start=n * 512)
        assert warm._lander.spec_counts["hit"] == K - 1
        assert warm._lander.spec_counts["miss"] <= 1

    def test_fingerprint_mismatch_refused(self, tmp_path):
        cfg = _cfg()
        rng = np.random.default_rng(9)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex, _ = _drift_session(cfg, base, depth=2, n=6)
        path = str(tmp_path / "link.json")
        ex.save_link_cache(path)
        other = StreamExecutor(_cfg(height=48, width=64))
        assert not other.load_link_cache(path)
        assert other._lander._spec is None
        assert other.link.bps is None

    def test_corrupt_and_missing_cache_refused(self, tmp_path):
        ex = StreamExecutor(_cfg())
        assert not ex.load_link_cache(str(tmp_path / "absent.json"))
        bad = tmp_path / "bad.json"
        bad.write_text("{not json")
        assert not ex.load_link_cache(str(bad))
        # wrong version
        ok = tmp_path / "v0.json"
        ok.write_text(json.dumps({"version": 0, "fingerprint": []}))
        assert not ex.load_link_cache(str(ok))

    def test_spec_mode_mismatch_drops_window_keeps_emas(self):
        """A cached 'mask' window must not seed a lander pinned to
        'tiles' (its phase-1 slicing would expect bits that the pipeline
        may not emit); the scalar EMAs are mode-independent and stay."""
        lander = StreamExecutor(_cfg(fetch_mode="tiles",
                                     emit_bitmask=False))._lander
        lander.seed_state({"vel_pf": 3.0, "err_pf": 1.0, "dpos_pf": 2.0,
                           "spec": ["mask", 0, 64, 4096, 3]})
        assert lander._spec is None
        assert lander._vel_pf == 3.0 and lander._dpos_pf == 2.0

    def test_calibrate_seeds_bps(self):
        ex = StreamExecutor(_cfg())
        assert ex.link.bps is None
        ex.calibrate_link(rounds=2)
        assert ex.link.bps is not None and ex.link.bps > 0


class TestPrewarm:
    """prewarm_fetch: compile the previous session's fetch-rung jits
    before the first frame. Without a persistent XLA cache every rung's
    first mid-serve use is a full compile (~0.5-1 s stall per rung on
    the tunnel backend — the >p95 frames in
    benchmarks/sustained_tpu_tunnel); the cache persists the rung SET so
    a warm session compiles them all up front."""

    @pytest.mark.parametrize("maskonly", [False, True])
    def test_saved_rungs_compiled_and_serving_exact(self, tmp_path,
                                                    maskonly):
        cfg = _cfg(maskonly_payload=True) if maskonly else _cfg()
        rng = np.random.default_rng(11)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex, _ = _drift_session(cfg, base, depth=2, n=10)
        path = str(tmp_path / "link.json")
        ex.save_link_cache(path)
        with open(path) as f:
            saved = {tuple(k) for k in json.load(f)["lander"]["slicers"]}
        assert saved, "session recorded no fetch rungs"

        ex2 = BatchedLandExecutor(cfg, depth=2)
        assert ex2.load_link_cache(path)
        ex2.start(base)
        n = ex2.prewarm_fetch()
        assert n >= len(saved)
        assert saved <= set(ex2._lander._range_slicers)
        # the no-op dispatch left the device state byte-identical
        np.testing.assert_array_equal(ex2.resync(), base)
        # and a subsequent session serves byte-exactly (resync cleared
        # nothing here — state is still base)
        prev = base.copy()
        frames = [_band_frame(base, t * 512, 4000, 60 + t) for t in
                  range(4)]
        pending, outs = [], []
        for f in frames:
            pending.append(f)
            out = ex2.process(f)
            if out:
                outs.extend(out)
        tail = ex2.flush()
        if tail:
            outs.extend(tail)
        _check(outs, frames, prev)

    def test_rung_hysteresis_bounds_key_churn(self):
        """A jittery scene must NOT mint a new fetch jit per batch: the
        learned span/pos estimates hop between adjacent ladder rungs,
        and without hysteresis every hop is a fresh ~0.55 s XLA compile
        at the batch boundary (the every-16th-frame stalls in
        benchmarks/sustained_tpu_tunnel). With the prev-rung hysteresis
        the live key set stays small and byte-exactness is untouched."""
        cfg = _cfg()
        rng = np.random.default_rng(13)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex = BatchedLandExecutor(cfg, depth=4)
        ex.start(base)
        prev = base.copy()
        pending, outs, frames = [], [], []
        for t in range(48):
            # width jitters +/-20% around 4000, band drifts 512/frame
            w = 4000 + int(800 * np.sin(t * 1.7))
            f = _band_frame(base, t * 512, w, 60 + t % 100)
            frames.append(f)
            pending.append(f)
            out = ex.process(f)
            if out:
                outs.extend(out)
        tail = ex.flush()
        if tail:
            outs.extend(tail)
        prev = _check(outs, frames, prev)
        keys = set(ex._lander._range_slicers)
        # 12 batches; without hysteresis this session minted a new
        # spec/mask key nearly every batch (one compile each). Allow a
        # handful for genuine regime changes, not one per batch.
        churny = [k for k in keys if k[0] in ("spec", "mask", "maskw")]
        assert len(churny) <= 6, sorted(keys)

    def test_refused_mid_session(self):
        cfg = _cfg()
        base = np.zeros(cfg.frame_bytes, np.uint8)
        ex = StreamExecutor(cfg)
        ex.start(base)
        ex.process(_band_frame(base, 0, 512, 50))
        with pytest.raises(RuntimeError):
            ex.prewarm_fetch()

    def test_stale_keys_skipped_not_fatal(self):
        cfg = _cfg()
        base = np.zeros(cfg.frame_bytes, np.uint8)
        ex = StreamExecutor(cfg)
        ex._lander.seed_state(
            {"slicers": [["bogus", 1, 2], [999999, False, 64],
                         ["spec", 8, 64, 0]]}
        )
        ex.start(base)
        # bogus kinds / out-of-range lengths are skipped; probe still
        # compiles and serving proceeds
        n = ex.prewarm_fetch()
        assert n >= 1
        pos, xs, vals, _ = ex.process(_band_frame(base, 0, 512, 50))
        assert pos == 512


class TestXlaCache:
    """utils/xla_cache: the persistent XLA compilation cache every
    serving/bench entry point enables (the JAX-native analogue of the
    reference's AOT nvcc kernels — nothing compiles at serve time
    twice; hit measured on the tunnel backend: 375.8 s -> 15.7 s)."""

    def test_enable_creates_dir_and_sets_config(self, tmp_path,
                                                monkeypatch):
        import jax

        from cudavideostream_tpu.utils.xla_cache import (
            maybe_enable_compilation_cache,
        )

        old = jax.config.jax_compilation_cache_dir
        try:
            d = str(tmp_path / "xc")
            assert maybe_enable_compilation_cache(d) == d
            assert jax.config.jax_compilation_cache_dir == d
            import os
            assert os.path.isdir(d)
        finally:
            jax.config.update("jax_compilation_cache_dir", old)

    def test_off_disables(self, monkeypatch):
        import jax

        from cudavideostream_tpu.utils.xla_cache import (
            maybe_enable_compilation_cache,
        )

        old = jax.config.jax_compilation_cache_dir
        monkeypatch.setenv("CVSTPU_XLA_CACHE", "off")
        try:
            assert maybe_enable_compilation_cache() is None
            assert jax.config.jax_compilation_cache_dir == old
        finally:
            jax.config.update("jax_compilation_cache_dir", old)


class TestServerCLI:
    def test_link_cache_written_and_reloaded(self, tmp_path):
        """server --link-cache over a real socket: the first run writes
        the cache, the second loads it; both serve byte-exactly."""
        from cudavideostream_tpu.runtime.client import DeltaStreamClient
        from cudavideostream_tpu.runtime.server import DeltaStreamServer
        from cudavideostream_tpu.runtime.sources import SyntheticSource

        cfg = _cfg(port=0, wire_format="v4", mask_payload=True)
        path = str(tmp_path / "link.json")
        for session in range(2):
            ex = BatchedLandExecutor(cfg, depth=2)
            loaded = ex.load_link_cache(path)
            assert loaded == (session == 1)
            server = DeltaStreamServer(
                cfg, SyntheticSource(cfg, seed=3), executor=ex,
                verbose=False, overlay_status=False)
            server.listen()
            t = threading.Thread(target=server.serve,
                                 kwargs={"max_frames": 5}, daemon=True)
            t.start()
            cli = DeltaStreamClient("127.0.0.1", server.port, cfg.height,
                                    cfg.width, wire_format="auto")
            cli.connect()
            replay = SyntheticSource(cfg, seed=3)
            prev = next(replay).copy()
            for _ in range(5):
                frame = next(replay)
                prev, _, _, _, _ = ref.step_oracle(prev, frame, cfg)
                _, recon = cli.read_frame()
                np.testing.assert_array_equal(recon, prev)
            cli.close()
            t.join(timeout=60)
            ex.save_link_cache(path)
        data = json.loads(open(path).read())
        assert data["version"] == StreamExecutor.LINK_CACHE_VERSION

    def test_cli_flags_parse(self):
        from cudavideostream_tpu.runtime.server import main

        with pytest.raises(SystemExit):
            main(["--mesh", "1,2", "--link-cache", "/tmp/x.json"])


class TestRungPinning:
    """Cross-session rung convergence (see _RungMemo pinning): without
    it, four accumulating hardware sessions EACH minted ~5-8 fresh
    fetch-jit keys mid-serve — a 0.6-1.7 s compile stall apiece,
    forever, because every session's EMA trajectory differs slightly
    (benchmarks/sustained_tpu_tunnel r5). A loaded link cache pins each
    ladder memo to its persisted rung family; picks snap up into the
    family (bounded over-fetch) instead of minting."""

    def test_memo_snap_semantics(self):
        from cudavideostream_tpu.runtime.executor import _RungMemo

        m = _RungMemo()
        m.pinned = (1000, 2000)
        assert m.pick(900, 100, 10_000) == 1000   # snapped up
        assert m.pick(1500, 100, 10_000) == 2000  # next family rung
        # need exceeds the family -> genuine mint
        assert m.pick(2500, 100, 10_000) == 2500
        # family rung beyond the over-fetch bound -> mint, not snap
        m2 = _RungMemo()
        m2.pinned = (10_000,)
        assert m2.pick(1000, 100, 50_000) == 1000

    def test_export_carries_rung_families(self):
        cfg = _cfg()
        rng = np.random.default_rng(21)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex, _ = _drift_session(cfg, base, depth=4, n=16)
        rungs = ex._lander.export_state()["rungs"]
        assert set(rungs) == {"spec_L", "spec_P", "hint_P", "miss_L",
                              "miss_P"}
        assert rungs["spec_L"], rungs

    def test_pinned_session_stays_inside_families(self, tmp_path):
        """A seeded session running the same scene CLASS (but a
        different jitter phase) must not mint scalar rungs outside the
        loaded families — the property that makes the accumulated jit
        cache converge. Byte-exactness is asserted every frame."""
        cfg = _cfg()
        rng = np.random.default_rng(22)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex, _ = _drift_session(cfg, base, depth=4, n=24)
        path = str(tmp_path / "link.json")
        ex.save_link_cache(path)
        saved = ex._lander.export_state()["rungs"]

        ex2, _ = _drift_session(cfg, base, depth=4, n=24,
                                seed_from=path, start=7 * 512)
        for name, memo in ex2._lander._memos().items():
            fam = set(saved[name])
            new = memo.seen - fam
            # a mint is legitimate only past the family's top rung
            assert all(v > max(fam, default=0) for v in new), (
                name, sorted(fam), sorted(memo.seen))

    def test_families_accumulate_across_sessions(self, tmp_path):
        cfg = _cfg()
        rng = np.random.default_rng(23)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex, _ = _drift_session(cfg, base, depth=3, n=12)
        path = str(tmp_path / "link.json")
        ex.save_link_cache(path)
        first = ex._lander.export_state()["rungs"]
        ex2, _ = _drift_session(cfg, base, depth=3, n=12,
                                seed_from=path, start=5 * 512)
        second = ex2._lander.export_state()["rungs"]
        for name in first:
            assert set(first[name]) <= set(second[name])
