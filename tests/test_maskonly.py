"""Bitmask-only kernel emission (``config.maskonly_payload`` /
``logcompact.fused_diff_compact(emit="mask")``).

The r4 HBM model (``benchmarks/trace_flagship_tpu_v5e``) showed the
int32 index blocks were HALF of all kernel HBM writes (24.9 MB/frame at
1080p) — and mask-flavor serving never fetches them: the landing reads
the packed change-bits window + the merged vals prefix and rebuilds
indices host-side. This emission deletes the index blocks entirely and
packs the bits *inside* the kernel (vs a separate 2n-byte XLA re-read
of new_prev/prev). The TPU-native endgame of the reference's ``kernel2``
(``kernels.cu:289-334``): the wire format and the kernel output share
one representation. Every test is byte-exact vs the CPU oracle.
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
)
from cudavideostream_tpu.runtime.server import DeltaStreamServer
from cudavideostream_tpu.runtime.sources import SyntheticSource
from tests.conftest import make_frame_pair

jnp = pytest.importorskip("jax.numpy")


def _cfg(**kw):
    base = dict(height=96, width=128, overlay_scale=4,
                tiled_payload=True, fetch_mode="mask", emit_bitmask=True,
                maskonly_payload=True)
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


class TestEmitMaskOp:
    """The core op: emit='mask' vs the oracle and the tiled emit."""

    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.default_rng(42)
        return make_frame_pair(rng, 48 * 64 * 3)

    def _run(self, cur, prev, **kw):
        from cudavideostream_tpu.ops import logcompact

        return logcompact.fused_diff_compact(
            jnp.asarray(cur), jnp.asarray(prev), interpret=True,
            emit="mask", **kw,
        )

    @pytest.mark.parametrize("sub_rows,pair_lanes", [
        (0, False), (1, False), (1, True), (4, False),
    ])
    def test_matches_oracle(self, pair, sub_rows, pair_lanes):
        prev, cur = pair
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, counts, vals_t, bits, new_prev = self._run(
            cur, prev, sub_rows=sub_rows, pair=pair_lanes)
        assert int(pos) == epos
        counts = np.asarray(counts)
        vals_t = np.asarray(vals_t)
        assert int(counts.sum()) == epos
        # vals blocks: unit prefixes concatenate to the flat payload
        vals = np.concatenate(
            [vals_t[t, : counts[t]] for t in range(len(counts))])
        np.testing.assert_array_equal(vals, evals)
        np.testing.assert_array_equal(np.asarray(new_prev), eprev)
        # bits: the exact flat diff.pack_bitmask layout, padded region 0
        bits = np.asarray(bits)
        want = wire.pack_bitmask_from_xs(exs, cur.size)
        np.testing.assert_array_equal(bits[: want.size], want)
        assert int(bits[want.size:].sum()) == 0
        # zero-padding invariant inside every vals block
        for t in range(len(counts)):
            assert int(vals_t[t, counts[t]:].sum()) == 0

    def test_extremes(self):
        n = 3 * 512 * 128          # a few whole tiles
        prev = np.zeros(n, dtype=np.uint8)
        same = prev.copy()
        allchg = np.full(n, 200, dtype=np.uint8)
        for cur, expect in ((same, 0), (allchg, n)):
            pos, counts, vals_t, bits, _ = self._run(cur, prev)
            assert int(pos) == expect
            want = wire.pack_bitmask_from_xs(
                np.flatnonzero(cur != prev).astype(np.int32), n)
            np.testing.assert_array_equal(np.asarray(bits), want)

    def test_unaligned_length(self):
        """n not a multiple of LANES: padded bits past n stay zero."""
        rng = np.random.default_rng(3)
        n = 48 * 64 * 3 + 77
        prev, cur = make_frame_pair(rng, n)
        epos, exs, evals, eprev = ref.diff_encode(cur, prev)
        pos, counts, vals_t, bits, new_prev = self._run(cur, prev)
        assert int(pos) == epos
        want = wire.pack_bitmask_from_xs(exs, n)
        bits = np.asarray(bits)
        np.testing.assert_array_equal(bits[: want.size], want)
        assert int(bits[want.size:].sum()) == 0
        np.testing.assert_array_equal(np.asarray(new_prev)[:n], eprev)

    def test_element_scheme_only(self, pair):
        from cudavideostream_tpu.ops import logcompact

        prev, cur = pair
        with pytest.raises(ValueError, match="element scheme"):
            logcompact.fused_diff_compact(
                jnp.asarray(cur), jnp.asarray(prev), interpret=True,
                emit="mask", scheme="segment")


class TestMergeVals:
    """merge_vals == merge_tiles' vals half, both dispatch sizes."""

    @pytest.mark.parametrize("units,dense", [(16, 0.3), (300, 0.05),
                                             (300, 0.9)])
    def test_matches_merge_tiles(self, units, dense):
        from cudavideostream_tpu.ops import logcompact

        rng = np.random.default_rng(units)
        ub = 128
        m = rng.random((units, ub)) < dense
        vals = np.where(m, rng.integers(1, 255, (units, ub)), 0
                        ).astype(np.uint8)
        # compact each unit's entries to a prefix (the kernel invariant)
        vt = np.zeros_like(vals)
        counts = np.zeros(units, np.int32)
        for u in range(units):
            nz = vals[u][vals[u] != 0]
            vt[u, : nz.size] = nz
            counts[u] = nz.size
        xs_t = np.where(vt != 0, 1, 0).astype(np.int32)  # dummy indices
        got = np.asarray(logcompact.merge_vals(
            jnp.asarray(counts), jnp.asarray(vt)))
        want = np.asarray(logcompact.merge_tiles(
            jnp.asarray(counts), jnp.asarray(xs_t), jnp.asarray(vt))[1])
        pos = int(counts.sum())
        np.testing.assert_array_equal(got[:pos], want[:pos])
        assert int(got[pos:].sum()) == 0


class TestMaskonlyServing:
    @pytest.fixture
    def rng(self):
        return np.random.default_rng(11)

    def test_solo_executor_byte_exact(self, rng):
        cfg = _cfg()
        ex = StreamExecutor(cfg)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        for k in range(5):
            f = _band_frame(base, 900 * k, 2600, 30 + k)
            out = ex.process(f)
            prev = _check([out], [f], prev)
        np.testing.assert_array_equal(ex.resync(), prev)

    def test_batched_depth3_byte_exact(self, rng):
        cfg = _cfg()
        ex = BatchedLandExecutor(cfg, depth=3)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        prev = base.copy()
        pending = []
        for k in range(10):
            f = _band_frame(base, 600 * k, 2600, 40 + k)
            out = ex.process(f)
            pending.append(f)
            if out is not None:
                prev = _check(out, pending[: len(out)], prev)
                pending = pending[len(out):]
        tail = ex.flush()
        if tail:
            prev = _check(tail, pending, prev)
        np.testing.assert_array_equal(ex.resync(), prev)

    def test_overlay_text_frames_byte_exact(self, rng):
        """Text-change (volatile) frames ride the miss path; the
        OverlayShadow hint path must stay exact with no index blocks."""
        cfg = _cfg(height=384, width=512)
        K = 4
        ex = BatchedLandExecutor(cfg, depth=K)
        n = cfg.frame_bytes
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        ex.start(base)
        lo = n // 2
        recon = base.copy()
        for t in range(4 * K):
            text = f"FPS {t // 6}"
            f = _band_frame(base, lo + (t * 4096) % (n // 2 - 60000),
                            60000, 50 + t)
            out = ex.process(f, text=text)
            if out is not None:
                for pos, xs, vals, _aux in out:
                    if isinstance(xs, (wire.TiledPayload,
                                       wire.MaskPayload)):
                        fx, fv = xs.to_flat()
                    else:
                        fx, fv = xs, vals
                    recon[np.asarray(fx)] += np.asarray(fv)[:pos]
        for r in ex.flush() or []:
            pos, xs, vals, _aux = r
            if isinstance(xs, (wire.TiledPayload, wire.MaskPayload)):
                fx, fv = xs.to_flat()
            else:
                fx, fv = xs, vals
            recon[np.asarray(fx)] += np.asarray(fv)[:pos]
        np.testing.assert_array_equal(ex.resync(), recon)

    def test_mask_payload_zero_index(self, rng):
        """maskonly + mask_payload: the landing returns MaskPayload —
        no int32 index stream exists anywhere between kernel and wire."""
        cfg = _cfg(mask_payload=True)
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
                fx, fv = xs.to_flat()
            elif isinstance(xs, wire.TiledPayload):
                fx, fv = xs.to_flat()
            else:
                fx, fv = xs, vals
            np.testing.assert_array_equal(np.asarray(fx), xr)
            np.testing.assert_array_equal(np.asarray(fv)[:pr], vr)
        assert saw_mask >= 4

    def test_loopback_v4_byte_exact(self, tmp_path):
        """server --maskonly --wire v4 --land-batch 3 over a real
        socket: the auto-sniffing client reconstructs byte-exactly."""
        cfg = _cfg(port=0, wire_format="v4", mask_payload=True)
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
        assert cli.wire_format == "v4"
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


class TestValidation:
    def test_config_requires_emit_bitmask(self):
        with pytest.raises(ValueError, match="emit_bitmask"):
            StreamConfig(height=48, width=64, tiled_payload=True,
                         fetch_mode="mask", maskonly_payload=True)

    def test_config_requires_mask_fetch(self):
        with pytest.raises(ValueError, match="maskonly"):
            StreamConfig(height=48, width=64, tiled_payload=True,
                         fetch_mode="tiles", emit_bitmask=True,
                         maskonly_payload=True)

    def test_cli_requires_fetch_mask(self):
        from cudavideostream_tpu.runtime.server import main

        with pytest.raises(SystemExit):
            main(["--tiled", "--maskonly", "--wire", "v4"])

    def test_lander_rejects_wrong_mode(self, monkeypatch):
        """A maskonly item through a non-mask lander must fail loudly,
        never silently land through a different flavor."""
        cfg = _cfg()
        ex = StreamExecutor(cfg)
        monkeypatch.setattr(ex._lander, "mode", "tiles")
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                            dtype=np.uint8)
        ex.start(base)
        with pytest.raises(ValueError, match="mask"):
            ex.process(_band_frame(base, 0, 2600, 30))
