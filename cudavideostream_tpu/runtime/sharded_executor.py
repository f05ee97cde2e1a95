"""Serving executor over the multi-chip sharded pipeline.

Promotes :class:`~cudavideostream_tpu.parallel.sharded.ShardedDeltaPipeline`
from a library component to the product path: the server can run one
video stream with its state and compute sharded across a
``(data=1, space=S)`` mesh (``--mesh 1,S``), speaking the identical
wire protocol. The reference has no multi-device notion at all
(SURVEY.md §2.2 — its widest parallelism is one GPU's threads).

With the default ``"sharded"`` payload layout there are zero payload
collectives: each space-shard compacts locally with the full sub-tiled/
pair-packed fast kernel and emits its compaction units as first-class
wire tiles (TILED emit with the shard base riding the kernel's
``index_offset`` operand, so unit blocks hold GLOBAL indices — no
per-shard merge epilogue, no globalization pass). The result is shaped
exactly like a single-chip tiled payload whose tile axis spans all
shards, and lands through the same density-adaptive
:class:`~cudavideostream_tpu.runtime.executor.TiledLander` — never a
full-capacity fetch, which over the documented ~16 MB/s tunnel would
cost seconds per frame. The ``"replicated"`` layout assembles the flat
payload on device with collectives instead, and lands it through
tiered ``pos``-prefix fetches like the solo executor.

Feature parity with the solo executor (``--mesh`` must not silently
drop flags): per-byte ``threshold_map`` shards along rows like the
frame, and :class:`PipelinedShardedExecutor` overlaps frame N's compute
with frame N-1's landing exactly like the single-chip
``PipelinedExecutor``.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from cudavideostream_tpu.config import StreamConfig, Visualizer
from cudavideostream_tpu.runtime.executor import (
    ExecMetrics,
    LinkStats,
    TieredFetcher,
    TiledLander,
)


def make_mesh(n_data: int, n_space: int):
    """Build a ``(data=n_data, space=n_space)`` mesh over the first
    ``n_data * n_space`` visible devices."""
    from cudavideostream_tpu.parallel import make_mesh as _mm

    return _mm(n_devices=n_data * n_space, data_parallel=n_data)


class ShardedStreamExecutor:
    """Drives one stream (B=1) through the sharded pipeline.

    Drop-in for :class:`~cudavideostream_tpu.runtime.executor.StreamExecutor`
    from the server's point of view: ``start`` / ``process`` / ``flush``
    with the same return conventions (``process`` returns a
    ``TiledPayload`` under the ``"sharded"`` layout, flat arrays under
    ``"replicated"``).
    """

    def __init__(self, config: StreamConfig, mesh=None,
                 payload_layout: str = "sharded",
                 threshold_map: Optional[np.ndarray] = None):
        from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline

        if mesh is None:
            import jax

            mesh = make_mesh(1, len(jax.devices()))
        if config.tiled_payload:
            raise ValueError(
                "tiled_payload is a single-chip emit mode; the sharded "
                "executor's analogue is payload_layout='sharded'"
            )
        if mesh.shape["data"] != 1:
            # this executor serves exactly one stream (B=1 state); a
            # data axis > 1 would fail deep inside device_put with an
            # opaque partition error. Data sharding of many streams is
            # runtime.multiserve --mesh.
            raise ValueError(
                f"server --mesh serves one stream: data axis must be 1 "
                f"(got data={mesh.shape['data']}); use multiserve --mesh "
                f"D,S for multi-stream data sharding"
            )
        self.cfg = config
        self.pipe = ShardedDeltaPipeline(config, mesh,
                                         payload_layout=payload_layout,
                                         threshold_map=threshold_map)
        self.payload_layout = payload_layout
        self._state = None
        self.link = LinkStats()
        # sharded layout: the flat step's per-shard TILED emit hands the
        # host a single-chip-shaped tiled payload (unit blocks spanning
        # all shards, count prefix each) — land it through the same
        # density-adaptive tiles/flat lander as the solo tiled executor.
        # (The per-shard count-prefix "shards" mode remains the batched
        # multiserve landing, where each tile IS a full shard.)
        #
        # EXCEPT when the mesh actually shards the payload (n_space > 1):
        # the lander's flat landing runs ``logcompact.merge_tiles`` — a
        # pallas_call with no SPMD partitioning rule — on unit blocks
        # living P("space") across devices, which at best forces a
        # per-frame full all-gather (the exact cost the zero-collective
        # layout exists to avoid) and at worst fails to lower. Pin the
        # lander to the per-tile block path; "auto"/"flat" only make
        # sense on a (1,1) mesh where the arrays are single-device.
        lander_mode = config.fetch_mode
        if payload_layout == "sharded" and self.pipe.n_space > 1:
            lander_mode = "tiles"
        self._lander = TiledLander(lander_mode, self.link)
        self._fetch_xs = TieredFetcher(config.frame_bytes, stats=self.link)
        self._fetch_vals = TieredFetcher(config.frame_bytes, stats=self.link)
        self.metrics = ExecMetrics()

    def start(self, base_frame: np.ndarray) -> np.ndarray:
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        # FLAT (frame_bytes,) state: a (1, n) uint8 buffer carried
        # across jit boundaries pads its sublane dim 1 -> 8 (up to 8x
        # the HBM bytes per pass) — the serving path uses the
        # pipeline's flat single-stream step throughout
        self._state = self.pipe.init_state_flat(base)
        return base

    def process(
        self, frame: np.ndarray, text: str = ""
    ) -> Tuple[int, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0 = time.perf_counter()
        out = self.pipe.step_flat(self._state, frame, text=text)
        self._state = out[0]
        return self._land(t0, out[1:])

    def _land(self, t0, rest):
        aux_d = rest[3]
        aux = (
            np.asarray(aux_d)
            if self.cfg.visualizer != Visualizer.NONE
            else None
        )
        if self.payload_layout == "sharded":
            counts_d, xs_d, vals_d = rest[0], rest[1], rest[2]
            counts = np.asarray(counts_d).astype(np.int32)
            pos = int(counts.sum())
            payload = self._lander.land(pos, counts, counts_d, xs_d, vals_d)
            self.metrics.record(time.perf_counter() - t0, pos)
            return pos, payload, None, aux
        pos = int(np.asarray(rest[0]))
        if isinstance(rest[1], np.ndarray) or pos <= 0:
            xs = self._fetch_xs.fetch(rest[1], pos)
            vals = self._fetch_vals.fetch(rest[2], pos)
        else:
            # one device_get for both prefixes (one link round trip)
            import jax

            t = self._fetch_xs.tier_checked(pos)
            xs, vals = jax.device_get((rest[1][:t], rest[2][:t]))
            xs, vals = xs[:pos], vals[:pos]
        self.metrics.record(time.perf_counter() - t0, pos)
        return pos, xs, vals, aux

    def flush(self):
        return None


class PipelinedShardedExecutor(ShardedStreamExecutor):
    """One-frame-deep software pipeline over the sharded step: dispatch
    frame N, land frame N-1's payload while N computes — identical
    semantics to the single-chip ``PipelinedExecutor`` (output lags one
    frame; call :meth:`flush` after the last frame)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._pending = None

    def process(self, frame, text: str = ""):
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0 = time.perf_counter()
        out = self.pipe.step_flat(self._state, frame, text=text)
        self._state = out[0]
        prev, self._pending = self._pending, (t0, out[1:])
        if prev is None:
            return None
        return self._land(*prev)

    def flush(self):
        prev, self._pending = self._pending, None
        return self._land(*prev) if prev is not None else None
