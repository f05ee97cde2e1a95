"""Serving executor over the multi-chip sharded pipeline.

Promotes :class:`~cudavideostream_tpu.parallel.sharded.ShardedDeltaPipeline`
from a library component to the product path: the server can run one
video stream with its state and compute sharded across a
``(data=1, space=S)`` mesh (``--mesh 1,S``), speaking the identical
wire protocol. The reference has no multi-device notion at all
(SURVEY.md §2.2 — its widest parallelism is one GPU's threads).

With the default ``"sharded"`` payload layout there are zero payload
collectives: each space-shard's locally-compacted block and count stay
in place, and the shard axis is handed to the scatter-gather sender as
the tile axis of a :class:`~cudavideostream_tpu.runtime.wire.TiledPayload`
— the multi-chip analogue of the single-chip tiled emit. The
``"replicated"`` layout assembles the flat payload on device with
collectives instead (all_gather + psum of disjoint blocks).
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

from cudavideostream_tpu.config import StreamConfig, Visualizer
from cudavideostream_tpu.runtime.executor import ExecMetrics


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
                 payload_layout: str = "sharded"):
        from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline

        if mesh is None:
            import jax

            mesh = make_mesh(1, len(jax.devices()))
        if config.tiled_payload:
            raise ValueError(
                "tiled_payload is a single-chip emit mode; the sharded "
                "executor's analogue is payload_layout='sharded'"
            )
        self.cfg = config
        self.pipe = ShardedDeltaPipeline(config, mesh,
                                         payload_layout=payload_layout)
        self.payload_layout = payload_layout
        self._state = None
        self.metrics = ExecMetrics()

    def start(self, base_frame: np.ndarray) -> np.ndarray:
        base = np.asarray(base_frame, dtype=np.uint8).ravel()
        self._state = self.pipe.init_state(base)
        return base

    def process(
        self, frame: np.ndarray, text: str = ""
    ) -> Tuple[int, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
        if self._state is None:
            raise RuntimeError("call start(base_frame) first")
        t0 = time.perf_counter()
        out = self.pipe.step(self._state, frame, text=text)
        self._state = out[0]
        aux_d = out[4]
        aux = (
            np.asarray(aux_d)[0]
            if self.cfg.visualizer != Visualizer.NONE
            else None
        )
        if self.payload_layout == "sharded":
            counts, xs, vals = out[1], out[2], out[3]
            payload = self.pipe.payload_tiles(counts, xs, vals, 0)
            self.metrics.record(time.perf_counter() - t0, payload.pos)
            return payload.pos, payload, None, aux
        pos = int(np.asarray(out[1])[0])
        xs = np.asarray(out[2])[0][:pos]
        vals = np.asarray(out[3])[0][:pos]
        self.metrics.record(time.perf_counter() - t0, pos)
        return pos, xs, vals, aux

    def flush(self):
        return None
