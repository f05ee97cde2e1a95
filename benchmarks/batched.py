"""Batched multi-stream throughput: B x 1080p streams on one chip.

The reference's ceiling is one camera (threads.cpp:166-179). One jitted
batched step amortizes dispatch across streams; this measures aggregate
and per-stream fps for several B (scan-chained, on-device frames).

Run on TPU:  ``python benchmarks/batched.py [--out benchmarks/times_batched]``
"""

from __future__ import annotations

import argparse
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(out_path: str | None = None, batches=(1, 2, 4, 8)):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import BatchedDeltaPipeline
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = StreamConfig(tiled_payload=True) if on_tpu else StreamConfig(
        height=48, width=64, tiled_payload=True
    )
    init_frame, next_frame = device_synthetic_frames(cfg, seed=0)
    ids1 = fonts.encode_text("FPS: 240", 28)
    T, ITERS = 12, 4
    rows = []
    for B in batches:
        pipe = BatchedDeltaPipeline(cfg, B)
        ids = jnp.asarray(np.stack([ids1] * B), jnp.int32)
        nch = jnp.full((B,), 8, jnp.int32)
        vnext = jax.vmap(next_frame, in_axes=(0, None))

        def scan_step(carry, t):
            prev, keys = carry
            keys = jax.vmap(jax.random.split, in_axes=0, out_axes=1)(keys)
            keys, subs = keys[0], keys[1]
            frames = vnext(subs, t)
            out = pipe._step(prev, frames, ids, nch)
            prev = out[0]
            digest = jnp.sum(out[3]) + jnp.sum(out[4].astype(jnp.int32))
            return (prev, keys), digest

        @jax.jit
        def run_scan(prev, keys):
            return jax.lax.scan(scan_step, (prev, keys), jnp.arange(T))

        prev0 = jnp.stack([jnp.asarray(np.asarray(init_frame))] * B)
        keys0 = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
        (_, _), d = run_scan(prev0, keys0)
        _ = jax.device_get(d.ravel()[0])
        t0 = time.perf_counter()
        c = (prev0, keys0)
        for _ in range(ITERS):
            c, d = run_scan(*c)
        _ = jax.device_get(d.ravel()[0])
        dt = time.perf_counter() - t0
        agg = ITERS * T * B / dt
        rows.append((B, agg, agg / B))
        print(f"B={B:2d}  aggregate {agg:8.1f} fps  per-stream {agg/B:8.1f} fps",
              flush=True)
    if out_path:
        with open(out_path, "w") as f:
            f.write(f"# B\taggregate_fps\tper_stream_fps "
                    f"({cfg.height}x{cfg.width}, tiled emit, scan-chained)\n")
            for B, agg, per in rows:
                f.write(f"{B}\t{agg:.1f}\t{per:.1f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
