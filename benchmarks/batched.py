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

        # one generated frame tiled across streams: content (and thus
        # per-stream payload work) is identical for every stream, and
        # the on-device synthetic generator — which is NOT the system
        # under test — is paid once per step instead of B times
        def scan_step(carry, t):
            prev, key = carry
            key, sub = jax.random.split(key)
            f1 = next_frame(sub, t)
            # 1-D concat, NOT jnp.tile: tile's (B, n) broadcast
            # intermediate takes a padded-sublane layout for B < 8 and
            # its reshape back to flat is a slow strided copy (measured
            # +2.9 ms at B=2)
            frames = jnp.concatenate([f1] * B)
            out = pipe._step(prev, frames, ids, nch)
            prev = out[0]
            digest = jnp.sum(out[2]) + out[1][0]  # counts + pos[0]
            return (prev, key), digest

        @jax.jit
        def run_scan(prev, keys):
            return jax.lax.scan(scan_step, (prev, keys), jnp.arange(T))

        prev0 = jnp.concatenate([jnp.asarray(np.asarray(init_frame))] * B)
        keys0 = jax.random.PRNGKey(0)
        from cudavideostream_tpu.utils.timing import measure_rtt

        (_, _), d = run_scan(prev0, keys0)
        _ = jax.device_get(d.ravel()[0])
        # ~30 ms tunnel sync round-trip would otherwise be charged to
        # the T*ITERS frames
        rtt = measure_rtt(d)
        t0 = time.perf_counter()
        c = (prev0, keys0)
        for _ in range(ITERS):
            c, d = run_scan(*c)
        _ = jax.device_get(d.ravel()[0])
        dt = max(1e-9, time.perf_counter() - t0 - rtt)
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
