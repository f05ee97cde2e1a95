"""Batched multi-stream throughput: B x 1080p streams on one chip.

The reference's ceiling is one camera (threads.cpp:166-179). One jitted
batched step amortizes dispatch across streams; this measures aggregate
and per-stream fps for several B (scan-chained, on-device frames), and
— since round 3 — the same with a visualizer or the noise filter
enabled (they ride the super-frame fast path now; see models.batched)
plus a past-the-grid-bound B (the batch chunks into several kernel
calls instead of dropping to the vmap path).

Run on TPU:  ``python benchmarks/batched.py [--out benchmarks/times_batched]``
"""

from __future__ import annotations

import argparse
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def _bench_one(cfg, B, label, T=12, iters=4):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.models import BatchedDeltaPipeline
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts
    from cudavideostream_tpu.utils.timing import measure_rtt

    init_frame, next_frame = device_synthetic_frames(cfg, seed=0)
    ids1 = fonts.encode_text("FPS: 240", 28)
    pipe = BatchedDeltaPipeline(cfg, B)
    ids = jnp.asarray(np.stack([ids1] * B), jnp.int32)
    nch = jnp.full((B,), 8, jnp.int32)
    has_aux = cfg.visualizer.value != 0

    # one generated frame tiled across streams: content (and thus
    # per-stream payload work) is identical for every stream, and the
    # on-device synthetic generator — which is NOT the system under
    # test — is paid once per step instead of B times
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
        if has_aux:
            # full reduce: a partial read would let XLA dead-code the
            # aux computation away
            digest = digest + jnp.sum(out[5].astype(jnp.int32))
        return (prev, key), digest

    @jax.jit
    def run_scan(prev, keys):
        return jax.lax.scan(scan_step, (prev, keys), jnp.arange(T))

    prev0 = jnp.concatenate([jnp.asarray(np.asarray(init_frame))] * B)
    keys0 = jax.random.PRNGKey(0)

    (_, _), d = run_scan(prev0, keys0)
    _ = jax.device_get(d.ravel()[0])
    # ~30 ms tunnel sync round-trip would otherwise be charged to
    # the T*ITERS frames
    rtt = measure_rtt(d)
    t0 = time.perf_counter()
    c = (prev0, keys0)
    for _ in range(iters):
        c, d = run_scan(*c)
    _ = jax.device_get(d.ravel()[0])
    dt = max(1e-9, time.perf_counter() - t0 - rtt)
    agg = iters * T * B / dt
    print(f"{label:24s} B={B:2d}  aggregate {agg:8.1f} fps  "
          f"per-stream {agg/B:8.1f} fps", flush=True)
    return agg


def run(out_path: str | None = None, batches=(1, 2, 4, 8)):
    import dataclasses

    import jax

    from cudavideostream_tpu.config import StreamConfig, Visualizer

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = StreamConfig(tiled_payload=True) if on_tpu else StreamConfig(
        height=48, width=64, tiled_payload=True
    )
    rows = []
    for B in batches:
        rows.append(("plain", B, _bench_one(cfg, B, "plain")))
    # the filter/visualizer family on the fast path (VERDICT r2 #2):
    # must stay within ~1.5x of the plain row at the same B
    feature_cfgs = [
        ("visualizer=heatmap", dataclasses.replace(
            cfg, visualizer=Visualizer.HEATMAP)),
        ("visualizer=binarize", dataclasses.replace(
            cfg, visualizer=Visualizer.BINARIZE)),
        ("noise-filter k3", dataclasses.replace(cfg, noise_filter=True)),
    ]
    for label, fcfg in feature_cfgs:
        rows.append((label, 8, _bench_one(fcfg, 8, label)))
    # past the grid bound: B=24 at 1080p chunks into ceil(24/20)=2
    # super-frame kernel calls — there must be no vmap-path cliff
    if on_tpu:
        rows.append(("plain (chunked)", 24, _bench_one(cfg, 24, "plain (chunked)")))
        rows.append(("plain (chunked)", 40, _bench_one(cfg, 40, "plain (chunked)")))

    if out_path:
        with open(out_path, "w") as f:
            f.write(f"# config\tB\taggregate_fps\tper_stream_fps "
                    f"({cfg.height}x{cfg.width}, tiled emit, scan-chained)\n")
            for label, B, agg in rows:
                f.write(f"{label}\t{B}\t{agg:.1f}\t{agg/B:.1f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
