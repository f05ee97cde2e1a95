"""Diagnose the mesh11 serving-step cost (benchmarks/mesh_vs_solo).

mesh_vs_solo recorded ~226 ms/step for every mesh variant vs 0.225 ms
solo — a 1000x gap that cannot be kernel time (the same Pallas kernel
runs per shard, and the (1,1) mesh shards nothing). This harness
separates the candidate costs:

  * per-CALL cost: scan K=1 — one jit dispatch+sync round trip per call
    (tunnel dispatch, resharding of the carried state, executable
    lookup);
  * per-STEP cost: (t(K) - t(1)) / (K - 1) — the marginal cost of one
    more chained step INSIDE the compiled scan (real device time);
  * retrace/recompile: each timed invocation reported separately — a
    slow second call means the scan output carry's sharding differs
    from its input and forces a second executable.

Run on TPU:  python benchmarks/mesh_diag.py [--out benchmarks/mesh_diag]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(out_path: str | None = None, small: bool = False):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts
    from cudavideostream_tpu.utils.timing import measure_rtt

    import dataclasses

    cfg = StreamConfig(height=48, width=64) if small else StreamConfig()
    init_frame, next_frame = device_synthetic_frames(cfg, seed=0, noise_bank=8)
    text = "FPS: 30 BW: 5 kbps"
    ids = jnp.asarray(fonts.encode_text(text, 28), jnp.int32)
    n_chars = jnp.int32(len(text))

    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "space")
    )
    pipe = ShardedDeltaPipeline(cfg, mesh, payload_layout="sharded")
    solo = DeltaStreamPipeline(dataclasses.replace(cfg, tiled_payload=True))

    prev0 = jnp.asarray(np.asarray(init_frame))
    key0 = jax.random.PRNGKey(7)

    lines = []

    def emit(s):
        print(s, flush=True)
        lines.append(s)

    def chain_mesh(c):
        prev, key, acc = c
        key, sub = jax.random.split(key)
        frame = next_frame(sub, jnp.int32(0))
        out = pipe._step_b1(prev, frame, ids, n_chars)
        xs, vals = out[2], out[3]
        return (out[0], key, acc + jnp.sum(xs) + jnp.sum(vals.astype(jnp.int32)))

    def chain_solo(c):
        prev, key, acc = c
        key, sub = jax.random.split(key)
        frame = next_frame(sub, jnp.int32(0))
        out = solo._step_impl(prev, frame, ids, n_chars)
        xs, vals = out[3], out[4]
        return (out[0], key, acc + jnp.sum(xs) + jnp.sum(vals.astype(jnp.int32)))

    def diag(name, chain, init_prev, ks=(1, 8, 24), calls=5):
        init = (init_prev, key0, jnp.int32(0))
        for k in ks:
            @jax.jit
            def run_(c, _k=k):
                return jax.lax.scan(
                    lambda c, _: (chain(c), None), c, None, length=_k
                )[0]

            t0 = time.perf_counter()
            c = run_(init)
            jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])
            t_compile = time.perf_counter() - t0
            rtt = measure_rtt(jax.tree_util.tree_leaves(c)[0])
            # sharding drift check: does the carry keep its input sharding?
            in_sh = getattr(init[0], "sharding", None)
            out_sh = getattr(c[0], "sharding", None)
            drift = "DRIFT" if str(in_sh) != str(out_sh) else "stable"
            per_call = []
            c = init
            for _ in range(calls):
                t0 = time.perf_counter()
                c = run_(c)
                jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])
                per_call.append(time.perf_counter() - t0 - rtt)
            emit(
                f"{name} K={k:2d}: compile+1st {t_compile:6.1f}s  "
                f"sharding {drift}  calls(ms) "
                + " ".join(f"{1e3 * t:8.1f}" for t in per_call)
            )

    emit(f"mesh (1,1) step diagnosis at {cfg.height}x{cfg.width}, "
         f"backend={jax.default_backend()}")
    diag("solo     ", chain_solo, prev0)
    diag("mesh flat", chain_mesh,
         jax.device_put(prev0, pipe._sharding_flat))

    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--small", action="store_true")
    a = ap.parse_args()
    run(a.out, small=a.small)
