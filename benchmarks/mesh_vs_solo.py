"""A/B: `server --mesh 1,1` step vs the solo pipeline step at 1080p.

Round 3 replaced the mesh serving path's carried ``(1, n)`` state and
vmapped Pallas call with a FLAT ``(n,)`` step (``ShardedDeltaPipeline.
step_flat`` / ``_body_b1``) — the two documented hardware traps cost
2-8x each on this kernel (models/batched.py measurements). This harness
records the gain on the real chip, against the solo step as the floor
and the old batched-at-B=1 entry as the regression case:

  * ``solo``            — ``DeltaStreamPipeline._step_impl`` (the floor)
  * ``mesh11 flat shd`` — flat body, payload_layout="sharded"
  * ``mesh11 flat rep`` — flat body, payload_layout="replicated"
  * ``mesh11 B=1 old``  — the batched body at B=1 (carried (1, n)
    state + vmapped pallas_call): what `server --mesh` ran before r3

All four run the same fused step semantics (overlay on, tiled emit for
solo, shard blocks for mesh) on the same synthetic frame stream,
scan-chained and RTT-corrected (utils.timing.bench_scan_chain). The
solo row doubles as the same-run contention calibration.

Run on TPU:  python benchmarks/mesh_vs_solo.py [--out benchmarks/mesh_vs_solo]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = 24
ITERS = 4


def run(out_path: str | None = None, small: bool = False):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts
    from cudavideostream_tpu.utils.timing import bench_scan_chain

    import dataclasses

    # --small: CPU smoke test of the harness itself (interpret-mode
    # Pallas at 1080p is intractable); timings are meaningless there.
    cfg = StreamConfig(height=48, width=64) if small else StreamConfig()
    # solo serving fast path uses the tiled emit (server --tiled); the
    # mesh pipelines have their own shard-block emit and take cfg as-is
    cfg_solo = dataclasses.replace(cfg, tiled_payload=True)
    n = cfg.frame_bytes
    init_frame, next_frame = device_synthetic_frames(cfg, seed=0, noise_bank=8)

    text = "FPS: 30 BW: 5 kbps"
    ids = jnp.asarray(fonts.encode_text(text, 28), jnp.int32)
    n_chars = jnp.int32(len(text))

    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "space")
    )

    solo = DeltaStreamPipeline(cfg_solo)
    mesh_shd = ShardedDeltaPipeline(cfg, mesh, payload_layout="sharded")
    mesh_rep = ShardedDeltaPipeline(cfg, mesh, payload_layout="replicated")

    prev0 = jnp.asarray(np.asarray(init_frame))
    key0 = jax.random.PRNGKey(7)

    def digest_of(xs, vals):
        return jnp.sum(xs) + jnp.sum(vals.astype(jnp.int32))

    def chain_solo(c):
        prev, key, acc = c
        key, sub = jax.random.split(key)
        frame = next_frame(sub, jnp.int32(0))
        out = solo._step_impl(prev, frame, ids, n_chars)
        xs, vals = out[3], out[4]
        return (out[0], key, acc + digest_of(xs, vals))

    def make_chain_flat(pipe):
        ids1 = jnp.asarray(fonts.encode_text(text, 28), jnp.int32)

        def chain(c):
            prev, key, acc = c
            key, sub = jax.random.split(key)
            frame = next_frame(sub, jnp.int32(0))
            out = pipe._step_b1(prev, frame, ids1, n_chars)
            xs, vals = out[2], out[3]
            return (out[0], key, acc + digest_of(xs, vals))

        return chain

    def make_chain_b1_old(pipe):
        """The pre-r3 serving path: (1, n) carried state through the
        batched body (vmapped pallas_call at Bl=1)."""
        ids2 = jnp.asarray(
            fonts.encode_text(text, 28), jnp.int32
        )[None]
        nch2 = jnp.asarray([len(text)], jnp.int32)

        def chain(c):
            prev, key, acc = c
            key, sub = jax.random.split(key)
            frame = next_frame(sub, jnp.int32(0))[None]
            out = pipe._step(prev, frame, ids2, nch2)
            xs, vals = out[2], out[3]
            return (out[0], key, acc + digest_of(xs, vals))

        return chain

    rows = []

    def measure(name, chain, init_prev):
        ms = bench_scan_chain(
            chain, (init_prev, key0, jnp.int32(0)), k=K, iters=ITERS
        )
        rows.append((name, ms))
        print(f"{name:>18}: {ms:7.3f} ms/step", file=sys.stderr)

    measure("solo", chain_solo, prev0)
    measure(
        "mesh11 flat shd",
        make_chain_flat(mesh_shd),
        jax.device_put(prev0, mesh_shd._sharding_flat),
    )
    measure(
        "mesh11 flat rep",
        make_chain_flat(mesh_rep),
        jax.device_put(prev0, mesh_rep._sharding_flat),
    )
    measure(
        "mesh11 B=1 old",
        make_chain_b1_old(mesh_shd),
        jax.device_put(prev0[None], mesh_shd._sharding_state),
    )

    lines = [
        f"mesh (1,1) serving step vs solo at {cfg.height}x{cfg.width}, "
        f"backend={jax.default_backend()}",
        f"K={K} ITERS={ITERS} (scan-chained, RTT-corrected)",
        "",
    ]
    lines += [f"{name:>18}: {ms:7.3f} ms/step" for name, ms in rows]
    body = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(body)
    print(body)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--small", action="store_true")
    a = ap.parse_args()
    run(a.out, small=a.small)
