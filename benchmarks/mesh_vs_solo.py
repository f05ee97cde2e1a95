"""A/B: `server --mesh 1,1` step vs the solo pipeline step at 1080p.

Round 3 replaced the mesh serving path's carried ``(1, n)`` state and
vmapped Pallas call with a FLAT ``(n,)`` step (``ShardedDeltaPipeline.
step_flat`` / ``_body_b1``), then made it emit per-shard wire tiles
(kernel ``index_offset``). Rows, most- to least-product-shaped:

  * ``solo``      — ``DeltaStreamPipeline._step_impl`` (the floor)
  * ``shd-inner`` — the sharded serving BODY (``_stream_body`` with
    the per-shard tiled emit), scan-chained INSIDE the shard_map:
    the device time of the mesh step. At (1,1) its optimized HLO is
    op-for-op IDENTICAL to the unsharded body's (verified by compiling
    both and diffing the op inventories — shard_map adds nothing to
    the compiled program when the loop lives inside the manual
    region), so this row is the honest mesh-vs-solo device comparison.
  * ``shd`` / ``rep`` — ``_step_b1`` (jit(shard_map)) called per step
    from an OUTER scan, sharded / replicated payload layouts. Each
    step re-enters the manual-sharding region; XLA stitches the
    closed_call into the loop with pad/slice/copy boundary passes that
    cost ~2 ms/step at 1080p — a real cost of scan-around-shard_map,
    but NOT a cost the server pays (serving dispatches the step at top
    level on persistently-sharded donated buffers; a plain nested jit
    WITHOUT shard_map measures 0.215 ms/step in the same harness).
  * ``b1 old``    — the pre-r3 serving path ((1, n) carried state +
    vmapped pallas_call): the regression case.

METHODOLOGY (three hard-won rules):

1. One row per PROCESS. Measuring several 1080p mesh pipelines in one
   process inflates later rows up to 2x (measured: rep read 4.6-5.0 ms
   after the shd row ran first; 2.5-2.8 ms alone — executable/buffer
   state from earlier rows degrades later ones). The parent spawns a
   subprocess per row; each prints ``ROW <name> <ms>``.
2. Scan-chained + RTT-corrected inside each row
   (utils.timing.bench_scan_chain or the equivalent inline loop).
3. The source must ADVANCE ``t`` every step. The pre-r3 records held
   ``t=0``: with the noise bank the frame is a pure function of ``t``,
   so every step saw an identical frame — deltas collapse to ~zero
   after the first step (all tiles static-skip) and XLA hoists the
   loop-invariant frame generation out of the scan entirely. Those
   records compared the rows' IDLE steps. All rows now thread ``t``
   through the carry (moving box + cycling noise planes), so the
   comparison runs under real payload load.

Run on TPU:  python benchmarks/mesh_vs_solo.py [--out benchmarks/mesh_vs_solo]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = 24
ITERS = 4

ROWS = ["solo", "inner-ctl", "shd-inner", "shd", "rep", "b1old"]


def _cfgs(small: bool):
    import dataclasses

    from cudavideostream_tpu.config import StreamConfig

    # --small: CPU smoke test of the harness itself (interpret-mode
    # Pallas at 1080p is intractable); timings are meaningless there.
    cfg = StreamConfig(height=48, width=64) if small else StreamConfig()
    # solo serving fast path uses the tiled emit (server --tiled); the
    # mesh pipelines have their own shard-block emit and take cfg as-is
    cfg_solo = dataclasses.replace(cfg, tiled_payload=True)
    return cfg, cfg_solo


def run_row(row: str, small: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts
    from cudavideostream_tpu.utils.timing import bench_scan_chain

    cfg, cfg_solo = _cfgs(small)
    init_frame, next_frame = device_synthetic_frames(cfg, seed=0, noise_bank=8)

    text = "FPS: 30 BW: 5 kbps"
    ids = jnp.asarray(fonts.encode_text(text, 28), jnp.int32)
    n_chars = jnp.int32(len(text))

    mesh = jax.sharding.Mesh(
        np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "space")
    )
    prev0 = jnp.asarray(np.asarray(init_frame))
    key0 = jax.random.PRNGKey(7)

    def digest_of(xs, vals):
        return jnp.sum(xs) + jnp.sum(vals.astype(jnp.int32))

    if row == "solo":
        solo = DeltaStreamPipeline(cfg_solo)

        def chain(c):
            prev, key, acc, t = c
            key, sub = jax.random.split(key)
            frame = next_frame(sub, t)
            out = solo._step_impl(prev, frame, ids, n_chars)
            return (out[0], key, acc + digest_of(out[3], out[4]), t + 1)

        return bench_scan_chain(
            chain, (prev0, key0, jnp.int32(0), jnp.int32(0)),
            k=K, iters=ITERS)

    if row == "shd-inner":
        return _run_inner(cfg, mesh, prev0, ids, n_chars, sharded=True)

    if row == "inner-ctl":
        # the UNSHARDED control for shd-inner: same body, same in-scan
        # source, no shard_map — the delta between these two rows is
        # what sharding itself costs the serving body at (1,1)
        return _run_inner(cfg, mesh, prev0, ids, n_chars, sharded=False)

    if row in ("shd", "rep"):
        layout = "sharded" if row == "shd" else "replicated"
        pipe = ShardedDeltaPipeline(cfg, mesh, payload_layout=layout)

        def chain(c):
            prev, key, acc, t = c
            key, sub = jax.random.split(key)
            frame = next_frame(sub, t)
            out = pipe._step_b1(prev, frame, ids, n_chars)
            return (out[0], key, acc + digest_of(out[2], out[3]), t + 1)

        return bench_scan_chain(
            chain,
            (jax.device_put(prev0, pipe._sharding_flat), key0,
             jnp.int32(0), jnp.int32(0)),
            k=K, iters=ITERS,
        )

    if row == "b1old":
        # the pre-r3 serving path: (1, n) carried state through the
        # batched body (vmapped pallas_call at Bl=1)
        pipe = ShardedDeltaPipeline(cfg, mesh, payload_layout="sharded")
        ids2 = jnp.asarray(fonts.encode_text(text, 28), jnp.int32)[None]
        nch2 = jnp.asarray([len(text)], jnp.int32)

        def chain(c):
            prev, key, acc, t = c
            key, sub = jax.random.split(key)
            frame = next_frame(sub, t)[None]
            out = pipe._step(prev, frame, ids2, nch2)
            return (out[0], key, acc + digest_of(out[2], out[3]), t + 1)

        return bench_scan_chain(
            chain,
            (jax.device_put(prev0[None], pipe._sharding_state),
             key0, jnp.int32(0), jnp.int32(0)),
            k=K, iters=ITERS,
        )

    raise SystemExit(f"unknown row {row!r}")


def _run_inner(cfg, mesh, prev0, ids, n_chars, sharded=True):
    """Device time of the sharded serving body: K steps scan-chained
    INSIDE the shard_map (the manual-region boundary is crossed once
    per chain, as it is once per top-level dispatch in the server —
    not once per frame as scan-around-shard_map would charge).

    Frames are generated per shard from a row-sharded noise bank plus
    the same moving box as ``device_synthetic_frames`` computed in
    GLOBAL coordinates, so per-frame delta statistics match the other
    rows.
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline
    from cudavideostream_tpu.utils.timing import measure_rtt

    pipe = ShardedDeltaPipeline(cfg, mesh, payload_layout="sharded")
    Ln, Lr = pipe.local_bytes, pipe.local_rows
    h, w = cfg.height, cfg.width
    nb = 8
    bg = jax.random.randint(
        jax.random.PRNGKey(0), (nb, h * w * 3), 0, 256, dtype=jnp.int32
    ).astype(jnp.uint8)
    bank = jax.device_put(bg, NamedSharding(mesh, P(None, "space")))
    s_box = max(1, min(200, h // 2, w // 2))

    def body(prev, bank_l, t0):
        sidx = (jax.lax.axis_index("space") if sharded
                else jnp.int32(0))

        def one(carry, _):
            prev, t, acc = carry
            plane = jax.lax.dynamic_index_in_dim(
                bank_l, t % nb, keepdims=False)
            y = (t * 12) % (h - s_box)
            x = (t * 24) % (w - s_box)
            ys = (sidx * Lr
                  + jax.lax.broadcasted_iota(jnp.int32, (Lr, w * 3), 0))
            xb = jax.lax.broadcasted_iota(jnp.int32, (Lr, w * 3), 1) // 3
            box = ((ys >= y) & (ys < y + s_box)
                   & (xb >= x) & (xb < x + s_box)).reshape(-1)
            frame = jnp.where(box, jnp.uint8(255), plane)
            newp, counts_u, xs_t, vals_t, _aux = pipe._stream_body(
                prev, frame, ids, n_chars, None, sidx, emit_tiled=True)
            acc = (acc + jnp.sum(xs_t)
                   + jnp.sum(vals_t.astype(jnp.int32)))
            return (newp, t + 1, acc), ()

        (prev, t, acc), _ = jax.lax.scan(
            one, (prev, t0, jnp.int32(0)), None, length=K)
        return prev, acc

    if sharded:
        sm = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("space"), P(None, "space"), P()),
            out_specs=(P("space"), P()),
            check_vma=False,
        ), donate_argnums=(0,))
        st = jax.device_put(prev0, NamedSharding(mesh, P("space")))
    else:
        sm = jax.jit(body, donate_argnums=(0,))
        st = prev0
        bank = bg
    # warm twice (steady-state carry sharding — see bench_scan_chain)
    st, acc = sm(st, bank, jnp.int32(0))
    st, acc = sm(st, bank, jnp.int32(K))
    float(jax.device_get(acc))
    rtt = measure_rtt(st)
    t0 = _time.perf_counter()
    for it in range(ITERS):
        st, acc = sm(st, bank, jnp.int32((2 + it) * K))
    float(jax.device_get(acc))
    total = _time.perf_counter() - t0 - rtt
    return max(0.0, total / (K * ITERS) * 1e3)


def run(out_path: str | None = None, small: bool = False):
    """Spawn one subprocess per row (rule 1 above), collect, record."""
    import jax

    rows = []
    for row in ROWS:
        cmd = [sys.executable, os.path.abspath(__file__), "--row", row]
        if small:
            cmd.append("--small")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        ms = None
        for line in proc.stdout.splitlines():
            if line.startswith("ROW "):
                ms = float(line.split()[2])
        if ms is None:
            print(f"row {row} FAILED:\n{proc.stdout}\n{proc.stderr}",
                  file=sys.stderr)
            continue
        rows.append((row, ms))
        print(f"{row:>18}: {ms:7.3f} ms/step", file=sys.stderr)

    cfg, _ = _cfgs(small)
    lines = [
        f"mesh (1,1) serving step vs solo at {cfg.height}x{cfg.width}, "
        f"backend={jax.default_backend()}",
        f"K={K} ITERS={ITERS} (scan-chained, RTT-corrected; one row per",
        "process — same-process rows pollute each other up to 2x; see",
        "harness docstring for what each row does and does not charge)",
        "",
    ]
    name_map = {
        "solo": "solo",
        "inner-ctl": "inner body unsharded",
        "shd-inner": "mesh11 body (device)",
        "shd": "mesh11 scan-boundary shd",
        "rep": "mesh11 scan-boundary rep",
        "b1old": "mesh11 B=1 old",
    }
    lines += [f"{name_map[name]:>24}: {ms:7.3f} ms/step"
              for name, ms in rows]
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
    ap.add_argument("--row", default=None, choices=ROWS)
    a = ap.parse_args()
    if a.row:
        ms = run_row(a.row, small=a.small)
        print(f"ROW {a.row} {ms:.4f}")
    else:
        run(a.out, small=a.small)
