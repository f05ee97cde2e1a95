"""Per-stage time attribution for the fused 1080p step.

The reference's report carries nvprof per-kernel tables with GPU-time
percentages (report.tex:1149, 1480-1492). ``jax.profiler`` traces are
unreliable over the tunneled backend, so the attribution here is a
*stage ladder*: each rung scan-chains a strictly larger prefix of the
fused step (same methodology as benchmarks/kernels.py), and consecutive
differences attribute time to the stage added. Rungs:

  frame_xor       — one full-frame elementwise pass (the HBM floor)
  overlay         — glyph strip blit alone
  diff_mask       — elementwise diff + negfeed state update
  kernel_tiled    — full Pallas diff+compact, per-tile blocks out
  kernel_flat     — + the XLA merge epilogue
  step_tiled      — overlay + kernel (the product server path)
  step_flat       — overlay + kernel + merge (the library path)

Run on TPU:  ``python benchmarks/stage_breakdown.py [--out benchmarks/stage_breakdown_tpu_v5e]``
"""

from __future__ import annotations

import argparse
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = 24
ITERS = 4


from cudavideostream_tpu.utils.timing import bench_scan_chain as _bench_scan


def run(out_path: str | None = None):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.ops import diff, logcompact, overlay
    from cudavideostream_tpu.utils import fonts

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = StreamConfig() if on_tpu else StreamConfig(height=48, width=64)
    pipe = DeltaStreamPipeline(cfg)
    interp = not on_tpu
    h, w, n = cfg.height, cfg.width, cfg.frame_bytes
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 255, n, endpoint=True, dtype=np.uint8))
    cur_np = np.where(
        rng.random(n) < 0.06,
        (np.asarray(prev).astype(np.int32) + 100) % 256,
        np.asarray(prev),
    ).astype(np.uint8)
    cur = jnp.asarray(cur_np)
    atlas = jnp.asarray(fonts.make_atlas(cfg.overlay_scale))
    ids = jnp.asarray(fonts.encode_text("FPS: 240 BW: 14000 kbps", 28), jnp.int32)
    nch = jnp.int32(23)

    # digests accumulate into a scalar carry slot; xoring into the state
    # would make every later iteration a ~100%-changed frame
    def chain_xor(c):
        a, b, acc = c
        return b, a ^ b, acc

    def chain_overlay(c):
        a, b, acc = c
        return b, overlay.overlay_blit(a, atlas, ids, nch, h, w), acc

    def chain_mask(c):
        a, b, acc = c
        m, v, np_ = diff.diff_mask(a, b, 20)
        return b, np_, acc

    def chain_kernel_tiled(c):
        a, b, acc = c
        _, counts, xs_t, vals_t, np_ = logcompact.fused_diff_compact(
            a, b, interpret=interp, emit="tiled"
        )
        return b, np_, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

    def make_chain_subtiled(sub):
        # sub=1 is the product configuration (config.subtile_rows
        # default); sub=8 is the tunnel-link serving recommendation
        def chain(c):
            a, b, acc = c
            _, counts, xs_t, vals_t, np_ = logcompact.fused_diff_compact(
                a, b, interpret=interp, emit="tiled", sub_rows=sub
            )
            return b, np_, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

        return chain

    def chain_kernel_flat(c):
        a, b, acc = c
        _, xs, vals, np_ = logcompact.fused_diff_compact(a, b, interpret=interp)
        return b, np_, acc + xs[0] + vals[0].astype(jnp.int32)

    def make_step(tiled):
        import dataclasses

        p = DeltaStreamPipeline(
            dataclasses.replace(cfg, tiled_payload=tiled)
        )

        def chain(c):
            a, b, acc = c
            out = p._step_impl(b, a, ids, nch)
            np_ = out[0]
            tail = out[4] if tiled else out[3]
            return b, np_, acc + tail.reshape(-1)[0].astype(jnp.int32)

        return chain

    rungs = [
        ("frame_xor", chain_xor),
        ("overlay", chain_overlay),
        ("diff_mask", chain_mask),
        ("kernel_tiled", chain_kernel_tiled),
        ("kernel_subtiled8", make_chain_subtiled(8)),
        ("kernel_subtiled1", make_chain_subtiled(1)),
        ("kernel_flat", chain_kernel_flat),
        ("step_tiled", make_step(True)),
        ("step_flat", make_step(False)),
    ]
    rows = []
    for name, fn in rungs:
        def measure(k, iters):
            return _bench_scan(fn, (cur, prev, jnp.int32(0)), k=k, iters=iters)

        ms = measure(K, ITERS)
        if ms < 0.1:
            # sub-0.1 ms rungs: the timed region is a few ms against the
            # ~30 ms subtracted RTT — re-chain until device time dominates
            ms = measure(320, 2)
        else:
            # the shared chip's transient contention hits single rows at
            # random; min-of-2 keeps the attribution arithmetic coherent
            # (a contended diff_mask otherwise reads above kernel_tiled)
            ms = min(ms, measure(K, ITERS))
        rows.append((name, ms))
        print(f"{name:14s} {ms:8.3f} ms", flush=True)

    d = dict(rows)
    attributions = [
        ("merge_epilogue = kernel_flat - kernel_tiled",
         d["kernel_flat"] - d["kernel_tiled"]),
        ("compaction_passes = kernel_subtiled1 - diff_mask",
         d["kernel_subtiled1"] - d["diff_mask"]),
        ("subtile_gain = kernel_tiled - kernel_subtiled1",
         d["kernel_tiled"] - d["kernel_subtiled1"]),
        ("overlay_marginal = step_tiled - kernel_subtiled1",
         d["step_tiled"] - d["kernel_subtiled1"]),
        ("elementwise_floor = frame_xor", d["frame_xor"]),
    ]
    print()
    for label, ms in attributions:
        print(f"{label:50s} {ms:8.3f} ms")

    if out_path:
        with open(out_path, "w") as f:
            f.write(f"# stage\tms ({cfg.height}x{cfg.width}, scan-chained "
                    f"K={K}x{ITERS}, 6% changed)\n")
            for name, ms in rows:
                f.write(f"{name}\t{ms:.4f}\n")
            f.write("# attributions\n")
            for label, ms in attributions:
                f.write(f"# {label}\t{ms:.4f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
