"""Per-kernel benchmark table — the rebuild of the reference's nvprof
tables (report.tex §per-kernel; raw data ``tests/*/times*``).

Run on TPU:  ``python benchmarks/kernels.py [--out benchmarks/times_tpu]``

Writes one ``name<TAB>ms`` row per kernel, comparable against the
reference's Jetson numbers recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import sys

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(out_path: str | None = None):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.ops import (
        convolve,
        diff,
        filters,
        logcompact,
        overlay,
        reference_cpu,
    )
    from cudavideostream_tpu.utils import fonts, timing

    cfg = StreamConfig()
    rng = np.random.default_rng(0)
    n = cfg.frame_bytes
    prev = jnp.asarray(rng.integers(0, 255, n, endpoint=True, dtype=np.uint8))
    # ~6% changed, matching the reference's measured rate (report.tex:2594)
    cur_np = np.where(
        rng.random(n) < 0.06,
        (np.asarray(prev).astype(np.int32) + 100) % 256,
        np.asarray(prev),
    ).astype(np.uint8)
    cur = jnp.asarray(cur_np)

    # (name, reference Jetson ms from BASELINE.md, fn, args)
    entries = [
        ("diff+compact_pallas", 3.42, lambda c, p: logcompact.fused_diff_compact(c, p), (cur, prev)),
        ("diff_mask_only", 3.42, lambda c, p: diff.diff_mask(c, p, 20), (cur, prev)),
        ("grayscale_avg", None, filters.grayscale_average, (cur,)),
        ("grayscale_weighted", None, filters.grayscale_weighted, (cur,)),
        ("histogram", None, filters.gray_histogram, (cur,)),
        ("binarize_pipeline", None, filters.binarize_pipeline, (cur,)),
        ("heatmap", 20.99, filters.heatmap, (cur, prev)),
        ("red_overlap", 0.915, lambda p, c: filters.red_overlap(p, diff.diff_mask(c, p, 20)[0]), (prev, cur)),
    ]
    for k, ref_ms in ((3, 5.1), (5, 9.8), (7, 17.7), (9, 27.7)):
        wq = reference_cpu.quantize_kernel_q16(reference_cpu.gaussian_kernel(k))
        entries.append(
            (f"gaussian_conv_k{k}", ref_ms,
             lambda f, wq=wq: convolve.convolve_q16(f, wq, cfg.height, cfg.width),
             (cur,))
        )
    entries.append(
        ("median_k5", 574.67,
         lambda f: convolve.median_filter(f, 5, cfg.height, cfg.width), (cur,))
    )
    atlas = jnp.asarray(fonts.make_atlas(cfg.overlay_scale))
    ids = jnp.asarray(fonts.encode_text("FPS: 30 BW: 5 kbps", 28), jnp.int32)
    entries.append(
        ("text_overlay_18ch", 18 * 0.001868,  # per-char 1.868 us x 18
         lambda f: overlay.overlay_blit(f, atlas, ids, jnp.int32(18), cfg.height, cfg.width),
         (cur,))
    )

    rows = []
    for name, ref_ms, fn, args in entries:
        f = jax.jit(fn)
        timing._sync(f(*args))
        ms = timing.bench_op_amortized(f, *args, iters=10)
        speedup = f"{ref_ms/ms:7.1f}x" if ref_ms else "      -"
        rows.append((name, ms, ref_ms))
        print(f"{name:24s} {ms:8.3f} ms   jetson {ref_ms or float('nan'):8.3f} ms  {speedup}",
              flush=True)

    if out_path:
        with open(out_path, "w") as f:
            for name, ms, ref_ms in rows:
                f.write(f"{name}\t{ms:.4f}\t{'' if ref_ms is None else ref_ms}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
