"""Same-window kernel A/B: tiled (indexed) emission vs bitmask-only.

The r4 HBM model (``benchmarks/trace_flagship_tpu_v5e``) counts the
int32 xs blocks at 24.9 MB/frame — half of all kernel HBM writes at
1080p — and mask-flavor serving never reads them. ``emit="mask"``
deletes them and packs the change-bits in-kernel (two exact MXU
matmuls) instead of a separate 2n XLA pass. This measures both
emissions in ONE process/window so the ratio survives contention, at
the product geometry (sub_rows=1, pair lanes), plus the mask emission's
device-side vals-only merge vs the full pair merge.

Run on TPU:  python benchmarks/maskonly_ab.py [--out benchmarks/maskonly_ab]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = 24
ITERS = 6


def run(out_path=None):
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.ops import logcompact
    from cudavideostream_tpu.utils.timing import bench_scan_chain

    cfg = StreamConfig()
    n = cfg.frame_bytes
    rng = np.random.default_rng(0)
    prev_h = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    # ~1% clustered band (the serving record's density regime)
    cur_h = prev_h.copy()
    band = int(0.01 * n)
    cur_h[n // 3: n // 3 + band] += np.uint8(77)
    prev = jnp.asarray(prev_h)
    cur = jnp.asarray(cur_h)

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{name:22s} {ms:8.4f} ms", file=sys.stderr)

    def chain_tiled(c):
        f, pv = c
        out = logcompact.fused_diff_compact(
            f, pv, emit="tiled", sub_rows=1, pair=True)
        return (pv, out[-1])

    def chain_tiled_bits(c):
        # the r4 serving path: indexed emission + the separate XLA
        # bitmask pack over (new_prev, prev)
        from cudavideostream_tpu.ops import diff as diff_ops

        f, pv = c
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            f, pv, emit="tiled", sub_rows=1, pair=True)
        bits = diff_ops.pack_bitmask(new_prev != pv)
        return (pv, new_prev + bits[0])

    def chain_mask(c):
        f, pv = c
        out = logcompact.fused_diff_compact(
            f, pv, emit="mask", sub_rows=1, pair=True)
        return (pv, out[-1])

    def chain_mask_merge(c):
        f, pv = c
        pos, counts, vals_t, bits, new_prev = logcompact.fused_diff_compact(
            f, pv, emit="mask", sub_rows=1, pair=True)
        merged = logcompact.merge_vals(counts, vals_t)
        return (pv, new_prev + merged[0])

    def chain_tiled_merge(c):
        f, pv = c
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            f, pv, emit="tiled", sub_rows=1, pair=True)
        _, mv = logcompact.merge_tiles(counts, xs_t, vals_t)
        return (pv, new_prev + mv[0])

    for name, chain in [
        ("tiled_indexed", chain_tiled),
        ("tiled_plus_xla_bits", chain_tiled_bits),
        ("maskonly", chain_mask),
        ("maskonly_plus_merge", chain_mask_merge),
        ("tiled_plus_pair_merge", chain_tiled_merge),
    ]:
        add(name, bench_scan_chain(chain, (cur, prev), k=K, iters=ITERS))

    if out_path:
        with open(out_path, "w") as f:
            f.write(
                "# indexed vs bitmask-only kernel emission (1080p, ~1% "
                f"clustered, scan-chained K={K} x I={ITERS}); HBM model "
                "benchmarks/trace_flagship_tpu_v5e; reference "
                "kernels.cu:289-334\n"
                "# variant                ms\n")
            for name, ms in rows:
                f.write(f"{name:22s} {ms:8.4f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    run(args.out)
