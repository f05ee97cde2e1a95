"""Pallas per-tile histogram vs XLA compare-reduce, with the empirical
VPU roofline (VERDICT r4 weak #4 / next #6).

Three scan-chained rows at 1080p (2,073,600 gray pixels):

* ``xla_compare_reduce``  — ``filters.value_histogram`` (the product
  default; compare+add per bin, XLA-fused);
* ``pallas_tile_hist``    — ``hist_pallas.pallas_histogram``: the same
  compares with the tile pinned in VMEM, per-bin reduce + SMEM bin
  accumulation across the sequential grid (the reference's shared-mem
  privatized histogram, ``kernels.cu:152-174``, done TPU-style);
* ``vpu_probe``           — ``hist_pallas.vpu_probe``: op-count-
  IDENTICAL 256 x (compare+add) with a VREG accumulator and no per-bin
  reduction or scalar stores. No exact compare-based histogram can run
  faster; this is the measured VPU bound the roofline question needs.

Plus ``calibration`` (the flagship diff kernel) so ratios survive
contended windows (CLAUDE.md), and a byte-exactness cross-check of the
Pallas histogram before any timing.

Run on TPU:  python benchmarks/binarize_pallas_ab.py [--out benchmarks/binarize_pallas_ab]
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
    from cudavideostream_tpu.ops import filters, logcompact
    from cudavideostream_tpu.ops.hist_pallas import (
        pallas_histogram,
        vpu_probe,
    )
    from cudavideostream_tpu.utils.timing import bench_scan_chain

    cfg = StreamConfig()
    n = cfg.frame_bytes
    rng = np.random.default_rng(0)
    frame = jnp.asarray(
        rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    )
    gray = filters.grayscale_weighted(frame)
    g2 = filters._per_pixel(gray, (1, 0, 0)).astype(jnp.int32)  # (M,128)

    want = np.asarray(filters.value_histogram(g2))
    got = np.asarray(pallas_histogram(g2))
    np.testing.assert_array_equal(got, want)
    probe = np.asarray(vpu_probe(g2))
    assert int(probe.sum()) == int(np.prod(g2.shape)), "probe elided"
    print("pallas hist byte-exact + probe checksum OK", file=sys.stderr)

    rows = []

    def add(name, ms):
        rows.append((name, ms))
        print(f"{name:22s} {ms:8.4f} ms", file=sys.stderr)

    def hist_chain(fn):
        def chain(c):
            g, acc = c
            h = fn(g)
            return (g + 1) % 256, acc + h[0].astype(jnp.int32)

        return chain

    import functools

    for name, fn in [
        ("xla_compare_reduce", filters._value_histogram_xla),
        ("pallas_tile_hist", pallas_histogram),
        ("pallas_hist_unroll",
         functools.partial(pallas_histogram, unroll=True)),
        ("vpu_probe", vpu_probe),
        ("vpu_probe_unroll", functools.partial(vpu_probe, unroll=True)),
    ]:
        ms = bench_scan_chain(
            hist_chain(fn), (g2, jnp.int32(0)), k=K, iters=ITERS)
        add(name, ms)

    # the FULL fused binarize chain (gray -> hist -> threshold -> 255/0,
    # models/pipeline's aux path) under each histogram: the standalone
    # rows above feed a pre-materialized gray grid, but in the chain the
    # XLA form FUSES the compare-reduce into the gray extract while the
    # Pallas form must materialize gv to HBM first — the end-to-end
    # number is what the binarize variant actually pays
    def full_chain(hist_fn):
        def chain(c):
            f, acc = c
            gv = filters.gray_pixels(f)
            t = filters.binarize_threshold(hist_fn(gv))
            out = filters.binarize_pixels(gv, t)
            return (f + jnp.uint8(1), acc + out[0].astype(jnp.int32))

        return chain

    for name, fn in [
        ("chain_xla", filters._value_histogram_xla),
        ("chain_pallas_unroll",
         functools.partial(pallas_histogram, unroll=True)),
    ]:
        ms = bench_scan_chain(
            full_chain(fn), (frame, jnp.int32(0)), k=K, iters=ITERS)
        add(name, ms)

    # in-window calibration: the flagship diff kernel's known 0.16-0.19
    # ms band (benchmarks/times_tpu_v5e) anchors contended-window ratios
    prev = jnp.asarray(
        rng.integers(0, 255, n, endpoint=True, dtype=np.uint8))

    def diff_chain(c):
        cur, pv = c
        out = logcompact.fused_diff_compact(
            cur, pv, emit="tiled", sub_rows=1, pair=True)
        return (pv, out[-1])

    add("calibration_diff", bench_scan_chain(
        diff_chain, (frame, prev), k=K, iters=ITERS))

    if out_path:
        with open(out_path, "w") as f:
            f.write(
                "# pallas per-tile histogram vs XLA compare-reduce + "
                "empirical VPU roofline (1080p, scan-chained "
                f"K={K} x I={ITERS}); reference kernels.cu:152-174\n"
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
