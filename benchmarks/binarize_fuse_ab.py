"""A/B of the fused vs unfused binarize chain (VERDICT r3 weak #5).

The unfused chain mirrors the reference's kernel sequence
(``kernels.cu:491-499``): write the 3-channel gray frame, re-read it for
the histogram, re-read it again for the thresholded output — two extra
full-frame HBM passes plus an extract matmul. The fused chain
(``ops/filters.binarize_pipeline``) computes the per-pixel (M, 128) gray
once and feeds both consumers. What fusion CANNOT remove is the 256-bin
compare-reduce histogram itself (~0.51 ms at 1080p), which is
compute-bound on any unit (the closed MXU-histogram analysis,
``gray_histogram`` docstring) — so the expected ceiling for the full
chain is histogram + ~2 elementwise passes.

Also times each stage standalone so the table decomposes.

Run on TPU:  python benchmarks/binarize_fuse_ab.py [--out benchmarks/binarize_fuse_ab]
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
    from cudavideostream_tpu.ops import filters
    from cudavideostream_tpu.utils.timing import bench_scan_chain

    cfg = StreamConfig()
    n = cfg.frame_bytes
    rng = np.random.default_rng(0)
    frame = jnp.asarray(
        rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    )

    # one-step byte-exactness cross-check before timing
    a = np.asarray(filters.binarize_pipeline(frame, fused=True))
    b = np.asarray(filters.binarize_pipeline(frame, fused=False))
    np.testing.assert_array_equal(a, b)
    print("fused == unfused: byte-exact OK", file=sys.stderr)

    def chain_of(fn):
        def chain(c):
            f, acc = c
            out = fn(f)
            # rotate the input by xor so each step sees a new frame and
            # the digest forces materialization
            return f ^ jnp.uint8(1), acc + out[0].astype(jnp.int32)

        return chain

    def hist_only(f):
        return filters.value_histogram(filters.gray_pixels(f)).astype(jnp.uint8)

    def gray_only(f):
        return filters.grayscale_weighted(f)

    entries = [
        ("binarize_fused", lambda f: filters.binarize_pipeline(f, fused=True)),
        ("binarize_unfused", lambda f: filters.binarize_pipeline(f, fused=False)),
        ("histogram_of_gray_px", hist_only),
        ("grayscale_weighted", gray_only),
    ]
    acc0 = jnp.int32(0)
    lines = [
        f"# fused vs unfused binarize chain (1080p, scan-chained K={K} x "
        f"I={ITERS}); reference sequence kernels.cu:491-499",
        "# variant              rep0_ms rep1_ms",
    ]
    print("\n".join(lines))
    for name, fn in entries:
        reps = [
            bench_scan_chain(chain_of(fn), (frame, acc0), k=K, iters=ITERS)
            for _ in range(2)
        ]
        line = f"{name:22s} {reps[0]:7.4f} {reps[1]:7.4f}"
        print(line, flush=True)
        lines.append(line)

    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
