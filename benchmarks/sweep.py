"""Tile-size sweep for the fused diff+compact kernel.

The TPU analogue of the reference's thread-count sweeps
(``tests/heat_map_benchmark/kernel_test.sh``: nvprof over 4..1024
threads, data committed as ``times``/``times2``). Here the tunable is
``tile_rows`` — rows of 128 bytes per Pallas grid step — which trades
grid overhead against VMEM pressure and epilogue (merge) length.

Run on TPU:  ``python benchmarks/sweep.py [--out benchmarks/times_tiles]``
"""

from __future__ import annotations

import argparse
import sys

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(out_path: str | None = None, candidates=None):
    import jax.numpy as jnp

    from cudavideostream_tpu.ops import logcompact
    from cudavideostream_tpu.utils import timing

    n = 6220800
    rows = n // 128
    rng = np.random.default_rng(0)
    prev_np = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur_np = np.where(
        rng.random(n) < 0.06, (prev_np.astype(np.int32) + 100) % 256, prev_np
    ).astype(np.uint8)
    cur, prev = jnp.asarray(cur_np), jnp.asarray(prev_np)

    if candidates is None:
        candidates = [d for d in (216, 360, 600, 1080, 1800)
                      if rows % d == 0]

    orig = logcompact._pick_tile_rows
    results = []
    try:
        for tr in candidates:
            logcompact._pick_tile_rows = lambda r, target=608, _tr=tr: _tr
            logcompact.fused_diff_compact.clear_cache()
            ms = timing.bench_op_amortized(
                lambda a, b: logcompact.fused_diff_compact(a, b), cur, prev,
                warmup=2, iters=10,
            )
            grid = rows // tr
            print(f"tile_rows={tr:4d} grid={grid:5d}  {ms:8.3f} ms", flush=True)
            results.append((tr, grid, ms))
    finally:
        logcompact._pick_tile_rows = orig
        logcompact.fused_diff_compact.clear_cache()

    if out_path:
        with open(out_path, "w") as f:
            for tr, grid, ms in results:
                f.write(f"{tr}\t{grid}\t{ms:.4f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
