"""Tile-size sweep for the fused diff+compact kernel.

The TPU analogue of the reference's thread-count sweeps
(``tests/heat_map_benchmark/kernel_test.sh``: nvprof over 4..1024
threads, data committed as ``times``/``times2``). Here the tunable is
``tile_rows`` — rows of 128 bytes per Pallas grid step — which trades
grid overhead against VMEM pressure and shift-pass count (the bit-serial
pass count is ~log2(tile_rows*128)). Since round 2 the kernel pads
internally, so ANY multiple-of-8 tile size is sweepable: the sweep pins
``_pick_tile_rows``/``_pad_rows`` to force each candidate.

Run on TPU:  ``python benchmarks/sweep.py [--out benchmarks/times_tiles]``
"""

from __future__ import annotations

import argparse

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

# dense ladder from small vreg tiles to ~4 MB VMEM blocks; 21 points vs
# the reference's 217-row thread sweep. Lower bound: the per-tile counts
# output lives in SMEM as a (grid, 1) window padded to 512 B/row, so
# grid must stay under ~2000 (tile_rows >= 32 at 1080p).
CANDIDATES = [
    32, 40, 56, 72, 104, 120, 152, 200, 216, 248, 304, 360,
    392, 448, 512, 608, 760, 1080, 1520, 1800, 2432,
]


from cudavideostream_tpu.utils.timing import bench_scan_chain as _bench_scan


def run(out_path: str | None = None, candidates=None, emit: str = "tiled"):
    import jax.numpy as jnp

    from cudavideostream_tpu.ops import logcompact

    n = 6220800
    rows = n // 128
    rng = np.random.default_rng(0)
    prev_np = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur_np = np.where(
        rng.random(n) < 0.06, (prev_np.astype(np.int32) + 100) % 256, prev_np
    ).astype(np.uint8)
    cur, prev = jnp.asarray(cur_np), jnp.asarray(prev_np)

    if candidates is None:
        candidates = CANDIDATES

    def chain(c):
        a, b, acc = c
        out = logcompact.fused_diff_compact(a, b, emit=emit)
        if emit == "tiled":
            _, counts, xs_t, vals_t, new_prev = out
            return b, new_prev, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)
        _, xs, vals, new_prev = out
        return b, new_prev, acc + xs[0] + vals[0].astype(jnp.int32)

    orig_pick, orig_pad = logcompact._pick_tile_rows, logcompact._pad_rows
    results = []
    try:
        for tr in candidates:
            logcompact._pick_tile_rows = lambda r, target=400, _tr=tr: _tr
            logcompact._pad_rows = lambda r, _tr=tr: -(-r // _tr) * _tr
            logcompact.fused_diff_compact.clear_cache()
            ms = _bench_scan(chain, (cur, prev, jnp.int32(0)))
            grid = -(-rows // tr)
            print(f"tile_rows={tr:5d} grid={grid:5d}  {ms:8.3f} ms", flush=True)
            results.append((tr, grid, ms))
    finally:
        logcompact._pick_tile_rows = orig_pick
        logcompact._pad_rows = orig_pad
        logcompact.fused_diff_compact.clear_cache()

    if out_path:
        with open(out_path, "w") as f:
            f.write(f"# tile_rows\tgrid\tms ({emit} emit, 1080p, 6% changed, "
                    f"scan-chained)\n")
            for tr, grid, ms in results:
                f.write(f"{tr}\t{grid}\t{ms:.4f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--emit", default="tiled", choices=["flat", "tiled"])
    args = p.parse_args()
    run(args.out, emit=args.emit)
