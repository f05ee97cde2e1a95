"""Large-frame scaling: 1080p → 4K → 8K single-chip diff+compact.

The reference is hardcoded to 1920×1080 (``kernels.cu:107-133``) and its
packed launch geometry cannot express larger frames; this kernel's
tile-local index packing bounds nothing but the int32 byte index
(< 2 GiB), so 4K and 8K ride the identical code path. Each size is
byte-exact-gated against the NumPy oracle on the chip before timing,
and a same-run 1080p row calibrates the shared/tunneled chip so ratios
stay trustworthy under contention.

Run on TPU:  ``python benchmarks/big_frames.py [--out benchmarks/times_big_frames]``
"""

from __future__ import annotations

import argparse
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

SIZES = [
    ("1080p", 1080, 1920, 0.06),   # calibration row (6%, matches times_tpu_v5e)
    ("4k", 2160, 3840, 0.02),
    ("8k", 4320, 7680, 0.02),
]


def _scene(h, w, frac, seed=0):
    n = h * w * 3
    rng = np.random.default_rng(seed)
    prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur = np.where(
        rng.random(n) < frac, (prev.astype(np.int32) + 100) % 256, prev
    ).astype(np.uint8)
    return cur, prev


from cudavideostream_tpu.utils.timing import bench_scan_chain as _bench_scan


def run(out_path: str | None = None, k: int = 12, iters: int = 3):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.ops import logcompact
    from cudavideostream_tpu.ops import reference_cpu as ref

    rows = []
    for name, h, w, frac in SIZES:
        cur_np, prev_np = _scene(h, w, frac)
        cur, prev = jnp.asarray(cur_np), jnp.asarray(prev_np)

        # byte-exact gate on this backend before timing
        interp = jax.default_backend() == "cpu"  # smoke runs off-TPU
        pos, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            cur, prev, emit="tiled", interpret=interp
        )
        rpos, rxs, rvals, rnewp = ref.diff_encode(cur_np, prev_np)
        xs_d, vals_d = logcompact.merge_tiles(counts, xs_t, vals_t)
        pos = int(pos)
        assert pos == rpos, (name, pos, rpos)
        np.testing.assert_array_equal(np.asarray(xs_d)[:pos], rxs)
        np.testing.assert_array_equal(np.asarray(vals_d)[:pos], rvals)
        np.testing.assert_array_equal(np.asarray(new_prev), rnewp)

        def chain(c):
            a, b, acc = c
            _, _, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
                a, b, emit="tiled", interpret=interp
            )
            return b, new_prev, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

        ms = _bench_scan(chain, (cur, prev, jnp.int32(0)), k, iters)
        nbytes = h * w * 3
        rows.append((name, h, w, nbytes, pos, ms))
        print(f"{name:6s} {h}x{w} ({nbytes:>11,d} B)  pos={pos:>9,d}  "
              f"{ms:8.3f} ms/frame  [byte-exact OK]", flush=True)

    base = rows[0][5]
    base_bytes = rows[0][3]
    if out_path:
        with open(out_path, "w") as f:
            f.write(
                "# Large-frame scaling, tiled emit, scan-chained "
                f"K={k}x{iters}, byte-exact-gated vs oracle per size.\n"
                "# The 1080p row calibrates the shared tunnel chip; the\n"
                "# 'vs 1080p' column is the trustworthy signal (bytes\n"
                "# ratio 4k=4.0x, 8k=16.0x). The reference is hardcoded\n"
                "# to 1080p (kernels.cu:107-133).\n"
                "# size\tgeometry\tbytes\tpos\tms\tvs_1080p\tbytes_ratio\n"
            )
            for name, h, w, nbytes, pos, ms in rows:
                f.write(f"{name}\t{h}x{w}\t{nbytes}\t{pos}\t{ms:.3f}\t"
                        f"{ms/base:.2f}x\t{nbytes/base_bytes:.1f}x\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--k", type=int, default=12)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()
    run(args.out, args.k, args.iters)
