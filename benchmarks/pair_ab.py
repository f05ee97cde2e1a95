"""A/B of pair-packed vs plain lane compaction at sub_rows=1.

pack16 (two 15-bit units per lane via int16 ops) was a hardware
negative: Mosaic has no 16-bit lane rotate (benchmarks/pack16_ab). The
pair layout realizes the same traffic halving with 32-bit ops only:
rows r and r + R/2 share one int32 lane (lo/hi 16 bits), the 7
roll+select passes — the entire remaining compaction cost, ~0.15 ms of
the 0.19 ms kernel — run over an (R/2, 128) array, and the per-half
select masks are built arithmetically ((t << 16) - t). Correctness is
pinned in test_device_ops (pair == pack32 == oracle at ceiling /
density-fuzz / batched scenes); this harness decides the speed.

Run on TPU:  python benchmarks/pair_ab.py [--out benchmarks/pair_ab]
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
    prev = jnp.asarray(rng.integers(0, 255, n, endpoint=True, dtype=np.uint8))
    cur_np = np.where(
        rng.random(n) < 0.06,
        (np.asarray(prev).astype(np.int32) + 100) % 256,
        np.asarray(prev),
    ).astype(np.uint8)
    cur = jnp.asarray(cur_np)
    clus_np = np.asarray(prev).copy()
    band = slice(0, int(0.06 * n))
    clus_np[band] = ((clus_np[band].astype(np.int32) + 100) % 256).astype(np.uint8)
    clus = jnp.asarray(clus_np)

    def make_chain(pair):
        def chain(c):
            a, b, acc = c
            _, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
                a, b, emit="tiled", sub_rows=1, pair=pair
            )
            return b, new_prev, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

        return chain

    acc0 = jnp.int32(0)
    lines = [
        "# pair-packed vs plain lane compaction at sub_rows=1 (1080p, "
        f"scan-chained K={K} x I={ITERS})",
        "# mode scene      rep0_ms rep1_ms",
    ]
    print("\n".join(lines))
    for pair_on, tag in ((False, "plain"), (True, "pair ")):
        for scene_name, a in (("uniform", cur), ("clustered", clus)):
            try:
                reps = [
                    bench_scan_chain(make_chain(pair_on), (a, prev, acc0),
                                     k=K, iters=ITERS)
                    for _ in range(2)
                ]
            except Exception as e:
                line = f"{tag} {scene_name:10s} FAILED: {type(e).__name__}: {e}"
                print(line, flush=True)
                lines.append(line)
                continue
            line = f"{tag} {scene_name:10s} {reps[0]:7.4f} {reps[1]:7.4f}"
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
