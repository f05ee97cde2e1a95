"""A/B of sub-tiled compaction granularity (the round-3 pass-headroom
attack, VERDICT r2 item 3).

The element kernel's shift passes cost ~0.30 ms of the 0.40 ms tiled
kernel (stage_breakdown_tpu_v5e) — ~16 passes = log2(tile_bytes).
Sub-tiling the COMPACTION unit inside each DMA block (sub_rows rows per
unit) shrinks the pass loop to log2(sub_rows*128) without touching the
DMA/grid geometry: 10 passes at sub_rows=8, 9 at sub_rows=4. Wire bytes
are identical (the scatter-gather sender concatenates sub-tile prefixes
exactly like tile prefixes). The trades measured here:

* more SMEM count writes per grid step (scalar vector-extracts) — this
  trade is GONE since counts moved to a per-tile (R, 1) VMEM column
  (one vector store regardless of granularity; the caller slices each
  unit's last row), which is what re-opened sub=2/1;
* at sub_rows == 1 the kernel drops the row phase entirely: the
  lane-cumsum matmul is the whole prefix sum and every shift pass is a
  single circular lane roll (the generic flat roll pays 2 extra rolls
  + a select for row crossings that cannot happen);
* more host-side segments (nonzero scan + iovec entries — not timed
  here; host cost is linear in non-empty units and tiny), and more
  counts BYTES to land per frame (tile_rows/sub_rows x; at sub=1 that
  is one int32 per 128-byte row — negligible on PCIe, material on
  this bench env's ~16 MB/s tunnel, so serving defaults stay coarser);
* a slower device-side merge_tiles for the flat landing (also timed).

The candidates the ROADMAP named are analytically dead and are NOT run:

* two-level (8-row groups then group merge): group-level remaining
  shifts are NOT multiples of the group size, so the merge re-pays the
  low bits — total bit-passes >= the single-level loop (isomorphic-or-
  worse). Sub-tiling is the non-isomorphic version of the same idea:
  it deletes the group merge by making units first-class wire tiles.
* per-row MXU permutation matmuls: building the (R,128,128) one-hot
  costs 128 elementwise passes over the block — two orders beyond the
  7 lane passes it would replace.
* int16 half-width rolls: holes+delta need 17+ bits in the high phase
  (9-bit hole range after the lane phase + 8-bit delta), and two int16
  streams equal one int32 stream on 32-bit VPU lanes — no width win
  exists.

Run on TPU:  python benchmarks/subtile_ab.py [--out benchmarks/subtile_ab]
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

    def make_chain(sub):
        def chain(c):
            a, b, acc = c
            _, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
                a, b, emit="tiled", sub_rows=sub
            )
            return b, new_prev, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

        return chain

    def make_chain_flat(sub):
        def chain(c):
            a, b, acc = c
            _, xs, vals, new_prev = logcompact.fused_diff_compact(
                a, b, sub_rows=sub
            )
            return b, new_prev, acc + jnp.sum(xs[:1]) + vals[0].astype(jnp.int32)

        return chain

    acc0 = jnp.int32(0)
    lines = [
        "# Sub-tiled compaction A/B (1080p, scan-chained K=%d x I=%d,"
        % (K, ITERS),
        "# emit=tiled unless noted; sub=0 is the round-2 whole-tile kernel).",
        "# passes = log2(sub*128) (sub=0 -> log2(tile*128) ~ 16)",
        "# sub scene      rep0_ms rep1_ms",
    ]
    print("\n".join(lines))
    results = {}
    for sub in (0, 16, 8, 4, 2, 1):
        for scene_name, a in (("uniform", cur), ("clustered", clus)):
            try:
                reps = [
                    bench_scan_chain(make_chain(sub), (a, prev, acc0),
                                     k=K, iters=ITERS)
                    for _ in range(2)
                ]
            except Exception as e:
                line = f"{sub:3d} {scene_name:10s} FAILED: {type(e).__name__}: {e}"
                print(line, flush=True)
                lines.append(line)
                break
            line = f"{sub:3d} {scene_name:10s} {reps[0]:7.4f} {reps[1]:7.4f}"
            print(line, flush=True)
            lines.append(line)
            results[(sub, scene_name)] = min(reps)
    # the flat-emit path (device merge) degrades with unit count — record it
    lines.append("# flat emit (device merge epilogue; lander avoids when slow)")
    for sub in (0, 8):
        reps = [
            bench_scan_chain(make_chain_flat(sub), (cur, prev, acc0),
                             k=K, iters=ITERS)
            for _ in range(2)
        ]
        line = f"{sub:3d} flat-unif  {reps[0]:7.4f} {reps[1]:7.4f}"
        print(line, flush=True)
        lines.append(line)

    if out_path:
        with open(out_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {out_path}")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
