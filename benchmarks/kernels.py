"""Per-kernel benchmark table — the rebuild of the reference's nvprof
tables (report.tex; raw data ``tests/*/times*``).

Methodology: each kernel is chained K times inside one ``lax.scan`` with
its output threaded back into its input (so the compiler cannot hoist
loop-invariant work), timed over several scan invocations with a real
device-get sync. This measures pure device time, robust to host/tunnel
jitter — the moral equivalent of nvprof's kernel-average column.

Run on TPU:  ``python benchmarks/kernels.py [--out benchmarks/times_tpu_v5e]``
"""

from __future__ import annotations

import argparse
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K = 24      # chain length inside the scan
ITERS = 4   # scan invocations per measurement


from cudavideostream_tpu.utils.timing import bench_scan_chain as _bench_scan


def run(out_path: str | None = None):
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
    from cudavideostream_tpu.utils import fonts

    cfg = StreamConfig()
    h, w = cfg.height, cfg.width
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
    # clustered variant: the same ~6% changed bytes, but concentrated in
    # one band (a moving object), leaving ~94% of tiles static —
    # exercises the kernel's static-region fast path
    clus_np = np.asarray(prev).copy()
    band = slice(0, int(0.06 * n))
    clus_np[band] = ((clus_np[band].astype(np.int32) + 100) % 256).astype(np.uint8)
    clus = jnp.asarray(clus_np)
    sine_ok = filters.heatmap_sine_is_exact()

    # Payload digests accumulate into a scalar carry slot rather than
    # xoring into the state: perturbing new_prev would make every later
    # chain iteration a ~100%-changed frame, hiding density-dependent
    # behavior (e.g. the static-tile fast path).
    def chain_diff_compact(c):
        a, b, acc = c
        _, xs, vals, new_prev = logcompact.fused_diff_compact(a, b)
        return b, new_prev, acc + jnp.sum(xs[:1]) + vals[0].astype(jnp.int32)

    def chain_diff_compact_tiled(c):
        a, b, acc = c
        _, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
            a, b, emit="tiled"
        )
        return b, new_prev, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

    def make_chain_subtiled(sub):
        # sub=1 is the product configuration (config.subtile_rows
        # default); sub=8 the tunnel-link serving recommendation
        def chain(c):
            a, b, acc = c
            _, counts, xs_t, vals_t, new_prev = logcompact.fused_diff_compact(
                a, b, emit="tiled", sub_rows=sub
            )
            return b, new_prev, acc + xs_t[0, 0] + vals_t[0, 0].astype(jnp.int32)

        return chain

    def make_chain_scheme(scheme):
        def chain(c):
            a, b, acc = c
            _, xs, vals, new_prev = logcompact.fused_diff_compact(
                a, b, scheme=scheme
            )
            return b, new_prev, acc + xs[0] + vals[0].astype(jnp.int32)

        return chain

    def chain_diff_mask(c):
        a, b = c
        m, v, np_ = diff.diff_mask(a, b, 20)
        return b, np_

    def chain_host_offload(c):
        # the HOST backend's whole device step: mask + n/8 bitmask +
        # negfeed update — no compaction on device at all (the host
        # packs from its own frame + prev shadow, cvstpu.c:compact_update)
        a, b, acc = c
        m, v, np_ = diff.diff_mask(a, b, 20)
        bm = diff.pack_bitmask(m)
        return b, np_, acc + bm[0].astype(jnp.int32)

    def chain_heatmap(c):
        a, b = c
        return b, filters.heatmap(a, b, use_sine=sine_ok)

    def chain_red(c):
        a, b = c
        m, _, _ = diff.diff_mask(a, b, 20)
        return b, filters.red_overlap(a, m)

    def chain_hist(frame):
        hist = filters.gray_histogram(frame)
        return frame ^ jnp.bitwise_and(hist[0], 1).astype(jnp.uint8)

    def chain_hist_mxu(frame):
        # nibble-factorized MXU candidate (analytic negative: lane
        # padding of the (N,16) indicators — see gray_histogram)
        hist = filters.gray_histogram(frame, mxu=True)
        return frame ^ jnp.bitwise_and(hist[0], 1).astype(jnp.uint8)

    atlas = jnp.asarray(fonts.make_atlas(cfg.overlay_scale))
    ids = jnp.asarray(fonts.encode_text("FPS: 30 BW: 5 kbps", 28), jnp.int32)

    acc0 = jnp.int32(0)
    entries = [
        ("diff+compact_tiled", 3.42, chain_diff_compact_tiled, (cur, prev, acc0)),
        ("diff+compact_subtiled1", 3.42, make_chain_subtiled(1),
         (cur, prev, acc0)),
        ("diff+compact_subtiled1_clustered", 3.42, make_chain_subtiled(1),
         (clus, prev, acc0)),
        ("diff+compact_subtiled8", 3.42, make_chain_subtiled(8),
         (cur, prev, acc0)),
        ("diff+compact_subtiled8_clustered", 3.42, make_chain_subtiled(8),
         (clus, prev, acc0)),
        ("diff+compact_tiled_clustered", 3.42, chain_diff_compact_tiled,
         (clus, prev, acc0)),
        ("diff+compact_pallas", 3.42, chain_diff_compact, (cur, prev, acc0)),
        # the register scheme is a correctness-only cross-check (44.97 ms
        # at 1080p — the scalar row loop does not map to the VPU; see
        # ops/pallas_compact.py) and is excluded from hardware tables
        ("diff+compact_segment", 3.42, make_chain_scheme("segment"),
         (cur, prev, acc0)),
        ("diff_mask_only", 3.42, chain_diff_mask, (cur, prev)),
        ("host_offload_step", 3.42, chain_host_offload, (cur, prev, acc0)),
        ("grayscale_avg", None, filters.grayscale_average, cur),
        ("grayscale_weighted", None, filters.grayscale_weighted, cur),
        ("histogram", None, chain_hist, cur),
        ("histogram_mxu", None, chain_hist_mxu, cur),
        ("binarize_pipeline", None, filters.binarize_pipeline, cur),
        ("heatmap" + ("_sine" if sine_ok else "_lut"), 20.99, chain_heatmap, (cur, prev)),
        ("red_overlap", 0.915, chain_red, (prev, cur)),
    ]
    for k, ref_ms in ((3, 5.1), (5, 9.8), (7, 17.7), (9, 27.7)):
        wq = reference_cpu.quantize_kernel_q16(reference_cpu.gaussian_kernel(k))
        entries.append(
            (f"gaussian_conv_k{k}", ref_ms,
             lambda f, wq=wq: convolve.convolve_q16(f, wq, h, w), cur)
        )
    entries.append(
        ("median_k5", 574.67, lambda f: convolve.median_filter(f, 5, h, w), cur)
    )
    entries.append(
        ("text_overlay_18ch", 18 * 0.001868,
         lambda f: overlay.overlay_blit(f, atlas, ids, jnp.int32(18), h, w), cur)
    )

    rows = []
    for name, ref_ms, fn, init in entries:
        ms = _bench_scan(fn, init, k=K, iters=ITERS)
        if ms < 0.15:
            # small ops: at K=24x4 the timed region is a few ms against
            # a ~30 ms subtracted RTT, so RTT jitter swamps the signal
            # (a 0.034 ms op once read 0.32 — and the subtraction can
            # also err LOW when the calibration window is slower than
            # the timed one, so min(short, long) is biased low, not
            # robust). Re-chain until device time dominates the RTT and
            # take THAT reading unconditionally; 960 steps puts the
            # region at ~1x RTT even for the 0.03 ms ops, shrinking the
            # RTT-jitter term to ~±0.003 ms.
            ms = _bench_scan(fn, init, k=320, iters=3)
        speedup = f"{ref_ms/ms:7.1f}x" if ref_ms and ms > 1e-6 else "      -"
        rows.append((name, ms, ref_ms))
        print(f"{name:24s} {ms:8.3f} ms   jetson {ref_ms or float('nan'):8.3f} ms  {speedup}",
              flush=True)

    if out_path:
        with open(out_path, "w") as f:
            for name, ms, ref_ms in rows:
                f.write(f"{name}\t{ms:.4f}\t{'' if ref_ms is None else ref_ms}\n")
        print(f"wrote {out_path}")
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(p.parse_args().out)
