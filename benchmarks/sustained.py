"""Sustained serving: a long tiled+auto loopback session.

Where ``loopback.py`` measures steady-state rates per configuration,
this watches ONE session evolve: the density-adaptive lander starts on
the block path (which measures the link), converges to whichever
landing is cheaper, and the per-frame time should settle — no drift, no
leak, byte-exact throughout (the client asserts reconstruction every
frame via the same scatter-add the reference client runs).

Run on TPU:  ``python benchmarks/sustained.py [--frames 200 --out benchmarks/sustained_tpu_tunnel]``
"""

from __future__ import annotations

import argparse
import threading
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames", type=int, default=200)
    p.add_argument("--fetch", default="auto",
                   choices=["auto", "tiles", "flat", "mask"])
    p.add_argument("--wire", default="v1", choices=["v1", "v2", "v3", "v4"])
    p.add_argument("--land-batch", type=int, default=0,
                   help="depth-K batched landing (as server --land-batch)")
    p.add_argument("--capture", default="host", choices=["host", "device"],
                   help="device: clustered scene generated in HBM (skips "
                        "the 6.2 MB/frame host->device upload, which "
                        "dominates the tunnel); host: the product "
                        "SyntheticSource")
    p.add_argument("--density", type=float, default=0.01,
                   help="clustered changed fraction for --capture device")
    p.add_argument("--maskonly", action="store_true",
                   help="bitmask-only kernel emission (requires "
                        "--fetch mask; config.maskonly_payload)")
    p.add_argument("--calibrate", type=int, default=0, metavar="N",
                   help="N link round trips before the first frame "
                        "(executor.calibrate_link)")
    p.add_argument("--link-cache", default=None, metavar="JSON",
                   help="load/save learned link + speculation state "
                        "(executor load/save_link_cache)")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    from cudavideostream_tpu.utils.xla_cache import \
        maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    if args.maskonly and args.fetch != "mask":
        p.error("--maskonly requires --fetch mask")

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.runtime.client import DeltaStreamClient
    from cudavideostream_tpu.runtime.executor import BatchedLandExecutor
    from cudavideostream_tpu.runtime.server import DeltaStreamServer
    from cudavideostream_tpu.runtime.sources import SyntheticSource

    cfg = StreamConfig(height=args.height, width=args.width, port=0,
                       tiled_payload=True, fetch_mode=args.fetch,
                       wire_format=args.wire,
                       emit_bitmask=(args.fetch == "mask"),
                       mask_payload=(args.fetch == "mask"
                                     and args.wire == "v4"),
                       maskonly_payload=args.maskonly)
    if args.capture == "device":
        from benchmarks.loopback_sweep import DeviceClusteredSource

        source = DeviceClusteredSource(cfg, args.density)
    else:
        source = SyntheticSource(cfg, seed=0)
    executor = (BatchedLandExecutor(cfg, depth=args.land_batch)
                if args.land_batch else None)
    server = DeltaStreamServer(
        cfg, source, executor=executor, verbose=False, overlay_status=True
    )
    cache_loaded = bool(
        args.link_cache
        and server.executor.load_link_cache(args.link_cache))
    if cache_loaded:
        print(f"link cache loaded from {args.link_cache}", file=sys.stderr)
    if args.calibrate:
        server.executor.calibrate_link(args.calibrate)
    n_prewarm = 0
    if cache_loaded or args.calibrate:
        # compile the pipeline + the cached fetch-rung set before the
        # first frame (each rung's first mid-serve use is otherwise a
        # ~0.5-1 s compile stall on the tunnel backend)
        server.executor.start(source.base_frame())
        n_prewarm = server.executor.prewarm_fetch()
        print(f"prewarmed {n_prewarm} fetch jits", file=sys.stderr)
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": args.frames + 2},
        daemon=True,
    )
    t.start()
    cli = DeltaStreamClient("127.0.0.1", server.port, args.height, args.width)
    cli.connect()
    cli.read_frame()  # warm (includes compile)
    cli.read_frame()

    times = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        cli.read_frame()
        times.append(time.perf_counter() - t0)
    cli.close()
    t.join(timeout=30)

    ts = np.asarray(times) * 1e3
    worst = np.argsort(ts)[-10:][::-1]
    print("worst frames (idx: ms): "
          + ", ".join(f"{i}: {ts[i]:.0f}" for i in worst), file=sys.stderr)
    k = max(1, len(ts) // 10)
    lander = server.executor._lander
    bps = lander.link.bps
    lines = [
        f"frames          \t{len(ts)}",
        f"first_{k}_ms_avg \t{ts[:k].mean():.1f}",
        f"last_{k}_ms_avg  \t{ts[-k:].mean():.1f}",
        f"median_ms       \t{np.median(ts):.1f}",
        f"p95_ms          \t{np.percentile(ts, 95):.1f}",
        f"fps_overall     \t{1e3 * len(ts) / ts.sum():.1f}",
        f"landings_tiles  \t{lander.fetch_counts['tiles']}",
        f"landings_flat   \t{lander.fetch_counts['flat']}",
        f"landings_mask   \t{lander.fetch_counts['mask']}",
        f"spec_hits       \t{lander.spec_counts['hit']}",
        f"spec_misses     \t{lander.spec_counts['miss']}",
        f"fetched_KBpf    \t{lander.fetched_bytes / max(1, len(ts)) / 1024:.1f}",
        f"link_bps_est    \t{0 if bps is None else int(bps)}",
        f"merge_s_est     \t{lander.link.merge_s:.4f}",
        "warm_start      \t" + ("+".join(
            (["cache"] if cache_loaded else [])
            + ([f"calibrate{args.calibrate}"] if args.calibrate else [])
            + ([f"prewarm{n_prewarm}"] if n_prewarm else [])
        ) or "cold"),
    ]
    if args.link_cache:
        server.executor.save_link_cache(args.link_cache)
    for ln in lines:
        print(ln)
    if args.out:
        with open(args.out, "a") as f:
            f.write(
                f"# Sustained {args.height}x{args.width} tiled serving, "
                f"fetch={args.fetch} wire={args.wire} "
                f"land_batch={args.land_batch} capture={args.capture} "
                f"density={args.density}, real TCP loopback, byte-exact "
                f"every frame (client-side scatter-add). Transport-bound "
                f"over the ~16 MB/s tunnel; the signal is stability "
                f"(first vs last decile) and the lander's convergence.\n"
            )
            f.write("\n".join(lines) + "\n")
        print(f"appended to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
