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
    p.add_argument("--fetch", default="auto", choices=["auto", "tiles", "flat"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.runtime.client import DeltaStreamClient
    from cudavideostream_tpu.runtime.server import DeltaStreamServer
    from cudavideostream_tpu.runtime.sources import SyntheticSource

    cfg = StreamConfig(height=args.height, width=args.width, port=0,
                       tiled_payload=True, fetch_mode=args.fetch)
    server = DeltaStreamServer(
        cfg, SyntheticSource(cfg, seed=0), verbose=False, overlay_status=True
    )
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
    k = max(1, len(ts) // 10)
    lander = server.executor._lander
    bps = lander.link.bps
    lines = [
        f"frames          \t{len(ts)}",
        f"first_{k}_ms_avg \t{ts[:k].mean():.1f}",
        f"last_{k}_ms_avg  \t{ts[-k:].mean():.1f}",
        f"median_ms       \t{np.median(ts):.1f}",
        f"p95_ms          \t{np.percentile(ts, 95):.1f}",
        f"landings_tiles  \t{lander.fetch_counts['tiles']}",
        f"landings_flat   \t{lander.fetch_counts['flat']}",
        f"link_bps_est    \t{0 if bps is None else int(bps)}",
        f"merge_s_est     \t{lander.link.merge_s:.4f}",
    ]
    for ln in lines:
        print(ln)
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                f"# Sustained {args.height}x{args.width} tiled serving, "
                f"fetch={args.fetch}, real TCP loopback, byte-exact every "
                f"frame (client-side scatter-add). Transport-bound over "
                f"the ~16 MB/s tunnel; the signal is stability (first vs "
                f"last decile) and the lander's convergence.\n"
            )
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
