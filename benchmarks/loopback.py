"""Full streaming-loop benchmark: capture -> diff -> compress -> socket ->
client decode, over a real localhost TCP connection (BASELINE.json's
"full streaming loop" config; the reference's end-to-end number is 26
fps, capture-bound, report.tex:914).

Note for tunneled dev environments: host<->device transfers through the
axon tunnel run at ~16 MB/s, so this number is transport-bound there;
the per-chip compute rate is bench.py's headline. On co-located
hardware the device<->host legs are PCIe-class and this loop is
compute-bound.

Also reports the pure-CPU oracle diff-encode rate (the reference's CPU
path: 7 fps / 140 ms, report.tex:308).

Run:  ``python benchmarks/loopback.py [--height 1080 --width 1920]``
"""

from __future__ import annotations

import argparse
import threading
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def cpu_oracle_rate(height, width, frames=5):
    from cudavideostream_tpu.ops import reference_cpu as ref

    n = height * width * 3
    rng = np.random.default_rng(0)
    prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur = np.where(
        rng.random(n) < 0.06, (prev.astype(np.int32) + 100) % 256, prev
    ).astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(frames):
        _, _, _, prev2 = ref.diff_encode(cur, prev)
    dt = (time.perf_counter() - t0) / frames
    return 1e3 * dt


def loopback_rate(height, width, frames, backend, wire="v1",
                  tiled=False, fetch="auto"):
    import dataclasses

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.runtime.client import DeltaStreamClient
    from cudavideostream_tpu.runtime.server import DeltaStreamServer
    from cudavideostream_tpu.runtime.sources import SyntheticSource

    cfg = StreamConfig(height=height, width=width, port=0, wire_format=wire,
                       tiled_payload=tiled, fetch_mode=fetch)
    executor = None
    if backend == "oracle":
        from cudavideostream_tpu.runtime.oracle_executor import OracleExecutor

        executor = OracleExecutor(cfg)
    server = DeltaStreamServer(
        cfg, SyntheticSource(cfg, seed=0), executor=executor, verbose=False
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": frames + 2}, daemon=True
    )
    t.start()
    cli = DeltaStreamClient("127.0.0.1", server.port, height, width)
    cli.connect()
    cli.read_frame()  # warm (includes compile)
    cli.read_frame()
    t0 = time.perf_counter()
    for _ in range(frames):
        cli.read_frame()
    dt = (time.perf_counter() - t0) / frames
    cli.close()
    return 1e3 * dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    rows = []
    ms = cpu_oracle_rate(args.height, args.width)
    rows.append(("cpu_oracle_diff_encode", ms))
    print(f"CPU oracle diff-encode: {ms:8.2f} ms/frame ({1e3/ms:6.1f} fps) "
          f"[reference CPU: 140 ms / 7 fps]")
    ms = loopback_rate(args.height, args.width, args.frames, "oracle")
    rows.append(("loop_oracle_backend", ms))
    print(f"full loop (oracle backend, TCP loopback): {ms:8.2f} ms/frame "
          f"({1e3/ms:6.1f} fps)")
    ms = loopback_rate(args.height, args.width, args.frames, "device")
    rows.append(("loop_device_backend", ms))
    print(f"full loop (device backend, TCP loopback): {ms:8.2f} ms/frame "
          f"({1e3/ms:6.1f} fps) [reference: ~38 ms / 26 fps]")
    ms = loopback_rate(args.height, args.width, args.frames, "device", wire="v2")
    rows.append(("loop_device_backend_wire_v2", ms))
    print(f"full loop (device backend, wire v2): {ms:8.2f} ms/frame "
          f"({1e3/ms:6.1f} fps) [~40% fewer payload bytes]")
    # tiled payload landing strategies (the density-adaptive fetch):
    # the synthetic scene's change is scattered, so per-tile block fetch
    # moves ~whole-frame bytes over the link while the device-merged
    # flat prefix moves only ~5*pos — "auto" should converge on flat
    # over a slow link and on tiles over PCIe-class links.
    for fetch in ("tiles", "flat", "auto"):
        ms = loopback_rate(args.height, args.width, args.frames, "device",
                           tiled=True, fetch=fetch)
        rows.append((f"loop_device_tiled_fetch_{fetch}", ms))
        print(f"full loop (tiled payload, fetch={fetch}): {ms:8.2f} ms/frame "
              f"({1e3/ms:6.1f} fps)")
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                f"# leg\tms_per_frame ({args.height}x{args.width}; device "
                f"leg is transport-bound over the ~16 MB/s axon tunnel — "
                f"chip-rate is bench.py's headline; reference end-to-end: "
                f"38 ms / 26 fps, report.tex:914)\n"
            )
            for name, ms in rows:
                f.write(f"{name}\t{ms:.2f}\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
