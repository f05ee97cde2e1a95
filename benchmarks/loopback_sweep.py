"""Hardware end-to-end 1080p serving sweep (VERDICT r3, next-round #1).

The real serving path — executor dispatch -> payload landing -> wire
send over a REAL TCP socket to a real decoding client — swept across
{capture: device-generated / host} x {density: clustered ~1%/3%/6%} x
{fetch: tiles/flat/auto} x {wire: v1/v2/v3} (+ the HOST native-packer
backend), with a per-leg breakdown per row:

* capture  — ``next(source)``: host synthesis (+ the 6.2 MB host->device
  upload inside dispatch) for host rows; for device rows the frame is
  generated IN HBM (the survey's sanctioned fix for the reference's
  capture bottleneck, SURVEY.md §6) and capture is just the async
  dispatch of the generator;
* dispatch — ``executor._dispatch``: jitted step dispatch (async — the
  device work lands in the land leg's sync);
* land     — ``executor._land``: device sync + payload fetch over the
  host<->device link (tunnel-bound here: ~16 MB/s, ~30 ms sync RTT);
* send     — wire encode + socket write to the client (loopback TCP).

Every row ends with a byte-exactness gate: the client's reconstruction
must equal the server's device-side prev state (``executor.resync()``).

The clustered scene: a contiguous band of ``density * n`` bytes flips
between +77 and +154 over the base frame each frame, drifting 4 KB per
step — per-frame changed bytes ~= density * n + 4096, spatially
clustered like a real moving subject (the reference's measured scene is
5.93% changed, report.tex:2594, which its report calls high).

Run on TPU:
    python benchmarks/loopback_sweep.py [--frames 10] [--out FILE]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

STRIDE = 4096


class HostClusteredSource:
    """Host-synthesized clustered scene (deterministic in t)."""

    def __init__(self, cfg, density, seed=0):
        self.n = cfg.frame_bytes
        self.band = max(1, int(density * self.n))
        rng = np.random.default_rng(seed)
        self.base = rng.integers(0, 255, self.n, endpoint=True, dtype=np.uint8)
        self.t = 0

    def base_frame(self):
        return self.base

    def __iter__(self):
        return self

    def __next__(self):
        t = self.t
        self.t += 1
        start = (t * STRIDE) % max(1, self.n - self.band)
        delta = np.uint8(77 if t % 2 == 0 else 154)
        f = self.base.copy()
        f[start : start + self.band] += delta  # uint8 wrap
        return f


class DeviceClusteredSource:
    """The same scene generated in HBM: ``next`` returns a DEVICE array
    (pipe.step keeps it on device — no host round-trip)."""

    def __init__(self, cfg, density, seed=0):
        import jax
        import jax.numpy as jnp

        self.host = HostClusteredSource(cfg, density, seed)
        n, band = self.host.n, self.host.band
        base_dev = jnp.asarray(self.host.base)

        @jax.jit
        def gen(t):
            i = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
            start = (t * STRIDE) % max(1, n - band)
            m = (i >= start) & (i < start + band)
            delta = jnp.where(t % 2 == 0, jnp.uint8(77), jnp.uint8(154))
            return jnp.where(m, base_dev + delta, base_dev)

        self._gen = gen
        self.t = 0

    def base_frame(self):
        return self.host.base

    def __iter__(self):
        return self

    def __next__(self):
        import jax.numpy as jnp

        t = self.t
        self.t += 1
        return self._gen(jnp.int32(t))


def _client_thread(port, height, width, n_frames, out):
    from cudavideostream_tpu.runtime.client import DeltaStreamClient

    cli = DeltaStreamClient("127.0.0.1", port, height, width)
    cli.connect()
    try:
        for _ in range(n_frames):
            cli.read_frame()
        out["frame"] = cli.frame.copy()
    finally:
        cli.close()


def run_row(cfg, source, executor, n_frames, warm=2, pipelined=False,
            batched=False):
    """One serving row; returns (legs ms dict, fps, pos_mean, ok).

    Batched rows (``BatchedLandExecutor``) land every K-th frame: their
    legs are MEANS over the batch window (medians would report the K-1
    zero-cost land legs), so per-leg numbers stay per-frame-amortized
    and directly comparable to the solo rows."""
    from cudavideostream_tpu.runtime import wire
    from cudavideostream_tpu.runtime.server import DeltaStreamServer

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    total = warm + n_frames
    result = {}
    ct = threading.Thread(
        target=_client_thread,
        args=(port, cfg.height, cfg.width, total, result),
        daemon=True,
    )
    ct.start()
    conn, _ = srv.accept()
    conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    base = executor.start(source.base_frame())
    v3enc = None
    if cfg.wire_format == "v2":
        conn.sendall(wire.MAGIC_V2)
    elif cfg.wire_format == "v3":
        conn.sendall(wire.MAGIC_V3)
        v3enc = wire.V3Encoder(base)
    elif cfg.wire_format == "v4":
        conn.sendall(wire.MAGIC_V4)
        v3enc = wire.V4Encoder(base)
    conn.sendall(base.tobytes())

    legs = {"capture": [], "dispatch": [], "land": [], "send": [],
            "total": []}
    poss = []
    sent = 0
    lander = getattr(executor, "_lander", None)
    fetched0 = 0
    for k in range(total):
        timed = k >= warm
        if k == warm and lander is not None:
            fetched0 = lander.fetched_bytes
        t0 = time.perf_counter()
        frame = next(source)
        t1 = time.perf_counter()
        if batched:
            # process() = dispatch + (every K-th frame) the batched
            # landing; report it under "land" — that's what dominates
            t2 = t1
            out = executor.process(frame)
            t3 = time.perf_counter()
            for res in (out or []):
                DeltaStreamServer._send_payload(
                    conn, res, cfg.wire_format, v3enc)
                poss.append(res[0])
                sent += 1
        else:
            td, rest = executor._dispatch(frame, "")
            t2 = time.perf_counter()
            res = executor._land(td, rest)
            t3 = time.perf_counter()
            if res is not None:
                DeltaStreamServer._send_payload(
                    conn, res, cfg.wire_format, v3enc)
                poss.append(res[0])
                sent += 1
        t4 = time.perf_counter()
        if timed:
            legs["capture"].append(1e3 * (t1 - t0))
            legs["dispatch"].append(1e3 * (t2 - t1))
            legs["land"].append(1e3 * (t3 - t2))
            legs["send"].append(1e3 * (t4 - t3))
            legs["total"].append(1e3 * (t4 - t0))
    tail = executor.flush()
    if tail is not None:
        for res in (tail if isinstance(tail, list) else [tail]):
            DeltaStreamServer._send_payload(conn, res, cfg.wire_format, v3enc)
            sent += 1
    assert sent == total, (sent, total)
    ct.join(timeout=120)
    conn.close()
    srv.close()

    # fused-landing fetch bytes per timed frame (deterministic per
    # config — the contention-immune half of the land leg; '-' for
    # rows whose landing bypasses the fused path)
    kb_pf = None
    if lander is not None and lander.fetched_bytes > fetched0:
        kb_pf = (lander.fetched_bytes - fetched0) / n_frames / 1024.0
    agg = np.mean if batched else np.median
    med = {k: float(agg(v)) for k, v in legs.items()}
    fps = 1e3 / med["total"]
    ok = "frame" in result and np.array_equal(
        result["frame"], executor.resync()
    )
    return med, fps, float(np.mean(poss)), ok, kb_pf


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=10)
    p.add_argument("--out", default=None, help="append results here")
    p.add_argument("--quick", action="store_true",
                   help="only the headline rows (device capture)")
    p.add_argument("--height", type=int, default=None,
                   help="override frame geometry (e.g. 2160 for 4K)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--rows", default=None,
                   help="comma-separated row labels to run (subset)")
    p.add_argument("--repeat", type=int, default=1,
                   help="run each selected row N times (fresh executor per "
                        "rep, shared pipeline compiles) — the tunnel's "
                        "contention jitter is +/-2x across minutes, so "
                        "single rows mislead; report the best rep")
    p.add_argument("--rep-sleep", type=float, default=0.0,
                   help="seconds to sleep between rep groups: contended "
                        "tunnel windows last minutes, so spacing the reps "
                        "samples distinct windows")
    args = p.parse_args()
    from cudavideostream_tpu.utils.xla_cache import \
        maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    import jax

    from cudavideostream_tpu.config import CompactionBackend, StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.runtime.executor import (
        BatchedLandExecutor,
        PipelinedExecutor,
        StreamExecutor,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    geo = {} if on_tpu else {"height": 48, "width": 64, "overlay_scale": 1}
    if args.height:
        geo = {"height": args.height, "width": args.width or args.height}
    base_cfg = StreamConfig(tiled_payload=True, **geo)
    print(f"sweep on {jax.devices()[0].platform} "
          f"{base_cfg.height}x{base_cfg.width}", file=sys.stderr)
    # ONE pipeline per compaction config, shared across rows (one 1080p
    # compile each); executors are fresh per row (lander EMAs reset)
    pipe_tiled = DeltaStreamPipeline(base_cfg)
    pipe_mask = None     # built lazily: only mask rows pay its compile
    pipe_maskonly = None  # likewise for bitmask-only emission rows
    host_cfg = StreamConfig(compaction=CompactionBackend("host"), **geo)

    rows = []
    # (label, capture, density, fetch, wire, backend, pipelined)
    matrix = [
        ("dev_d6_tiles_v1", "device", 0.06, "tiles", "v1", "pallas", False),
        ("dev_d6_tiles_v3", "device", 0.06, "tiles", "v3", "pallas", False),
        ("dev_d3_tiles_v1", "device", 0.03, "tiles", "v1", "pallas", False),
        ("dev_d3_tiles_v2", "device", 0.03, "tiles", "v2", "pallas", False),
        ("dev_d3_tiles_v3", "device", 0.03, "tiles", "v3", "pallas", False),
        ("dev_d3_flat_v3", "device", 0.03, "flat", "v3", "pallas", False),
        ("dev_d3_auto_v3", "device", 0.03, "auto", "v3", "pallas", False),
        ("dev_d1_tiles_v1", "device", 0.01, "tiles", "v1", "pallas", False),
        ("dev_d1_tiles_v3", "device", 0.01, "tiles", "v3", "pallas", False),
        ("dev_d1_tiles_v3_pipelined",
         "device", 0.01, "tiles", "v3", "pallas", True),
        # depth-K batched landing (--land-batch): K frames per link
        # round trip; legs are per-frame MEANS, latency is K frames
        ("dev_d1_tiles_v3_batch4", "device", 0.01, "tiles", "v3", "pallas", 4),
        ("dev_d1_tiles_v3_batch8", "device", 0.01, "tiles", "v3", "pallas", 8),
        ("dev_d3_tiles_v3_batch4", "device", 0.03, "tiles", "v3", "pallas", 4),
        ("dev_d1_flat_v3_batch8", "device", 0.01, "flat", "v3", "pallas", 8),
        ("dev_d1_flat_v3_batch16",
         "device", 0.01, "flat", "v3", "pallas", 16),
        ("dev_d3_flat_v3_batch8", "device", 0.03, "flat", "v3", "pallas", 8),
        # "mask" flavor (config.emit_bitmask): packed change-bits window
        # + merged vals prefix — ~1 B/changed byte on clustered scenes
        ("dev_d1_mask_v3_batch8", "device", 0.01, "mask", "v3", "pallas", 8),
        ("dev_d1_mask_v3_batch16",
         "device", 0.01, "mask", "v3", "pallas", 16),
        ("dev_d3_mask_v3_batch8", "device", 0.03, "mask", "v3", "pallas", 8),
        ("dev_d6_mask_v3_batch8", "device", 0.06, "mask", "v3", "pallas", 8),
        # wire v4 ZERO-INDEX path (config.mask_payload): the landing
        # returns the raw bits window and the v4 encoder trims+forwards
        # it — no index stream, no LUT rebuild on the server
        ("dev_d1_mask_v4_batch16",
         "device", 0.01, "mask", "v4", "pallas", 16),
        ("dev_d3_mask_v4_batch8", "device", 0.03, "mask", "v4", "pallas", 8),
        ("dev_d6_mask_v4_batch8", "device", 0.06, "mask", "v4", "pallas", 8),
        # v4 from the index stream (winmask vs delta16 min-of-four,
        # no mask fetch): isolates the encoder gain from the fetch gain
        ("dev_d3_flat_v4_batch8", "device", 0.03, "flat", "v4", "pallas", 8),
        # bitmask-ONLY kernel emission (config.maskonly_payload): the
        # int32 index blocks — half of all kernel HBM writes — are never
        # materialized; the kernel packs the change-bits itself and the
        # device merge is vals-only (logcompact.merge_vals)
        ("dev_d1_maskonly_v4_batch8",
         "device", 0.01, "maskonly", "v4", "pallas", 8),
        ("dev_d1_maskonly_v4_batch16",
         "device", 0.01, "maskonly", "v4", "pallas", 16),
        ("dev_d1_maskonly_v3_batch8",
         "device", 0.01, "maskonly", "v3", "pallas", 8),
        ("dev_d3_maskonly_v4_batch8",
         "device", 0.03, "maskonly", "v4", "pallas", 8),
    ]
    if not args.quick:
        matrix += [
            ("host_d3_tiles_v3", "host", 0.03, "tiles", "v3", "pallas", False),
            ("host_d1_tiles_v3", "host", 0.01, "tiles", "v3", "pallas", False),
            ("hostbk_d3_v3", "host", 0.03, "-", "v3", "host", False),
            ("hostbk_d1_v1", "host", 0.01, "-", "v1", "host", False),
        ]

    lines = [
        f"# hardware end-to-end {base_cfg.height}x{base_cfg.width} serving "
        "sweep: real executor + real TCP client, per-leg medians (ms).",
        "# capture=host pays the 6.2 MB host->device upload inside "
        "dispatch/land; capture=device generates frames in HBM "
        "(SURVEY §6's sanctioned capture fix). land = device sync + "
        "payload fetch over the ~16 MB/s tunnel. All rows byte-exact "
        "(client reconstruction == device prev state).",
        "# row  capture_ms dispatch_ms land_ms send_ms total_ms fps "
        "pos_mean exact [land_KBpf = fused-landing fetch KB/frame, "
        "deterministic per config]",
    ]
    if args.rows:
        wanted = set(args.rows.split(","))
        matrix = [m for m in matrix if m[0] in wanted]
    group_size = len(matrix)
    if args.repeat > 1:
        # interleave reps (A0 B0 C0 A1 B1 C1 ...): contention drifts over
        # minutes, so adjacent reps of one row would share its bias
        matrix = [(f"{m[0]}_rep{r}", *m[1:])
                  for r in range(args.repeat) for m in matrix]
    print("\n".join(lines))
    for row_i, (label, capture, density, fetch, wirefmt, backend,
                pipelined) in enumerate(matrix):
        if args.rep_sleep and row_i and row_i % group_size == 0:
            time.sleep(args.rep_sleep)
        depth = pipelined if isinstance(pipelined, int) \
            and not isinstance(pipelined, bool) else 0
        if backend == "host":
            cfg = dataclasses.replace(host_cfg, wire_format=wirefmt)
            executor = StreamExecutor(cfg)
        else:
            maskish = fetch in ("mask", "maskonly")
            cfg = dataclasses.replace(
                base_cfg,
                fetch_mode=("mask" if maskish else fetch),
                wire_format=wirefmt,
                emit_bitmask=maskish,
                mask_payload=(maskish and wirefmt == "v4"),
                maskonly_payload=(fetch == "maskonly"),
            )
            if fetch == "maskonly":
                if pipe_maskonly is None:
                    pipe_maskonly = DeltaStreamPipeline(
                        dataclasses.replace(
                            base_cfg, fetch_mode="mask",
                            emit_bitmask=True, maskonly_payload=True))
                pipe = pipe_maskonly
            elif fetch == "mask":
                if pipe_mask is None:
                    pipe_mask = DeltaStreamPipeline(
                        dataclasses.replace(base_cfg, emit_bitmask=True))
                pipe = pipe_mask
            else:
                pipe = pipe_tiled
            if depth:
                executor = BatchedLandExecutor(
                    cfg, pipeline=pipe, depth=depth)
            else:
                cls = PipelinedExecutor if pipelined else StreamExecutor
                executor = cls(cfg, pipeline=pipe)
        src = (DeviceClusteredSource(cfg, density)
               if capture == "device" else HostClusteredSource(cfg, density))
        try:
            n = args.frames
            warm = 2
            if depth:
                # whole batches, and enough of them that the mean is a
                # steady-state number: the spec-slicer jits compile
                # lazily per window rung during the first batches
                # (measured on CPU: 64-frame window reads 4.7 ms/frame,
                # 256-frame reads 1.6 — the difference is all compiles)
                warm = 3 * depth
                n = max(6 * depth, (n + depth - 1) // depth * depth)
            med, fps, pos_mean, ok, kb_pf = run_row(
                cfg, src, executor, n, warm=warm,
                pipelined=bool(pipelined) and not depth, batched=bool(depth)
            )
        except Exception as e:
            line = f"{label:28s} FAILED: {type(e).__name__}: {e}"
            print(line, flush=True)
            lines.append(line)
            continue
        line = (
            f"{label:28s} {med['capture']:8.2f} {med['dispatch']:8.2f} "
            f"{med['land']:8.2f} {med['send']:8.2f} {med['total']:9.2f} "
            f"{fps:6.1f} {pos_mean:9.0f} {'OK' if ok else 'MISMATCH'}"
            f"{'' if kb_pf is None else f'  land_KBpf={kb_pf:8.1f}'}"
        )
        print(line, flush=True)
        lines.append(line)

    if args.out:
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")
        print(f"appended to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
