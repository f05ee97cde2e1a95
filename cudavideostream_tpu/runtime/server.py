"""The streaming TCP server — the product's main entry point.

Wire-compatible rebuild of the reference server loop (``server.cpp:38-175``
+ ``th_show_hdl``, ``threads.cpp:181-237``): listen on one socket, accept
one client, ship the raw base frame, then per frame ship
``[u32 pos][i32 xs[pos]][u8 vals[pos]]`` — the reference OpenCV client
decodes this stream unmodified.

Differences by design:

* runtime config instead of recompiling ``common.h`` (resolution,
  threshold, filters, port are CLI flags);
* SIGPIPE doesn't kill the process (the reference exits on client
  disconnect, ``server.cpp:16-18``): the server closes the connection and
  accepts the next client, re-sending a fresh base frame;
* the 1 Hz status line is printed *and* rendered into the stream via the
  glyph overlay, matching ``server.cpp:164-168``.

Run:  ``python -m cudavideostream_tpu.runtime.server --source synthetic``
"""

from __future__ import annotations

import argparse
import socket
import sys
import time

import numpy as np

from cudavideostream_tpu import native
from cudavideostream_tpu.config import (
    CompactionBackend,
    PayloadOverflowError,
    StreamConfig,
    Visualizer,
)
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.executor import StreamExecutor
from cudavideostream_tpu.runtime.sources import FrameSource, make_source


class DeltaStreamServer:
    def __init__(self, config: StreamConfig, source: FrameSource,
                 executor: StreamExecutor | None = None, verbose: bool = True,
                 overlay_status: bool = True, aux_dir: str | None = None,
                 aux_every: int = 30, resume: bool = False,
                 aux_sink=None):
        self.cfg = config
        self.source = source
        self.executor = executor or StreamExecutor(config)
        self.verbose = verbose
        # resume=True: the executor already holds state (load_state) —
        # serve FROM it instead of re-basing on the source. The shipped
        # base frame is the checkpoint's prev bytes, so a fresh client
        # starts correct and a client that kept its reconstruction from
        # the pre-restart session receives exactly the bytes it already
        # has (its reconstruction byte-equals the checkpoint prev).
        self.resume = resume
        # render the 1 Hz status into the video (server.cpp:166-168);
        # off => deterministic streams for tests
        self.overlay_status = overlay_status
        # visualizer-frame sink: the reference imshows the aux frame on a
        # dedicated thread when SERVER_IMSHOW is set (th_noise_hdl,
        # threads.cpp:149-164); headless equivalent: periodic PPM dumps
        self.aux_dir = aux_dir
        self.aux_every = aux_every
        # LIVE aux relay (th_noise_hdl parity, threads.cpp:149-164): an
        # AuxStreamSink serving the visualizer frame on a side socket in
        # real time — viewers attach/detach freely, a slow viewer never
        # backpressures the delta stream (auxstream module docstring)
        self.aux_sink = aux_sink
        self._sock: socket.socket | None = None

    def listen(self) -> socket.socket:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.cfg.host, self.cfg.port))
        srv.listen(10)
        self._sock = srv
        if self.verbose:
            print(f"listening on {self.cfg.host}:{self.cfg.port}", flush=True)
        return srv

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def serve(self, max_frames: int | None = None, max_clients: int | None = 1) -> int:
        """Accept clients sequentially; returns frames served in total."""
        if self._sock is None:
            self.listen()
        served = 0
        clients = 0
        while max_clients is None or clients < max_clients:
            conn, addr = self._sock.accept()
            clients += 1
            if self.verbose:
                print(f"client {addr} connected", flush=True)
            try:
                served += self._stream_to(conn, max_frames)
            except (BrokenPipeError, ConnectionResetError):
                if self.verbose:
                    print("client disconnected", flush=True)
            finally:
                conn.close()
        return served

    def _stream_to(self, conn: socket.socket, max_frames: int | None) -> int:
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        if self.resume:
            base = self.executor.resync()
        else:
            base = self.executor.start(self.source.base_frame())
        v3enc = None
        if self.cfg.wire_format == "v2":
            conn.sendall(wire.MAGIC_V2)
        elif self.cfg.wire_format == "v3":
            conn.sendall(wire.MAGIC_V3)
            v3enc = wire.V3Encoder(base)
        elif self.cfg.wire_format == "v4":
            conn.sendall(wire.MAGIC_V4)
            v3enc = wire.V4Encoder(base)
        conn.sendall(base.tobytes())
        text = ""
        n = 0
        self._n_out = 0  # landed-frame index (lags n under batching)
        while max_frames is None or n < max_frames:
            t0 = time.perf_counter()
            try:
                frame = next(self.source)
            except StopIteration:
                break
            read_s = time.perf_counter() - t0
            try:
                result = self.executor.process(frame, text=text)
            except PayloadOverflowError:
                if v3enc is None:
                    # v1/v2 cannot express a resync — fail loudly rather
                    # than desync the client (config.PayloadOverflowError)
                    raise
                # wire v3 recovery: one raw frame replaces the client
                # state wholesale; the executor drops any pending
                # pipelined payload (its deltas are subsumed). The aux
                # visualizer frame for this frame is dropped with it.
                buf = v3enc.resync(self.executor.resync())
                conn.sendall(buf)
                self.executor.metrics.record(
                    time.perf_counter() - t0 - read_s, 0,
                    wire_bytes=len(buf),
                )
                result = None
            if result is not None:  # pipelined/batched executors lag
                # batched-landing executors return a LIST of per-frame
                # results (oldest first); normalize so both shapes share
                # one send path
                for res in (result if isinstance(result, list) else [result]):
                    self._emit(conn, res, v3enc, self._n_out)
                    self._n_out += 1
            n += 1
            line = self.executor.metrics.status_line(read_s)
            if line:
                if self.overlay_status:
                    text = self.executor.metrics.overlay_text()
                if self.verbose:
                    print("\r" + line, end="", flush=True)
        # the pipelined tail can overflow too (the LAST frame may be the
        # scene cut): same v3 recovery as the loop
        try:
            tail = self.executor.flush()
        except PayloadOverflowError:
            if v3enc is None:
                raise
            tail = None
            buf = v3enc.resync(self.executor.resync())
            conn.sendall(buf)
            self.executor.metrics.record(0.0, 0, wire_bytes=len(buf))
        if tail is not None:
            for res in (tail if isinstance(tail, list) else [tail]):
                self._emit(conn, res, v3enc, self._n_out)
                self._n_out += 1
        if self.verbose:
            print()
        return n

    def _emit(self, conn: socket.socket, res, v3enc, idx: int) -> None:
        """Send one landed frame result and run its side channels."""
        sent = self._send_payload(conn, res, self.cfg.wire_format, v3enc)
        if sent is not None:  # v2/v3: correct the wire-bytes stat
            self.executor.metrics.wire_bytes += sent - (4 + 5 * res[0])
        aux = res[3]
        if self.aux_sink is not None and aux is not None:
            self.aux_sink.push(idx, aux)
        if self.aux_dir and aux is not None and idx % self.aux_every == 0:
            from cudavideostream_tpu.runtime.client import write_ppm

            write_ppm(
                f"{self.aux_dir}/aux_{idx:06d}.ppm",
                aux, self.cfg.height, self.cfg.width,
            )

    @staticmethod
    def _send_payload(conn: socket.socket, result, wire_format: str = "v1",
                      v3enc: "wire.V3Encoder | None" = None) -> None:
        pos, xs, vals, aux = result
        if wire_format in ("v3", "v4"):
            # adaptive: per-frame cheapest mode — the encoder keeps the
            # client-state shadow, so this composes with every executor
            # (incl. pipelined one-frame lag). v4 (a V4Encoder) adds the
            # winmask mode and forwards MaskPayload bits untranslated.
            buf = v3enc.encode(pos, xs, vals)
            conn.sendall(buf)
            return len(buf)
        if isinstance(xs, wire.MaskPayload):
            # a mask_payload config under a v1/v2 wire: rebuild indices
            # (correct, just not the zero-index path v4 exists for)
            xs, vals = xs.to_flat()
        if wire_format == "v2":
            # delta16: host-side encode (one tiny numpy pass over the
            # payload); the scatter-gather zero-copy path is a v1-only
            # trick — v2 trades host CPU for ~40% of the wire bytes
            if isinstance(xs, wire.TiledPayload):
                fx, fv = xs.to_flat()
            else:
                fx, fv = xs, vals
            buf = wire.pack_payload_v2(pos, fx, fv)
            conn.sendall(buf)
            return len(buf)
        if isinstance(xs, wire.TiledPayload):
            # scatter-gather: the ragged tile concat happens inside one
            # writev's iovec list — wire bytes identical to the flat path
            rc = native.wire_send_segments_fd(
                conn.fileno(), pos, xs.counts, xs.xs, xs.vals
            )
            if rc == -1:  # native helper unavailable: pure-python path
                conn.sendall(xs.to_wire_bytes())
            elif rc < 0:
                raise BrokenPipeError(f"writev failed: {rc}")
            return
        rc = native.wire_send_payload_fd(conn.fileno(), pos, xs, vals)
        if rc == -1:  # native helper unavailable: pure-python path
            conn.sendall(wire.pack_payload(pos, xs, vals))
        elif rc < 0:
            raise BrokenPipeError(f"writev failed: {rc}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU delta-stream server")
    p.add_argument("--source", default="synthetic",
                   choices=["synthetic", "file", "v4l2"])
    p.add_argument("--path", help="file source path / camera device")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=2734)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--threshold", type=int, default=20)
    p.add_argument("--threshold-map", default=None,
                   help=".npy per-pixel or per-byte uint8 sensitivity map "
                        "(H,W) / (H,W,3) / flat — per-region thresholds "
                        "instead of the global one")
    p.add_argument("--visualizer", type=int, default=0,
                   help="0 none, 1 heatmap, 2 red-black, 3 red-overlap, "
                        "4 grayscale, 5 binarize")
    p.add_argument("--noise-filter", action="store_true")
    p.add_argument("--conv-k", type=int, default=3)
    p.add_argument("--compaction", default="pallas",
                   choices=[b.value for b in CompactionBackend])
    p.add_argument("--wire", default="v1",
                   choices=["v1", "v2", "v3", "v4"],
                   help="v1 = reference-compatible wire (default); "
                        "v2 = delta16 index compression (~40%% fewer "
                        "bytes); v3 = adaptive delta16/bitmask/raw — "
                        "worst-case wire bytes capped at ~one raw frame; "
                        "v4 = v3 + winmask (window change-bitmask; with "
                        "--fetch mask the device's packed bits reach the "
                        "client with zero server-side index rebuild) "
                        "(client must also use --wire v2/v3/v4/auto)")
    p.add_argument("--tiled", action="store_true",
                   help="ship per-tile payload blocks straight from the "
                        "kernel through the scatter-gather sender "
                        "(skips the device merge epilogue; wire bytes "
                        "identical)")
    p.add_argument("--fetch", default="auto",
                   choices=["auto", "tiles", "flat", "mask"],
                   help="tiled-payload landing: tiles = per-tile block "
                        "fetch; flat = device merge + pos-prefix fetch "
                        "(fewest bytes over the link on scattered "
                        "scenes); mask = packed change-bits window + "
                        "merged vals prefix (~1 B per changed byte — "
                        "fewest bytes on clustered scenes; implies "
                        "--bitmask); auto = pick per frame from "
                        "measured link/merge times")
    p.add_argument("--bitmask", action="store_true",
                   help="emit the packed change-bitmask alongside tiled "
                        "payloads (one extra fused device pass) so the "
                        "landing can use the 'mask' fetch flavor — on "
                        "by default under --fetch mask; offered to "
                        "--fetch auto as a third option")
    p.add_argument("--maskonly", action="store_true",
                   help="bitmask-ONLY kernel emission (requires --fetch "
                        "mask): the kernel never materializes the int32 "
                        "index blocks (half of its HBM writes at 1080p) "
                        "and packs the change-bits in-kernel; indices "
                        "are rebuilt exactly from the bits, so every "
                        "wire format still works")
    p.add_argument("--subtile", type=int, default=None,
                   help="sub-tiled compaction granularity in rows "
                        "(tiled payloads; 0 = whole-tile units; default "
                        "1 = pure lane compaction, fastest kernel; use "
                        "8 on tunnel-class host links — see "
                        "benchmarks/subtile_ab)")
    p.add_argument("--no-pair-lanes", action="store_true",
                   help="disable pair-packed lane compaction (two 15-bit "
                        "row units per int32 lane; ~20%% faster shift "
                        "passes at subtile 1 — benchmarks/pair_ab)")
    p.add_argument("--capacity", type=int, default=None,
                   help="payload capacity bound in bytes (default: worst "
                        "case = frame bytes, never overflows). Caps device "
                        "payload buffers and host transfers; a frame that "
                        "changes more bytes overflows — fatal under "
                        "--wire v1/v2 (no way to resync a client), "
                        "recovered under --wire v3 by shipping one raw "
                        "resync frame")
    p.add_argument("--backend", default="device", choices=["device", "oracle"],
                   help="device = JAX/Pallas pipeline; oracle = pure-NumPy "
                        "CPU reference (the #ifdef CPU path, but complete)")
    p.add_argument("--mesh", default=None, metavar="D,S",
                   help="run the sharded multi-chip pipeline over a "
                        "(data=D, space=S) device mesh (D*S devices; "
                        "image rows shard across S). Payload layout is "
                        "'sharded' (zero payload collectives; shard "
                        "blocks ride the scatter-gather sender)")
    p.add_argument("--pipelined", action="store_true",
                   help="one-frame-deep software pipeline: overlap frame N's "
                        "compute with frame N-1's payload landing")
    p.add_argument("--land-batch", type=int, default=0, metavar="K",
                   help="land K frames' payloads per device round trip "
                        "(requires --tiled): divides the host<->device "
                        "link latency by K at the cost of K frames of "
                        "output latency — the big lever on high-RTT "
                        "links (benchmarks/loopback_tpu_tunnel); 0 = off")
    p.add_argument("--prefetch", action="store_true",
                   help="capture frames on a dedicated thread (the "
                        "reference's th_cap): overlaps source latency "
                        "with compute+send — wins when the source is "
                        "slow (a real ~30-40 ms camera), buys nothing "
                        "on transfer-bound links (benchmarks/"
                        "ingest_overlap_results), so default off")
    p.add_argument("--frames", type=int, default=None,
                   help="stop after N frames (default: run forever)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--aux-dir", default=None,
                   help="dump visualizer aux frames as PPMs here "
                        "(the headless SERVER_IMSHOW)")
    p.add_argument("--aux-port", type=int, default=None, metavar="PORT",
                   help="ALSO serve the live visualizer frame on this "
                        "side socket (th_noise_hdl parity) — attach "
                        "with client --aux or the --http viewer's aux "
                        "panel; slow viewers drop frames, never stall "
                        "the delta stream (requires --visualizer)")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume serving from a checkpoint (.npz written "
                        "by --save-state): the shipped base frame is the "
                        "checkpoint's prev state, so reconnecting clients "
                        "that kept their reconstruction stay byte-exact")
    p.add_argument("--save-state", default=None, metavar="CKPT",
                   help="write the executor state checkpoint here after "
                        "serving (pair with --resume on the next run)")
    p.add_argument("--link-cache", default=None, metavar="JSON",
                   help="persist the LEARNED link + speculation state "
                        "across sessions: load it (if present and its "
                        "geometry fingerprint matches) before serving, "
                        "rewrite it after — kills the cold-start "
                        "learning transient (a third of a 300-frame "
                        "session, benchmarks/sustained_tpu_tunnel r4). "
                        "Advisory only: a stale cache costs extra miss "
                        "round trips, never a byte")
    p.add_argument("--calibrate", type=int, default=2, metavar="N",
                   help="seed the link-bandwidth estimate with N real "
                        "device round trips before the first frame "
                        "(~35 ms each on the tunnel; 0 disables; "
                        "default 2; no-op for --backend oracle/--mesh)")
    args = p.parse_args(argv)
    from cudavideostream_tpu.utils.xla_cache import \
        maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    # genuinely impossible combos only: --tiled is the single-chip emit
    # mode (the sharded layout IS the mesh analogue) and the oracle is
    # the single-host CPU reference. --threshold-map and --pipelined
    # compose with --mesh (the map shards along rows like the frame;
    # the pipelined executor wraps the sharded step identically).
    if args.mesh and (args.tiled or args.backend == "oracle"):
        p.error("--mesh is exclusive with --tiled/--backend oracle")
    if args.mesh and args.compaction != "pallas":
        # the sharded pipeline compacts per shard with the Pallas kernel
        # unconditionally — reject rather than silently drop the flag
        p.error("--mesh supports --compaction pallas only")
    if args.fetch != "auto" and not args.tiled:
        p.error("--fetch tiles/flat/mask applies to --tiled payloads")
    if args.bitmask and not args.tiled:
        p.error("--bitmask applies to --tiled payloads")
    if args.maskonly and args.fetch != "mask":
        p.error("--maskonly requires --fetch mask (no index blocks "
                "exist for the tiles/flat landings)")
    if args.capacity is not None and (args.mesh or args.tiled):
        # sharded/tiled payload layouts are always worst-case capacity
        # (config.py validates tiled; sharded.py pins capacity itself)
        p.error("--capacity applies to flat single-chip payloads only")
    if args.land_batch:
        if not args.tiled:
            p.error("--land-batch requires --tiled payloads")
        if args.pipelined or args.mesh or args.backend == "oracle":
            p.error("--land-batch is exclusive with --pipelined/--mesh/"
                    "--backend oracle (batching subsumes the one-frame "
                    "pipeline; the mesh/oracle executors land per frame)")

    cfg = StreamConfig(
        height=args.height,
        width=args.width,
        threshold=args.threshold,
        visualizer=Visualizer(args.visualizer),
        noise_filter=args.noise_filter,
        conv_k=args.conv_k,
        compaction=CompactionBackend(args.compaction),
        tiled_payload=args.tiled,
        fetch_mode=args.fetch,
        emit_bitmask=args.bitmask or args.fetch == "mask",
        # the zero-index path: v4 + mask-capable landing -> the bits
        # window is forwarded untranslated (wire.MaskPayload)
        mask_payload=(
            args.wire == "v4"
            and (args.bitmask or args.fetch == "mask")
        ),
        maskonly_payload=args.maskonly,
        wire_format=args.wire,
        host=args.host,
        port=args.port,
        payload_capacity=args.capacity,
        pair_lanes=not args.no_pair_lanes,
        **(
            {"subtile_rows": args.subtile}
            if args.subtile is not None else {}
        ),
    )
    source = make_source(args.source, cfg, path=args.path, seed=args.seed)
    if args.prefetch:
        from cudavideostream_tpu.runtime.sources import PrefetchSource

        source = PrefetchSource(source)
    thr_map = None
    if args.threshold_map:
        tm = np.load(args.threshold_map)
        if tm.ndim == 2:  # per-pixel (H, W) -> per-byte
            tm = np.repeat(tm.ravel(), 3)
        thr_map = np.asarray(tm, dtype=np.uint8).ravel()
    if thr_map is not None and args.backend == "oracle":
        p.error("--threshold-map is not supported by --backend oracle")
    executor = None
    if args.mesh:
        from cudavideostream_tpu.runtime.sharded_executor import (
            PipelinedShardedExecutor,
            ShardedStreamExecutor,
            make_mesh,
        )

        d, s = (int(x) for x in args.mesh.split(","))
        cls = PipelinedShardedExecutor if args.pipelined else ShardedStreamExecutor
        executor = cls(cfg, mesh=make_mesh(d, s), threshold_map=thr_map)
    elif args.backend == "oracle":
        from cudavideostream_tpu.runtime.oracle_executor import OracleExecutor

        executor = OracleExecutor(cfg)
    elif args.pipelined:
        from cudavideostream_tpu.models import DeltaStreamPipeline
        from cudavideostream_tpu.runtime.executor import PipelinedExecutor

        executor = PipelinedExecutor(
            cfg,
            pipeline=(
                DeltaStreamPipeline(cfg, threshold_map=thr_map)
                if thr_map is not None else None
            ),
        )
    elif args.land_batch:
        from cudavideostream_tpu.models import DeltaStreamPipeline
        from cudavideostream_tpu.runtime.executor import BatchedLandExecutor

        executor = BatchedLandExecutor(
            cfg,
            pipeline=(
                DeltaStreamPipeline(cfg, threshold_map=thr_map)
                if thr_map is not None else None
            ),
            depth=args.land_batch,
        )
    if thr_map is not None and executor is None:
        from cudavideostream_tpu.models import DeltaStreamPipeline

        executor = StreamExecutor(
            cfg, pipeline=DeltaStreamPipeline(cfg, threshold_map=thr_map)
        )
    import os as _os
    if args.aux_dir:
        _os.makedirs(args.aux_dir, exist_ok=True)
    if args.resume or args.save_state:
        if executor is None:
            executor = StreamExecutor(cfg)
        if not hasattr(executor, "load_state"):
            p.error("--resume/--save-state need a checkpointable executor "
                    "(not available under --mesh or --backend oracle)")
    if args.resume:
        executor.load_state(args.resume)
    if args.link_cache or args.calibrate:
        if executor is None:
            executor = StreamExecutor(cfg)
        warmable = hasattr(executor, "load_link_cache")
        if args.link_cache and not warmable:
            p.error("--link-cache needs a device StreamExecutor "
                    "(not available under --mesh or --backend oracle)")
        if args.link_cache and executor.load_link_cache(args.link_cache):
            print(f"link cache loaded from {args.link_cache}",
                  file=sys.stderr)
        if args.calibrate and warmable:
            executor.calibrate_link(rounds=args.calibrate)
        if warmable:
            # compile the pipeline step + the cached fetch-rung set
            # BEFORE accepting clients: without a persistent XLA cache
            # each rung's first mid-serve use is a ~0.5-1 s stall on
            # the tunnel backend (benchmarks/sustained_tpu_tunnel)
            if not args.resume:
                executor.start(source.base_frame())
            n = executor.prewarm_fetch()
            print(f"prewarmed {n} fetch jits", file=sys.stderr)
    aux_sink = None
    if args.aux_port is not None:
        if not args.visualizer:
            p.error("--aux-port needs --visualizer (no aux frame exists)")
        from cudavideostream_tpu.runtime.auxstream import AuxStreamSink

        aux_sink = AuxStreamSink(cfg.height, cfg.width,
                                 host=cfg.host, port=args.aux_port)
        print(f"aux stream on {cfg.host}:{aux_sink.port}", file=sys.stderr)
    server = DeltaStreamServer(cfg, source, executor=executor,
                               aux_dir=args.aux_dir, resume=bool(args.resume),
                               aux_sink=aux_sink)
    served = server.serve(max_frames=args.frames)
    if aux_sink is not None:
        aux_sink.close()
    if args.save_state:
        executor.save_state(args.save_state)
        print(f"state saved to {args.save_state}", file=sys.stderr)
    if args.link_cache:
        executor.save_link_cache(args.link_cache)
        print(f"link cache saved to {args.link_cache}", file=sys.stderr)
    print(f"served {served} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
