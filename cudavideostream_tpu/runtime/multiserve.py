"""Multi-stream server: B cameras, B ports, ONE chip, one jitted step.

The reference binds one capture device to one socket
(``threads.cpp:166-237``). A chip that encodes a 1080p delta in ~1 ms
can carry many streams; this server drives a
:class:`~cudavideostream_tpu.models.batched.BatchedDeltaPipeline` over B
independent sources and serves stream ``b`` on ``port + b``. Clients
are per-stream and may join mid-stream: like the broadcast server, a
joiner's base frame is the stream's *current* reconstruction (tracked
host-side with O(pos) in-place scatters), so no stream ever restarts.

Run:  ``python -m cudavideostream_tpu.runtime.multiserve --streams 4``
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from typing import List, Optional

import numpy as np

from cudavideostream_tpu import native
from cudavideostream_tpu.config import PayloadOverflowError, StreamConfig
from cudavideostream_tpu.models import BatchedDeltaPipeline
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.executor import (
    ExecMetrics,
    TieredFetcher,
    TiledLander,
)
from cudavideostream_tpu.runtime.sources import FrameSource


class MultiStreamServer:
    """``mesh=None``: one chip, vmapped batched step. With a
    ``(data, space)`` mesh: streams shard across ``data`` and each
    frame's rows across ``space`` (the sharded pipeline with the
    ``"sharded"`` payload layout — each space-shard's compacted block
    rides the scatter-gather sender as a tile, zero payload
    collectives). B must be divisible by the data axis."""

    def __init__(self, config: StreamConfig, sources: List[FrameSource],
                 verbose: bool = True, overlay_status: bool = True,
                 mesh=None, aux_dir: str = None, aux_every: int = 30):
        # aux_dir: per-stream visualizer-frame sink (aux_<b>_<n>.ppm),
        # the multi-stream analogue of server.py --aux-dir — without a
        # sink the --visualizer flag would compute aux frames that
        # nothing observes
        self.aux_dir = aux_dir
        self.aux_every = aux_every
        if config.fetch_mode == "mask":
            # the batched/sharded pipelines don't emit the packed
            # change-bits (config.emit_bitmask is a solo-pipeline
            # feature); refuse rather than silently landing through a
            # different flavor
            raise ValueError(
                "fetch_mode 'mask' is not supported by the multi-stream "
                "server — use tiles/flat/auto (the mask flavor rides "
                "the solo StreamExecutor/BatchedLandExecutor landings)"
            )
        self.cfg = config
        self.sources = sources
        self.B = len(sources)
        if mesh is not None:
            from cudavideostream_tpu.parallel.sharded import (
                ShardedDeltaPipeline,
            )

            if self.B % mesh.shape["data"]:
                raise ValueError(
                    f"{self.B} streams not divisible by data={mesh.shape['data']}"
                )
            self.pipe = ShardedDeltaPipeline(
                config, mesh, payload_layout="sharded"
            )
        else:
            self.pipe = BatchedDeltaPipeline(config, self.B)
        self._sharded = mesh is not None
        self.verbose = verbose
        self.overlay_status = overlay_status
        self._socks: List[socket.socket] = []
        self._pending: List["queue.Queue[socket.socket]"] = [
            queue.Queue() for _ in range(self.B)
        ]
        self._clients: List[Optional[socket.socket]] = [None] * self.B
        self._stop = threading.Event()
        self._fetch_xs = TieredFetcher(config.capacity)
        self._fetch_vals = TieredFetcher(config.capacity)
        # the sharded payload layout's whole point is ZERO payload
        # collectives — a device-side merge_tiles over space-sharded
        # blocks would gather every shard to one device per frame, so
        # the lander takes the per-shard count-prefix path there (each
        # "tile" is a whole shard: block fetches would move ~5x the
        # frame bytes per stream)
        from cudavideostream_tpu.runtime.executor import LinkStats

        self._lander = TiledLander(
            "shards" if self._sharded else config.fetch_mode,
            LinkStats(
                merge_s_init=50e-3 if config.subtile_rows else 1.5e-3
            ),
        )
        self.metrics = ExecMetrics()

    def listen(self) -> None:
        for b in range(self.B):
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((self.cfg.host, self.cfg.port + b if self.cfg.port else 0))
            srv.listen(4)
            self._socks.append(srv)
            threading.Thread(
                target=self._accept_loop, args=(b,), daemon=True
            ).start()
        if self.verbose:
            print(f"multi-stream server: {self.B} streams on ports "
                  f"{[s.getsockname()[1] for s in self._socks]}", flush=True)

    @property
    def ports(self) -> List[int]:
        return [s.getsockname()[1] for s in self._socks]

    def _accept_loop(self, b: int) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._socks[b].accept()
            except OSError:
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._pending[b].put(conn)

    def _admit(self, b: int, recon: np.ndarray) -> None:
        while True:
            try:
                conn = self._pending[b].get_nowait()
            except queue.Empty:
                return
            try:
                if self._clients[b] is not None:
                    self._clients[b].close()  # latest client wins
                    # clear now: a failed handshake below must not leave
                    # the slot pointing at this closed socket (spurious
                    # encode + 'client dropped' on the next frame)
                    self._clients[b] = None
                if self.cfg.wire_format == "v2":
                    conn.sendall(wire.MAGIC_V2)
                elif self.cfg.wire_format == "v3":
                    conn.sendall(wire.MAGIC_V3)
                elif self.cfg.wire_format == "v4":
                    conn.sendall(wire.MAGIC_V4)
                conn.sendall(recon.tobytes())
                self._clients[b] = conn
                if self.verbose:
                    print(f"\nstream {b}: client joined", flush=True)
            except OSError:
                conn.close()

    def serve(self, max_frames: Optional[int] = None,
              wait_first_client: bool = True,
              resume_from: Optional[str] = None,
              checkpoint_to: Optional[str] = None) -> int:
        """``resume_from``: restart from a checkpointed per-stream
        reconstruction (the stream state is the previous-frame buffers,
        exactly as in the solo executor's checkpoint — beyond the
        reference, which has nothing to persist). ``checkpoint_to``:
        write that checkpoint when serving ends."""
        if not self._socks:
            self.listen()
        if resume_from:
            data = np.load(resume_from if resume_from.endswith(".npz")
                           else resume_from + ".npz")
            if tuple(data["geometry"]) != (self.B, self.cfg.height,
                                           self.cfg.width):
                raise ValueError("checkpoint geometry mismatch")
            bases = np.asarray(data["recon"], dtype=np.uint8)
        else:
            bases = np.stack([src.base_frame() for src in self.sources])
        state = self.pipe.init_state(bases)
        recon = bases.copy()  # per-stream host mirror for joiners
        if wait_first_client:
            while all(q.empty() for q in self._pending) and not self._stop.is_set():
                time.sleep(0.01)
        texts = [""] * self.B
        n = 0
        try:
            while max_frames is None or n < max_frames:
                for b in range(self.B):
                    self._admit(b, recon[b])
                try:
                    frames = np.stack([next(src) for src in self.sources])
                except StopIteration:
                    break
                t0 = time.perf_counter()
                payloads = None  # per-stream TiledPayload or flat (xs, vals)
                if not self._sharded and self.cfg.tiled_payload:
                    # single-chip fast path: one super-frame pallas_call
                    # (models.batched._fast_impl). Each stream's payload
                    # lands through the shared density-adaptive lander:
                    # blocks up to the last non-empty tile, or device merge
                    # + pos-prefix when the link/scene makes that cheaper
                    # (the full (B, tps, tile_bytes) buffers are worst-case
                    # sized — ~35 MB/stream/frame if fetched whole).
                    state, pos_d, counts_d, xs_t_d, vals_t_d, aux_d = self.pipe.step(
                        state, frames, texts
                    )
                    # ONE blocking fetch: pos is just the per-stream sum
                    # of counts (upcast first — tiled counts ship in the
                    # narrowest dtype); fetching pos_d separately would
                    # pay a second ~30 ms tunnel round-trip per frame
                    counts_np = np.asarray(counts_d)
                    pos = counts_np.astype(np.int64).sum(axis=1)
                    # one land_many call: every flat-path device merge
                    # dispatches before the single sync (B merges cost
                    # one round-trip of latency, not B)
                    payloads = self._lander.land_many([
                        (int(pos[b]), counts_np[b].astype(np.int32),
                         counts_d[b], xs_t_d[b], vals_t_d[b])
                        for b in range(self.B)
                    ])
                elif self._sharded:
                    # per-stream overlay text: the char ids shard along
                    # the data axis with the streams (parity with the
                    # batched single-chip path)
                    state, counts_d, xs_d, vals_d, aux_d = self.pipe.step(
                        state, frames, text=texts
                    )
                    counts_np = np.asarray(counts_d).astype(np.int32)
                    n_space = self.pipe.n_space
                    Ln = self.pipe.local_bytes
                    xs3 = xs_d.reshape(self.B, n_space, Ln)
                    vals3 = vals_d.reshape(self.B, n_space, Ln)
                    pos = counts_np.sum(axis=1)
                    payloads = self._lander.land_many([
                        (int(pos[b]), counts_np[b], counts_d[b],
                         xs3[b], vals3[b])
                        for b in range(self.B)
                    ])
                else:
                    state, pos_d, xs_d, vals_d, aux_d = self.pipe.step(
                        state, frames, texts
                    )
                    pos = np.asarray(pos_d)
                total = int(pos.sum())
                wire_total = 0
                for b in range(self.B):
                    p = int(pos[b])
                    pl = payloads[b] if payloads is not None else None
                    if isinstance(pl, wire.TiledPayload):
                        xs, vals = pl.to_flat()
                    elif pl is not None:
                        xs, vals = pl
                    else:
                        try:
                            xs = self._fetch_xs.fetch(xs_d[b], p)
                            vals = self._fetch_vals.fetch(vals_d[b], p)
                        except PayloadOverflowError:
                            if self.cfg.wire_format not in ("v3", "v4"):
                                raise  # no way to resync a v1/v2 client
                            # per-stream wire-v3 raw recovery: replace
                            # stream b's client state with its post-step
                            # prev slice from the flat batched state;
                            # the other streams' deltas are unaffected
                            nb = self.cfg.frame_bytes
                            recon[b] = np.asarray(
                                state[b * nb:(b + 1) * nb], dtype=np.uint8
                            )
                            conn = self._clients[b]
                            if conn is not None:
                                buf = bytes([wire.MODE_RAW]) + recon[b].tobytes()
                                wire_total += len(buf)
                                try:
                                    conn.sendall(buf)
                                except OSError:
                                    conn.close()
                                    self._clients[b] = None
                            continue
                    if p:
                        native.client_apply_np(recon[b], xs, vals)
                    conn = self._clients[b]
                    if conn is None:
                        continue
                    try:
                        if self.cfg.wire_format in ("v3", "v4"):
                            # recon[b] was updated above = post-apply
                            # client state, so raw mode is exact
                            enc = (wire.encode_frame_v4
                                   if self.cfg.wire_format == "v4"
                                   else wire.encode_frame_v3)
                            buf = enc(p, xs, vals, recon[b])
                            wire_total += len(buf)
                            conn.sendall(buf)
                        elif self.cfg.wire_format == "v2":
                            buf = wire.pack_payload_v2(p, xs, vals)
                            wire_total += len(buf)
                            conn.sendall(buf)
                        elif isinstance(pl, wire.TiledPayload):
                            wire_total += 4 + 5 * p
                            rc = native.wire_send_segments_fd(
                                conn.fileno(), p, pl.counts, pl.xs, pl.vals
                            )
                            if rc == -1:
                                conn.sendall(pl.to_wire_bytes())
                            elif rc < 0:
                                raise OSError(rc, "writev")
                        else:
                            wire_total += 4 + 5 * p
                            rc = native.wire_send_payload_fd(
                                conn.fileno(), p, xs, vals
                            )
                            if rc == -1:
                                conn.sendall(wire.pack_payload(p, xs, vals))
                            elif rc < 0:
                                raise OSError(rc, "writev")
                    except OSError:
                        conn.close()
                        self._clients[b] = None
                        if self.verbose:
                            print(f"\nstream {b}: client dropped", flush=True)
                if (self.aux_dir and aux_d is not None
                        and n % self.aux_every == 0):
                    from cudavideostream_tpu.runtime.client import write_ppm

                    aux_np = np.asarray(aux_d).reshape(self.B, -1)
                    for b in range(self.B):
                        write_ppm(
                            f"{self.aux_dir}/aux_{b}_{n:06d}.ppm",
                            aux_np[b], self.cfg.height, self.cfg.width,
                        )
                n += 1
                self.metrics.record(time.perf_counter() - t0, total,
                                    wire_bytes=wire_total)
                line = self.metrics.status_line()
                if line:
                    if self.overlay_status:
                        texts = [self.metrics.overlay_text()] * self.B
                    if self.verbose:
                        print(f"\r{line}  STREAMS: {self.B}", end="", flush=True)
        finally:
            # write the checkpoint even on Ctrl-C or a source/client
            # error — the documented stop-and-resume flow must not
            # depend on a clean --frames exit
            if checkpoint_to:
                np.savez(
                    checkpoint_to,
                    recon=recon,
                    geometry=np.array(
                        [self.B, self.cfg.height, self.cfg.width]
                    ),
                )
            self.close()
        return n

    def close(self) -> None:
        self._stop.set()
        for s in self._socks:
            s.close()
        for c in self._clients:
            if c is not None:
                c.close()


def main(argv=None) -> int:
    import argparse
    import sys

    from cudavideostream_tpu.runtime.sources import make_source

    p = argparse.ArgumentParser(description="multi-stream (B cameras) server")
    p.add_argument("--streams", type=int, default=2)
    p.add_argument("--source", default="synthetic",
                   choices=["synthetic", "file"])
    p.add_argument("--path", help="file source path (shared by streams)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=2734,
                   help="stream b listens on port+b")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--wire", default="v1",
                   choices=["v1", "v2", "v3", "v4"])
    p.add_argument("--visualizer", type=int, default=0,
                   help="0 none, 1 heatmap, 2 red-black, 3 red-overlap, "
                        "4 grayscale, 5 binarize (per stream; rides the "
                        "super-frame fast path)")
    p.add_argument("--noise-filter", action="store_true")
    p.add_argument("--conv-k", type=int, default=3)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--resume-from", default=None,
                   help="resume from a checkpointed per-stream state "
                        "(.npz written by --checkpoint-to)")
    p.add_argument("--checkpoint-to", default=None,
                   help="write the per-stream state when serving ends")
    p.add_argument("--mesh", default=None, metavar="D,S",
                   help="shard the B streams over a (data=D, space=S) "
                        "device mesh (B divisible by D; image rows shard "
                        "across S)")
    p.add_argument("--aux-dir", default=None,
                   help="dump per-stream visualizer aux frames here as "
                        "aux_<stream>_<frame>.ppm (the headless "
                        "SERVER_IMSHOW, per stream)")
    p.add_argument("--capacity", type=int, default=None,
                   help="per-stream payload capacity bound in bytes (see "
                        "server --help). Selects the flat batched payload "
                        "path (tiled/sharded layouts are always "
                        "worst-case); overflow is fatal under v1/v2, a "
                        "per-stream raw resync under --wire v3")
    args = p.parse_args(argv)
    from cudavideostream_tpu.utils.xla_cache import \
        maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    if args.capacity is not None and args.mesh:
        p.error("--capacity applies to the single-chip batched path only")
    # tiled payload = the product wire path AND the batched fast path
    # (one super-frame kernel; see models.batched) — unless a capacity
    # bound is requested, which only the flat payload layout supports
    from cudavideostream_tpu.config import Visualizer

    cfg = StreamConfig(height=args.height, width=args.width, host=args.host,
                       port=args.port, wire_format=args.wire,
                       visualizer=Visualizer(args.visualizer),
                       noise_filter=args.noise_filter, conv_k=args.conv_k,
                       tiled_payload=args.mesh is None
                       and args.capacity is None,
                       payload_capacity=args.capacity)
    sources = [
        make_source(args.source, cfg, path=args.path, seed=b)
        for b in range(args.streams)
    ]
    mesh = None
    if args.mesh:
        from cudavideostream_tpu.runtime.sharded_executor import make_mesh

        d, s = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(d, s)
    if args.aux_dir:
        import os as _os

        _os.makedirs(args.aux_dir, exist_ok=True)
    server = MultiStreamServer(cfg, sources, mesh=mesh,
                               aux_dir=args.aux_dir)
    n = server.serve(max_frames=args.frames,
                     resume_from=args.resume_from,
                     checkpoint_to=args.checkpoint_to)
    print(f"served {n} batched frames over {args.streams} streams",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
