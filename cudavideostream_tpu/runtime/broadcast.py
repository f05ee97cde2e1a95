"""Multi-client broadcast server.

The reference serves exactly one client, once — a disconnect kills the
process (``threads.cpp:211-218``, ``server.cpp:16-18``). The delta
stream, however, is inherently broadcastable: payloads are
client-agnostic, and the server's state buffer *is* every client's
reconstruction. So:

* payloads are computed once per frame and fanned out to all clients;
* a client joining mid-stream is admitted at a frame boundary and
  receives the *current reconstruction* as its base frame — no stream
  restart, no re-keyframing, perfectly synchronized from its first delta;
* dead/slow clients are dropped without disturbing the stream.

Fan-out is non-blocking: each client owns a bounded send queue drained
by its own writer thread, so a slow-but-alive client (full TCP buffers,
``sendall`` would block) cannot stall the pipeline or the other
clients. A client whose backlog exceeds :attr:`ClientSender.MAX_QUEUE`
frames is dropped with a logged reason. The wire bytes are packed ONCE
per frame and shared by every queue — with multiple clients this is
cheaper than the solo server's per-fd scatter-gather ``writev`` (which
would repack the iovec list per client and block per client).
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from typing import List, Optional

from cudavideostream_tpu import native
from cudavideostream_tpu.config import PayloadOverflowError, StreamConfig
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.executor import StreamExecutor
from cudavideostream_tpu.runtime.sources import FrameSource

import numpy as np


class ClientSender:
    """One client's bounded send queue + writer thread.

    ``offer`` never blocks: a full queue means the client has fallen
    ``MAX_QUEUE`` frames behind while its writer is stuck in
    ``sendall`` — that is the sustained-backlog drop condition.
    ``sent_bytes`` counts bytes actually written to the socket (not
    merely queued), so the server's wire-bandwidth stat stays honest.
    """

    MAX_QUEUE = 32  # frames of backlog before the client is dropped

    def __init__(self, conn: socket.socket, name: str = ""):
        self.conn = conn
        self.name = name
        self.q: "queue.Queue[Optional[bytes]]" = queue.Queue(
            maxsize=self.MAX_QUEUE
        )
        self.sent_bytes = 0
        self.dead = False
        self.drop_reason: Optional[str] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            buf = self.q.get()
            if buf is None or self.dead:
                # None = graceful finish (queue drained); dead = abort
                return
            try:
                self.conn.sendall(buf)
                self.sent_bytes += len(buf)
            except OSError as e:
                self.dead = True
                if self.drop_reason is None:
                    self.drop_reason = f"send failed ({e.__class__.__name__})"
                return

    def offer(self, buf: bytes) -> bool:
        """Queue one frame's bytes; False once the client is dead."""
        if self.dead:
            return False
        try:
            self.q.put_nowait(buf)
            return True
        except queue.Full:
            self.dead = True
            self.drop_reason = f"backlog exceeded {self.MAX_QUEUE} frames"
            return False

    def finish(self) -> None:
        """Ask the writer to exit AFTER draining everything queued.
        Unlike :meth:`close` this loses no frames: the sentinel rides
        the queue behind the remaining payloads. A queue too full to
        take the sentinel means a hopeless backlog — abort instead."""
        try:
            self.q.put_nowait(None)
        except queue.Full:
            self.dead = True

    def join(self, timeout: Optional[float] = None) -> None:
        self._thread.join(timeout)

    def close(self) -> None:
        self.dead = True
        try:
            self.q.put_nowait(None)  # wake the writer if it's idle
        except queue.Full:
            pass
        try:
            # closing the socket aborts a writer stuck in sendall
            self.conn.close()
        except OSError:
            pass


class BroadcastServer:
    def __init__(self, config: StreamConfig, source: FrameSource,
                 executor: Optional[StreamExecutor] = None,
                 verbose: bool = True, overlay_status: bool = True,
                 sndbuf: Optional[int] = None):
        self.cfg = config
        self.source = source
        self.executor = executor or StreamExecutor(config)
        self.verbose = verbose
        self.overlay_status = overlay_status
        # per-client kernel send-buffer bound (None = OS default); small
        # values make a stalled client hit the backlog drop sooner
        self.sndbuf = sndbuf
        self._pending: "queue.Queue[socket.socket]" = queue.Queue()
        self._clients: List[ClientSender] = []
        self._sock: Optional[socket.socket] = None
        self._stop = threading.Event()
        # wire accounting: bytes actually sent across all clients, with
        # removed clients' totals retired into _retired_sent
        self._retired_sent = 0
        self._sent_snapshot = 0
        self.drops: List[str] = []  # logged reasons, for observability
        self._v3enc: Optional[wire.V3Encoder] = None

    def listen(self) -> None:
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((self.cfg.host, self.cfg.port))
        srv.listen(32)
        self._sock = srv
        threading.Thread(target=self._accept_loop, daemon=True).start()
        if self.verbose:
            print(f"broadcast server on {self.cfg.host}:{self.cfg.port}", flush=True)

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    @property
    def n_clients(self) -> int:
        return len(self._clients)

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            if self.sndbuf is not None:
                conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, self.sndbuf)
            self._pending.put(conn)

    def _admit_pending(self, state_bytes: np.ndarray) -> None:
        """Admit joiners at a frame boundary with the current state as
        their base frame (shipped through their own send queue — a
        joiner that stalls on the base frame can't stall the stream)."""
        while True:
            try:
                conn = self._pending.get_nowait()
            except queue.Empty:
                return
            sender = ClientSender(conn)
            head = state_bytes.tobytes()
            if self.cfg.wire_format == "v2":
                head = wire.MAGIC_V2 + head
            elif self.cfg.wire_format == "v3":
                head = wire.MAGIC_V3 + head
            elif self.cfg.wire_format == "v4":
                head = wire.MAGIC_V4 + head
            sender.offer(head)
            self._clients.append(sender)
            if self.verbose:
                print(f"\nclient joined ({len(self._clients)} total)", flush=True)

    def _pack(self, pos: int, xs, vals) -> bytes:
        """One frame's wire bytes, shared by every client's queue."""
        if self.cfg.wire_format in ("v3", "v4"):
            # encode() also applies the payload to the shared shadow
            # (aliased to the joiner state in serve()) — exactly once
            return self._v3enc.encode(pos, xs, vals)
        if isinstance(xs, wire.MaskPayload):
            xs, vals = xs.to_flat()  # mask_payload config under v1/v2
        tiled = isinstance(xs, wire.TiledPayload)
        if self.cfg.wire_format == "v2":
            fx, fv = xs.to_flat() if tiled else (xs, vals)
            return wire.pack_payload_v2(pos, fx, fv)
        return xs.to_wire_bytes() if tiled else wire.pack_payload(pos, xs, vals)

    def _fanout(self, buf: bytes) -> None:
        for sender in self._clients:
            sender.offer(buf)
        self._reap()

    def _reap(self) -> None:
        dead = [s for s in self._clients if s.dead]
        for sender in dead:
            self._clients.remove(sender)
            self._retired_sent += sender.sent_bytes
            sender.close()
            self.drops.append(sender.drop_reason or "unknown")
            if self.verbose:
                print(f"\nclient dropped: {sender.drop_reason} "
                      f"({len(self._clients)} left)", flush=True)

    def _record_wire_bytes(self, pos: int) -> None:
        """Replace the executor's per-frame v1 wire estimate (4 + 5*pos,
        one client) with the bytes actually sent since the last frame —
        correct for v2 framing AND for 0/N-client fan-out, like
        ``server.py``'s post-send correction."""
        sent = self._retired_sent + sum(s.sent_bytes for s in self._clients)
        self.executor.metrics.wire_bytes += (
            sent - self._sent_snapshot - (4 + 5 * pos)
        )
        self._sent_snapshot = sent

    def serve(self, max_frames: Optional[int] = None,
              wait_first_client: bool = True) -> int:
        if self._sock is None:
            self.listen()
        base = self.executor.start(self.source.base_frame())
        # joiner reconstruction: a private buffer updated *in place* per
        # frame — O(pos) host work, not an O(frame) copy+scatter. In v3
        # mode the encoder's client-state shadow IS that buffer (encode()
        # applies each payload once; serve() must not re-apply).
        self._v3enc = (
            wire.V4Encoder(base) if self.cfg.wire_format == "v4"
            else wire.V3Encoder(base) if self.cfg.wire_format == "v3"
            else None
        )
        state = self._v3enc.frame if self._v3enc is not None else base.copy()
        if wait_first_client:
            while self._pending.empty() and not self._stop.is_set():
                time.sleep(0.01)
        try:
            n = self._serve_loop(state, max_frames)
        except BaseException:
            # fail-loud paths (v1/v2 capacity overflow, source errors)
            # must still release clients: an open listener + live writer
            # threads would leave every client blocked on recv() forever
            self.close(drain=False)
            raise
        self.close(drain=True)
        return n

    def _serve_loop(self, state: np.ndarray,
                    max_frames: Optional[int]) -> int:
        text = ""
        n = 0
        while max_frames is None or n < max_frames:
            self._admit_pending(state)
            try:
                frame = next(self.source)
            except StopIteration:
                break
            t0 = time.perf_counter()
            try:
                result = self.executor.process(frame, text=text)
            except PayloadOverflowError:
                if self._v3enc is None:
                    raise  # v1/v2 cannot resync a client — fail loudly
                # wire v3 recovery (as in server.py): one raw frame to
                # every client; resync() updates the encoder shadow in
                # place, so `state` (an alias of it) stays the joiner
                # base. Pending pipelined payloads are dropped with it.
                buf = self._v3enc.resync(self.executor.resync())
                self._fanout(buf)
                n += 1
                self.executor.metrics.record(time.perf_counter() - t0, 0)
                self._record_wire_bytes(0)
                continue
            n += 1
            if result is None:
                # pipelined/batched lag: the frame was processed (counts
                # toward max_frames like the solo server) but its payload
                # ships next iteration / at the batch boundary / flush
                continue
            # a batched executor lands a LIST of frames at once
            for pos, xs, vals, _ in (
                result if isinstance(result, list) else [result]
            ):
                # track reconstruction for future joiners (in-place
                # scatter); v3/v4's encoder does this itself inside _pack
                if self._v3enc is None:
                    if isinstance(xs, wire.MaskPayload):
                        xs, vals = xs.to_flat()  # mask_payload under v1/v2
                    if isinstance(xs, wire.TiledPayload):
                        fx, fv = xs.to_flat()
                        if fx.size:
                            native.client_apply_np(state, fx, fv)
                    elif np.asarray(xs).size:
                        native.client_apply_np(state, xs, vals)
                self._fanout(self._pack(pos, xs, vals))
                self._record_wire_bytes(pos)
            line = self.executor.metrics.status_line(time.perf_counter() - t0)
            if line:
                if self.overlay_status:
                    text = self.executor.metrics.overlay_text()
                if self.verbose:
                    print("\r" + line + f"  CLIENTS: {len(self._clients)}",
                          end="", flush=True)
        # drain a pipelined executor's one-frame lag (solo server parity:
        # without this, the last frame would be silently dropped), with
        # the same v3 overflow recovery as the loop
        # (the flushed payload belongs to a frame already counted above)
        try:
            tail = self.executor.flush()
        except PayloadOverflowError:
            if self._v3enc is None:
                raise
            tail = None
            self._fanout(self._v3enc.resync(self.executor.resync()))
        for pos, xs, vals, _ in (
            [] if tail is None else tail if isinstance(tail, list) else [tail]
        ):
            if self._v3enc is None:
                if isinstance(xs, wire.MaskPayload):
                    xs, vals = xs.to_flat()  # mask_payload under v1/v2
                if isinstance(xs, wire.TiledPayload):
                    fx, fv = xs.to_flat()
                    if fx.size:
                        native.client_apply_np(state, fx, fv)
                elif np.asarray(xs).size:
                    native.client_apply_np(state, xs, vals)
            self._fanout(self._pack(pos, xs, vals))
            self._record_wire_bytes(pos)
        return n

    def close(self, drain: bool = False) -> None:
        """Stop serving. ``drain=True`` (end-of-stream) lets every
        writer flush its queued frames before the sockets close — an
        abrupt close here would cut the last frames off live clients,
        which is exactly the stall-drop behavior reserved for clients
        that EARNED it. Stalled writers are aborted after a shared
        5 s deadline."""
        self._stop.set()
        if self._sock:
            self._sock.close()
        if drain:
            for c in self._clients:
                c.finish()
            deadline = time.monotonic() + 5.0
            for c in self._clients:
                c.join(timeout=max(0.0, deadline - time.monotonic()))
        for c in self._clients:
            c.close()
        self._clients.clear()


def main(argv=None) -> int:
    import argparse
    import sys

    from cudavideostream_tpu.runtime.sources import make_source

    p = argparse.ArgumentParser(description="multi-client broadcast server")
    p.add_argument("--source", default="synthetic", choices=["synthetic", "file", "v4l2"])
    p.add_argument("--path")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=2734)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--wire", default="v1",
                   choices=["v1", "v2", "v3", "v4"])
    p.add_argument("--tiled", action="store_true",
                   help="per-tile payload blocks + scatter-gather send "
                        "(skips the device merge epilogue)")
    p.add_argument("--fetch", default="auto",
                   choices=["auto", "tiles", "flat", "mask"],
                   help="tiled-payload landing strategy (see server --help)")
    p.add_argument("--land-batch", type=int, default=0, metavar="K",
                   help="depth-K batched landing (see server --help): K "
                        "frames share each host<->device round trip; all "
                        "clients lag up to K frames")
    p.add_argument("--sndbuf", type=int, default=None,
                   help="per-client SO_SNDBUF bytes (bounds kernel-side "
                        "buffering; a stalled client hits the backlog "
                        "drop sooner)")
    p.add_argument("--capacity", type=int, default=None,
                   help="payload capacity bound in bytes (see server "
                        "--help): overflow is fatal under v1/v2, one raw "
                        "resync frame to every client under --wire v3")
    p.add_argument("--link-cache", default=None, metavar="JSON",
                   help="persist the learned link/speculation state and "
                        "the compiled fetch-rung set across sessions "
                        "(see server --link-cache)")
    p.add_argument("--calibrate", type=int, default=2, metavar="N",
                   help="pre-serve link round trips (0 disables; see "
                        "server --calibrate)")
    args = p.parse_args(argv)
    from cudavideostream_tpu.utils.xla_cache import \
        maybe_enable_compilation_cache

    maybe_enable_compilation_cache()
    if args.fetch != "auto" and not args.tiled:
        p.error("--fetch tiles/flat/mask applies to --tiled payloads")
    if args.land_batch and not args.tiled:
        p.error("--land-batch requires --tiled payloads")
    if args.capacity is not None and args.tiled:
        p.error("--capacity applies to flat payloads only (tiled is "
                "always worst-case)")
    cfg = StreamConfig(height=args.height, width=args.width,
                       host=args.host, port=args.port, wire_format=args.wire,
                       tiled_payload=args.tiled, fetch_mode=args.fetch,
                       emit_bitmask=(args.fetch == "mask"),
                       mask_payload=(args.wire == "v4"
                                     and args.fetch == "mask"),
                       payload_capacity=args.capacity)
    executor = None
    if args.land_batch:
        from cudavideostream_tpu.runtime.executor import BatchedLandExecutor

        executor = BatchedLandExecutor(cfg, depth=args.land_batch)
    source = make_source(args.source, cfg, path=args.path)
    if args.link_cache or args.calibrate:
        # lander warm start + fetch-jit prewarm, exactly as in
        # server.main (the fan-out path lands through the same
        # TiledLander; a cold broadcast session pays the same mid-serve
        # rung compiles)
        if executor is None:
            executor = StreamExecutor(cfg)
        if args.link_cache and executor.load_link_cache(args.link_cache):
            print(f"link cache loaded from {args.link_cache}",
                  file=sys.stderr)
        if args.calibrate:
            executor.calibrate_link(rounds=args.calibrate)
        executor.start(source.base_frame())
        n = executor.prewarm_fetch()
        print(f"prewarmed {n} fetch jits", file=sys.stderr)
    server = BroadcastServer(cfg, source,
                             executor=executor, sndbuf=args.sndbuf)
    n = server.serve(max_frames=args.frames)
    if args.link_cache:
        executor.save_link_cache(args.link_cache)
        print(f"link cache saved to {args.link_cache}", file=sys.stderr)
    print(f"served {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
