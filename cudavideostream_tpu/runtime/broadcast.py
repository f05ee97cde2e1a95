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
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from typing import List, Optional

import numpy as np

from cudavideostream_tpu import native
from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.executor import StreamExecutor
from cudavideostream_tpu.runtime.sources import FrameSource


class BroadcastServer:
    def __init__(self, config: StreamConfig, source: FrameSource,
                 executor: Optional[StreamExecutor] = None,
                 verbose: bool = True, overlay_status: bool = True):
        self.cfg = config
        self.source = source
        self.executor = executor or StreamExecutor(config)
        self.verbose = verbose
        self.overlay_status = overlay_status
        self._pending: "queue.Queue[socket.socket]" = queue.Queue()
        self._clients: List[socket.socket] = []
        self._sock: Optional[socket.socket] = None
        self._stop = threading.Event()

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

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._pending.put(conn)

    def _admit_pending(self, state_bytes: np.ndarray) -> None:
        """Admit joiners at a frame boundary with the current state as
        their base frame."""
        while True:
            try:
                conn = self._pending.get_nowait()
            except queue.Empty:
                return
            try:
                if self.cfg.wire_format == "v2":
                    conn.sendall(wire.MAGIC_V2)
                conn.sendall(state_bytes.tobytes())
                self._clients.append(conn)
                if self.verbose:
                    print(f"\nclient joined ({len(self._clients)} total)", flush=True)
            except OSError:
                conn.close()

    def _fanout(self, pos: int, xs, vals) -> None:
        dead = []
        buf = None
        tiled = isinstance(xs, wire.TiledPayload)
        if self.cfg.wire_format == "v2":
            fx, fv = xs.to_flat() if tiled else (xs, vals)
            buf = wire.pack_payload_v2(pos, fx, fv)
            for conn in self._clients:
                try:
                    conn.sendall(buf)
                except OSError:
                    dead.append(conn)
            for conn in dead:
                self._clients.remove(conn)
                conn.close()
                if self.verbose:
                    print(f"\nclient dropped ({len(self._clients)} left)",
                          flush=True)
            return
        for conn in self._clients:
            if tiled:
                rc = native.wire_send_segments_fd(
                    conn.fileno(), pos, xs.counts, xs.xs, xs.vals
                )
            else:
                rc = native.wire_send_payload_fd(conn.fileno(), pos, xs, vals)
            if rc == -1:
                if buf is None:
                    buf = xs.to_wire_bytes() if tiled else wire.pack_payload(
                        pos, xs, vals
                    )
                try:
                    conn.sendall(buf)
                except OSError:
                    dead.append(conn)
            elif rc < 0:
                dead.append(conn)
        for conn in dead:
            self._clients.remove(conn)
            conn.close()
            if self.verbose:
                print(f"\nclient dropped ({len(self._clients)} left)", flush=True)

    def serve(self, max_frames: Optional[int] = None,
              wait_first_client: bool = True) -> int:
        if self._sock is None:
            self.listen()
        base = self.executor.start(self.source.base_frame())
        # joiner reconstruction: a private buffer updated *in place* per
        # frame — O(pos) host work, not an O(frame) copy+scatter
        state = base.copy()
        if wait_first_client:
            while self._pending.empty() and not self._stop.is_set():
                time.sleep(0.01)
        text = ""
        n = 0
        while max_frames is None or n < max_frames:
            self._admit_pending(state)
            try:
                frame = next(self.source)
            except StopIteration:
                break
            t0 = time.perf_counter()
            result = self.executor.process(frame, text=text)
            if result is None:
                continue
            pos, xs, vals, _ = result
            # track reconstruction for future joiners (in-place scatter)
            if isinstance(xs, wire.TiledPayload):
                fx, fv = xs.to_flat()
                if fx.size:
                    native.client_apply_np(state, fx, fv)
            elif np.asarray(xs).size:
                native.client_apply_np(state, xs, vals)
            self._fanout(pos, xs, vals)
            n += 1
            line = self.executor.metrics.status_line(time.perf_counter() - t0)
            if line:
                if self.overlay_status:
                    text = self.executor.metrics.overlay_text()
                if self.verbose:
                    print("\r" + line + f"  CLIENTS: {len(self._clients)}",
                          end="", flush=True)
        self.close()
        return n

    def close(self) -> None:
        self._stop.set()
        if self._sock:
            self._sock.close()
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
    p.add_argument("--tiled", action="store_true",
                   help="per-tile payload blocks + scatter-gather send "
                        "(skips the device merge epilogue)")
    p.add_argument("--fetch", default="auto", choices=["auto", "tiles", "flat"],
                   help="tiled-payload landing strategy (see server --help)")
    args = p.parse_args(argv)
    if args.fetch != "auto" and not args.tiled:
        p.error("--fetch tiles/flat applies to --tiled payloads")
    cfg = StreamConfig(height=args.height, width=args.width,
                       host=args.host, port=args.port,
                       tiled_payload=args.tiled, fetch_mode=args.fetch)
    server = BroadcastServer(cfg, make_source(args.source, cfg, path=args.path))
    n = server.serve(max_frames=args.frames)
    print(f"served {n} frames", file=sys.stderr)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
