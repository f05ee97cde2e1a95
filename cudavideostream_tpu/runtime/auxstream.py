"""Live auxiliary/visualizer frame streaming — ``th_noise_hdl`` parity.

The reference dedicates a thread + pipe to DISPLAYING the visualizer
frame (heatmap / binarize / red noise / grayscale) in real time next to
the delta stream: ``writeNoise`` hands the aux frame to ``th_noise_hdl``
which ``imshow``s it (``/root/reference/server/src/threads.cpp:149-164``,
fed from ``server.cpp:143``). The rebuild is headless, so "display"
becomes a second serving surface: a raw TCP side-stream (this module)
that the client CLI and the ``--http`` live viewer can attach to.

Wire format (all little-endian, like the main wire):

* header: ``b"CVSX"`` + u32 height + u32 width
* per frame: u32 frame index + u32 payload length + payload
  (currently always ``h*w*3`` raw BGR24 — the length field keeps the
  frame boundary self-describing so compressed modes can slot in)

Deliberate divergence from the reference: its visualizer pipe BLOCKS
the main loop when the display falls behind (``threads.cpp:130-132``
``writeNoise`` is a blocking pipe write). A network viewer can stall
arbitrarily, so the sink is latest-frame-wins by default — a slow aux
client drops intermediate frames and never backpressures the delta
stream. Tests use ``drop=False`` for frame-exact assertions.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Optional

import numpy as np

MAGIC = b"CVSX"
_HDR = struct.Struct("<4sII")
_FRM = struct.Struct("<II")


class AuxStreamSink:
    """Serve aux frames to any number of attached viewers.

    One daemon accept thread; per-client daemon send threads each with a
    one-deep latest-wins mailbox (``drop=True``) or a blocking handoff
    (``drop=False``). ``push`` never raises on client failures — a dead
    viewer just detaches.
    """

    def __init__(self, height: int, width: int, host: str = "127.0.0.1",
                 port: int = 0, drop: bool = True):
        self.height = height
        self.width = width
        self.drop = drop
        self._clients: list["_AuxClientState"] = []
        self._lock = threading.Lock()
        self._closed = False
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind((host, port))
        srv.listen(8)
        self._sock = srv
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True)
        self._accept_thread.start()

    @property
    def port(self) -> int:
        return self._sock.getsockname()[1]

    def _accept_loop(self) -> None:
        while not self._closed:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            try:
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                conn.sendall(_HDR.pack(MAGIC, self.height, self.width))
            except OSError:
                conn.close()
                continue
            st = _AuxClientState(conn, self.drop)
            with self._lock:
                self._clients.append(st)

    def push(self, idx: int, aux: np.ndarray) -> None:
        """Offer one aux frame to every attached viewer."""
        if self._closed:
            return
        with self._lock:
            clients = list(self._clients)
            dead = [c for c in clients if c.dead]
            for c in dead:
                self._clients.remove(c)
        if not clients:
            return
        buf = np.ascontiguousarray(aux, dtype=np.uint8).tobytes()
        for c in clients:
            if not c.dead:
                c.offer(idx, buf)

    @property
    def n_clients(self) -> int:
        with self._lock:
            return sum(not c.dead for c in self._clients)

    def close(self) -> None:
        self._closed = True
        try:
            self._sock.close()
        except OSError:
            pass
        with self._lock:
            clients, self._clients = self._clients, []
        for c in clients:
            c.stop()


class _AuxClientState:
    def __init__(self, conn: socket.socket, drop: bool):
        self.conn = conn
        self.drop = drop
        self.dead = False
        self._cv = threading.Condition()
        self._pending: Optional[tuple] = None
        self._thread = threading.Thread(target=self._send_loop, daemon=True)
        self._thread.start()

    def offer(self, idx: int, buf: bytes) -> None:
        with self._cv:
            if self.drop:
                self._pending = (idx, buf)      # latest frame wins
            else:
                while self._pending is not None and not self.dead:
                    self._cv.wait(timeout=0.5)
                if self.dead:
                    return
                self._pending = (idx, buf)
            self._cv.notify_all()

    def _send_loop(self) -> None:
        while True:
            with self._cv:
                while self._pending is None and not self.dead:
                    self._cv.wait()
                if self.dead:
                    return
                idx, buf = self._pending
                self._pending = None
                self._cv.notify_all()
            try:
                self.conn.sendall(_FRM.pack(idx, len(buf)) + buf)
            except OSError:
                self.stop()
                return

    def stop(self) -> None:
        with self._cv:
            self.dead = True
            self._pending = None
            self._cv.notify_all()
        try:
            self.conn.close()
        except OSError:
            pass


class AuxStreamClient:
    """Attach to an :class:`AuxStreamSink` and read aux frames."""

    def __init__(self, host: str, port: int):
        self.host = host
        self.port = port
        self.sock: Optional[socket.socket] = None
        self.height = 0
        self.width = 0

    def connect(self) -> None:
        self.sock = socket.create_connection((self.host, self.port))
        hdr = self._read_exact(_HDR.size)
        magic, h, w = _HDR.unpack(hdr)
        if magic != MAGIC:
            raise ValueError(f"not an aux stream (magic {magic!r})")
        self.height, self.width = h, w

    def _read_exact(self, n: int) -> bytes:
        # short-read loop, like the reference client (opencv.cpp:40-42)
        chunks = []
        while n > 0:
            b = self.sock.recv(min(n, 1 << 16))
            if not b:
                raise ConnectionError("aux stream closed")
            chunks.append(b)
            n -= len(b)
        return b"".join(chunks)

    def read_frame(self) -> tuple:
        """Blocking read of the next aux frame: ``(idx, flat uint8)``."""
        idx, length = _FRM.unpack(self._read_exact(_FRM.size))
        buf = self._read_exact(length)
        return idx, np.frombuffer(buf, dtype=np.uint8)

    def close(self) -> None:
        if self.sock:
            self.sock.close()
            self.sock = None
