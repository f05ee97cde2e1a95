"""The TCP wire format — the byte-exact compatibility contract.

Layout (little-endian host order, no framing, no checksum), exactly what
the reference server writes (``server/src/threads.cpp:224-231``) and the
reference client reads (``client/opencv.cpp:39-66``):

* On connect: the raw base frame, ``H*W*3`` bytes of BGR24.
* Per frame: ``[u32 pos][i32 xs[pos]][u8 vals[pos]]``.

The client applies ``frame[xs[i]] += vals[i]`` with uint8 wraparound and
is insensitive to payload order.
"""

from __future__ import annotations

import dataclasses
import socket
import struct
from typing import Tuple

import numpy as np

_U32 = struct.Struct("<I")


def pack_payload(pos: int, xs: np.ndarray, vals: np.ndarray) -> bytes:
    """Serialize one frame delta to wire bytes."""
    xs = np.ascontiguousarray(np.asarray(xs, dtype="<i4")[:pos])
    vals = np.ascontiguousarray(np.asarray(vals, dtype=np.uint8)[:pos])
    return _U32.pack(pos) + xs.tobytes() + vals.tobytes()


@dataclasses.dataclass
class TiledPayload:
    """One frame delta as the kernel's per-tile compacted blocks.

    Tile ``t`` holds ``counts[t]`` valid entries at ``xs[t, :counts[t]]``
    / ``vals[t, :counts[t]]``; global ascending order is tile order. The
    wire bytes are identical to the flat payload's — the concat happens
    in the sender's iovec list (``cvstpu.c:wire_send_segments``) instead
    of on the device, which is the whole point of this layout.

    ``xs``/``vals`` may hold fewer tiles than ``counts`` describes only
    if the extra counts are zero (executors drop all-empty tail tiles).
    """

    pos: int
    counts: np.ndarray  # (n_tiles,) int32
    xs: np.ndarray      # (n_tiles, tile_cap) int32
    vals: np.ndarray    # (n_tiles, tile_cap) uint8

    def to_flat(self) -> Tuple[np.ndarray, np.ndarray]:
        """Concatenate tile prefixes into flat (xs, vals) host arrays."""
        nz = [t for t in range(self.xs.shape[0]) if self.counts[t] > 0]
        if not nz:
            return (np.empty(0, np.int32), np.empty(0, np.uint8))
        xs = np.concatenate([self.xs[t, : self.counts[t]] for t in nz])
        vals = np.concatenate([self.vals[t, : self.counts[t]] for t in nz])
        return xs, vals

    def to_wire_bytes(self) -> bytes:
        """Python fallback for the native scatter-gather sender."""
        xs, vals = self.to_flat()
        return pack_payload(self.pos, xs, vals)


def unpack_payload(buf: bytes) -> Tuple[int, np.ndarray, np.ndarray, int]:
    """Parse one frame delta from ``buf``.

    Returns ``(pos, xs, vals, consumed_bytes)``; raises ``ValueError`` on a
    short buffer (streams should use :func:`read_payload` instead).
    """
    if len(buf) < 4:
        raise ValueError("short buffer: header")
    (pos,) = _U32.unpack_from(buf, 0)
    need = 4 + pos * 5
    if len(buf) < need:
        raise ValueError("short buffer: body")
    xs = np.frombuffer(buf, dtype="<i4", count=pos, offset=4).copy()
    vals = np.frombuffer(buf, dtype=np.uint8, count=pos, offset=4 + pos * 4).copy()
    return pos, xs, vals, need


def read_exact(sock: socket.socket, n: int) -> bytes:
    """Short-read-safe blocking read of exactly ``n`` bytes
    (the loop the reference client runs, ``client/opencv.cpp:40-42``)."""
    chunks = []
    got = 0
    while got < n:
        chunk = sock.recv(n - got)
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        chunks.append(chunk)
        got += len(chunk)
    return b"".join(chunks)


def read_payload(sock: socket.socket) -> Tuple[int, np.ndarray, np.ndarray]:
    """Blocking read of one frame delta from a socket."""
    (pos,) = _U32.unpack(read_exact(sock, 4))
    xs = np.frombuffer(read_exact(sock, pos * 4), dtype="<i4").copy()
    vals = np.frombuffer(read_exact(sock, pos), dtype=np.uint8).copy()
    return pos, xs, vals


def read_base_frame(sock: socket.socket, n_bytes: int) -> np.ndarray:
    return np.frombuffer(read_exact(sock, n_bytes), dtype=np.uint8).copy()
