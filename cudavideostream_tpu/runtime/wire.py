"""The TCP wire formats.

**v1 (default) — the byte-exact compatibility contract.** Layout
(little-endian host order, no framing, no checksum), exactly what the
reference server writes (``server/src/threads.cpp:224-231``) and the
reference client reads (``client/opencv.cpp:39-66``):

* On connect: the raw base frame, ``H*W*3`` bytes of BGR24.
* Per frame: ``[u32 pos][i32 xs[pos]][u8 vals[pos]]``.

The client applies ``frame[xs[i]] += vals[i]`` with uint8 wraparound and
is insensitive to payload order.

**v2 "delta16" (opt-in, beyond the reference).** This framework's
payloads are *ascending*, so consecutive index gaps are small; shipping
u16 gaps instead of i32 absolutes cuts the dominant index stream from
4 to 2 bytes per entry (~40% of wire bandwidth). Layout:

* On connect: :data:`MAGIC_V2` (16 bytes), then the raw base frame.
* Per frame: ``[u32 pos][u32 n_exc][u16 gap[pos]][u32 exc[n_exc]]
  [u8 vals[pos]]`` where ``xs[i] = xs[i-1] + gap[i]`` (``xs[-1] = -1``)
  and a gap of ``0xFFFF`` means "take the next absolute index from the
  exception stream" (first index > 65534 or a sparse-frame jump).

Both ends must opt in (``--wire v2``); the reference client speaks v1
only, which stays the default. The recorded-session tooling and the
HTML viewer understand both (the magic prefix disambiguates files).
"""

from __future__ import annotations

import dataclasses
import socket
import struct
from typing import Tuple

import numpy as np

_U32 = struct.Struct("<I")
_2U32 = struct.Struct("<II")

# v2 stream prefix: 16 bytes, impossible to confuse with a v1 stream on
# an opted-in client (v1 clients never see it — the server only emits it
# in v2 mode)
MAGIC_V2 = b"CVSTPU-WIRE-V2\x00\x01"
_GAP_ESC = 0xFFFF


def pack_payload_v2(pos: int, xs: np.ndarray, vals: np.ndarray) -> bytes:
    """Serialize one frame delta as delta16 wire bytes (ascending xs)."""
    xs = np.asarray(xs, dtype=np.int64)[:pos]
    vals = np.ascontiguousarray(np.asarray(vals, dtype=np.uint8)[:pos])
    gaps = np.diff(xs, prepend=-1)
    esc = gaps >= _GAP_ESC
    g16 = np.where(esc, _GAP_ESC, gaps).astype("<u2")
    exc = xs[esc].astype("<u4")
    return (
        _2U32.pack(pos, int(exc.size))
        + g16.tobytes()
        + exc.tobytes()
        + vals.tobytes()
    )


def unpack_payload_v2(buf: bytes, offset: int = 0):
    """Parse one delta16 frame. Returns ``(pos, xs, vals, consumed)``."""
    if len(buf) - offset < 8:
        raise ValueError("short buffer: v2 header")
    pos, n_exc = _2U32.unpack_from(buf, offset)
    need = 8 + 2 * pos + 4 * n_exc + pos
    if len(buf) - offset < need:
        raise ValueError("short buffer: v2 body")
    o = offset + 8
    gaps = np.frombuffer(buf, dtype="<u2", count=pos, offset=o).astype(np.int64)
    o += 2 * pos
    exc = np.frombuffer(buf, dtype="<u4", count=n_exc, offset=o)
    o += 4 * n_exc
    vals = np.frombuffer(buf, dtype=np.uint8, count=pos, offset=o).copy()
    xs = decode_gaps(gaps, exc)
    return pos, xs, vals, need


def decode_gaps(gaps: np.ndarray, exc: np.ndarray) -> np.ndarray:
    """Reconstruct ascending xs from u16 gaps + absolute exceptions.

    An escape gap sets ``xs[i] = exc[k]`` outright; cumsum the non-escape
    gaps, then re-base the suffix at each escape (escape count is tiny —
    typically just the first index)."""
    g = np.asarray(gaps, dtype=np.int64).copy()
    idx = np.nonzero(g == _GAP_ESC)[0]
    g[idx] = 0
    xs = np.cumsum(g) - 1
    for k, i in enumerate(idx):
        xs[i:] += int(exc[k]) - xs[i]
    return xs.astype(np.int32)


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


def read_payload_v2(sock: socket.socket) -> Tuple[int, np.ndarray, np.ndarray]:
    """Blocking read of one delta16 frame from a socket."""
    pos, n_exc = _2U32.unpack(read_exact(sock, 8))
    gaps = np.frombuffer(read_exact(sock, 2 * pos), dtype="<u2")
    exc = np.frombuffer(read_exact(sock, 4 * n_exc), dtype="<u4")
    vals = np.frombuffer(read_exact(sock, pos), dtype=np.uint8).copy()
    return pos, decode_gaps(gaps, exc), vals


def read_base_frame(sock: socket.socket, n_bytes: int) -> np.ndarray:
    return np.frombuffer(read_exact(sock, n_bytes), dtype=np.uint8).copy()
