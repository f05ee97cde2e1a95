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

**v3 "adaptive" (opt-in, beyond the reference).** v1's cost is
``5*pos`` bytes — at high change density (scene cuts, camera pans,
lighting flips) that is up to 5x the *raw frame size* (~31 MB at
1080p), the same unbounded worst case the reference has. v3 caps the
worst case at ~one raw frame by picking, per frame, the cheapest of
three encodings (1-byte mode prefix each):

* mode 0 "delta16": the v2 body — wins on sparse frames;
* mode 1 "bitmask": ``[u32 pos][u8 bitmask[ceil(n/8)]][u8 vals[pos]]``
  — a per-byte changed-bit mask (LSB-first, the
  :func:`cudavideostream_tpu.ops.diff.pack_bitmask` layout) plus the
  wrap-delta values in ascending index order; wins past ~6% density
  (indices cost n/8 fixed instead of 2-4 bytes each);
* mode 2 "raw": the full reconstructed frame (the server's shadow of
  the client state) — wins past ~87% density.

Selection is exact (all three sizes are computed from ``pos``/gaps),
so v3 wire bytes per frame are ``min(delta16, bitmask, raw) <= n + 1``.
The server maintains a client-state shadow via the same wrap-add the
client runs (:class:`V3Encoder`), which keeps raw mode correct under
any executor, including pipelined ones whose payloads lag a frame.

**v4 "window bitmask" (opt-in, beyond the reference).** v3's three
modes plus one:

* mode 3 "winmask": ``[u32 pos][u32 byte_start][u32 win_bytes]
  [u8 bits[win_bytes/8]][u8 vals[pos]]`` — the change-bits for frame
  bytes ``[byte_start, byte_start + win_bytes)`` only (LSB-first;
  ``byte_start`` and ``win_bytes`` are multiples of 8 so the window is
  whole packed bytes), plus the wrap-delta values in ascending order.
  Wins on *locally dense* scenes (a moving subject): ~``pos/8`` index
  bytes where delta16 pays ``2*pos`` and the full bitmask pays ``n/8``.

v4 exists for the end-to-end zero-index path: the device kernel already
emits this exact packed-bits layout (``config.emit_bitmask``), the
"mask" payload landing fetches it as-is over the host<->device link,
and mode 3 forwards it to the client UNTRANSLATED — no index stream is
ever materialized on the server (the 2-7 ms/frame host rebuild measured
in benchmarks/loopback_tpu_tunnel r4). Selection is exact and v4 falls
back to the v3 modes whenever one is smaller, so v4 wire bytes are
``min(v3 modes, winmask)``.

Both ends must opt in (``--wire v2``/``v3``/``v4``); the reference
client speaks v1 only, which stays the default. The recorded-session
tooling and the HTML viewer understand all four (the magic prefix
disambiguates files).
"""

from __future__ import annotations

import dataclasses
import socket
import struct
from typing import Tuple

import numpy as np

_U32 = struct.Struct("<I")
_2U32 = struct.Struct("<II")
_3U32 = struct.Struct("<III")

# v2 stream prefix: 16 bytes, impossible to confuse with a v1 stream on
# an opted-in client (v1 clients never see it — the server only emits it
# in v2 mode)
MAGIC_V2 = b"CVSTPU-WIRE-V2\x00\x01"
MAGIC_V3 = b"CVSTPU-WIRE-V3\x00\x01"
MAGIC_V4 = b"CVSTPU-WIRE-V4\x00\x01"
_GAP_ESC = 0xFFFF

# v3 per-frame mode prefix (one byte); WINMASK appears in v4 streams only
MODE_DELTA16 = 0
MODE_BITMASK = 1
MODE_RAW = 2
MODE_WINMASK = 3

# per-byte-value LUTs for mask-payload encoding (LSB-first bit layout):
# set-bit count, lowest set bit, highest set bit (0-entries unused —
# consumers index with nonzero byte values only)
_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.int64)
_LOWBIT8 = np.array(
    [(v & -v).bit_length() - 1 if v else 0 for v in range(256)], np.int64
)
_HIGHBIT8 = np.array(
    [v.bit_length() - 1 if v else 0 for v in range(256)], np.int64
)


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


def pack_bitmask_from_xs(xs: np.ndarray, n_bytes: int) -> np.ndarray:
    """LSB-first changed-byte bitmask from ascending indices.

    Bit ``i % 8`` of byte ``i // 8`` is set iff ``i`` is in ``xs`` — the
    same layout :func:`cudavideostream_tpu.ops.diff.pack_bitmask` emits
    on device and ``cvstpu.c:compact_bitmask`` consumes on host.
    """
    bits = np.zeros(n_bytes, dtype=np.uint8)
    bits[np.asarray(xs, dtype=np.int64)] = 1
    return np.packbits(bits, bitorder="little")


def v3_sizes(pos: int, n_exc: int, n_bytes: int) -> Tuple[int, int, int]:
    """Exact per-mode wire bytes (mode prefix included) for one frame."""
    return (
        1 + 8 + 3 * pos + 4 * n_exc,          # delta16
        1 + 4 + (n_bytes + 7) // 8 + pos,     # bitmask
        1 + n_bytes,                          # raw
    )


class V3Encoder:
    """Per-connection adaptive encoder for the v3 wire.

    Maintains a shadow of the client's frame state by applying every
    payload with the client's own uint8 wrap-add, so mode 2 (raw) can
    ship the exact post-apply state regardless of which executor
    produced the payload (pipelined executors lag a frame; a device
    snapshot would be off by one). Payloads are never truncated —
    ``payload_capacity`` overflow raises
    :class:`cudavideostream_tpu.config.PayloadOverflowError` upstream
    (truncation would corrupt content in every wire mode: the dropped
    deltas are already folded into the server's prev, so the client —
    and this shadow with it — would track ``cur + error`` forever).
    """

    def __init__(self, base_frame: np.ndarray):
        self.frame = np.asarray(base_frame, dtype=np.uint8).ravel().copy()
        self.last_mode: int = MODE_DELTA16

    def encode(self, pos: int, xs, vals) -> bytes:
        """One frame -> ``[u8 mode][body]`` bytes, cheapest mode.

        The native C encoder (``cvstpu.c:wire_encode_v3``) does the
        shadow apply + gap encode in one pass straight off the tiled
        blocks — no flatten, no numpy passes; byte-identical output.
        Falls back to the numpy path when the lib is unbuilt."""
        from cudavideostream_tpu import native

        if isinstance(xs, MaskPayload):
            # v3 has no winmask mode: rebuild the index stream once
            # (config.py promises v1/v2/v3 senders fall back through
            # MaskPayload.to_flat(); only v4 forwards bits untranslated)
            pos = xs.pos
            xs, vals = xs.to_flat()
        if isinstance(xs, TiledPayload):
            buf = native.encode_v3_np(
                xs.counts, xs.xs, xs.vals, self.frame, apply=True
            )
            if buf is not None:
                self.last_mode = buf[0]
                return buf
            xs, vals = xs.to_flat()
        xs = np.asarray(xs, dtype=np.int64)[:pos]
        vals = np.asarray(vals, dtype=np.uint8)[:pos]
        buf = native.encode_v3_np(
            np.array([pos], np.int32), xs, vals, self.frame, apply=True
        )
        if buf is not None:
            self.last_mode = buf[0]
            return buf
        if pos:
            self.frame[xs] = self.frame[xs] + vals  # uint8 wrap-add
        buf = encode_frame_v3(pos, xs, vals, self.frame)
        self.last_mode = buf[0]
        return buf

    def resync(self, frame: np.ndarray) -> bytes:
        """Forced raw frame (payload-capacity overflow recovery).

        Replaces the shadow wholesale with the server's post-step state
        and returns the mode-2 bytes — the only consistent way to keep a
        client whose pending deltas were already folded into the
        server's prev (see ``config.PayloadOverflowError``).
        """
        np.copyto(self.frame, np.asarray(frame, dtype=np.uint8).ravel())
        self.last_mode = MODE_RAW
        return bytes([MODE_RAW]) + self.frame.tobytes()


def encode_frame_v3(pos: int, xs: np.ndarray, vals: np.ndarray,
                    frame_after: np.ndarray) -> bytes:
    """Stateless v3 frame encode (cheapest of the three modes).

    ``frame_after`` is the client state *after* applying this payload —
    callers that already maintain a reconstruction buffer (broadcast
    joiner state, multiserve per-stream recon) pass it directly; others
    use :class:`V3Encoder`, which maintains one.
    """
    from cudavideostream_tpu import native

    xs = np.asarray(xs, dtype=np.int64)[:pos]
    vals = np.asarray(vals, dtype=np.uint8)[:pos]
    if (
        isinstance(frame_after, np.ndarray)
        and frame_after.dtype == np.uint8
        and frame_after.flags.c_contiguous
    ):
        buf = native.encode_v3_np(
            np.array([pos], np.int32), xs, vals, frame_after, apply=False
        )
        if buf is not None:
            return buf
    return encode_frame_v3_numpy(pos, xs, vals, frame_after)


def encode_frame_v3_numpy(pos: int, xs: np.ndarray, vals: np.ndarray,
                          frame_after: np.ndarray) -> bytes:
    """The pure-numpy v3 encode — the byte-layout SPEC the native
    encoder must match exactly (tests/test_native.py pins the identity
    across mode crossovers, escapes, and ties)."""
    n = frame_after.size
    xs = np.asarray(xs, dtype=np.int64)[:pos]
    vals = np.asarray(vals, dtype=np.uint8)[:pos]
    n_exc = int(np.count_nonzero(np.diff(xs, prepend=-1) >= _GAP_ESC))
    size_d, size_b, size_r = v3_sizes(pos, n_exc, n)
    if size_d <= size_b and size_d <= size_r:
        return bytes([MODE_DELTA16]) + pack_payload_v2(pos, xs, vals)
    if size_b <= size_r:
        mask = pack_bitmask_from_xs(xs, n)
        return (
            bytes([MODE_BITMASK])
            + _U32.pack(pos)
            + mask.tobytes()
            + vals.tobytes()
        )
    return bytes([MODE_RAW]) + np.ascontiguousarray(
        frame_after, dtype=np.uint8
    ).tobytes()


def winmask_window(xs: np.ndarray) -> Tuple[int, int]:
    """The minimal 8-aligned ``(byte_start, win_bytes)`` window covering
    ascending indices ``xs`` (``(0, 0)`` when empty). Both values are
    multiples of 8 so the window is whole packed-bitmask bytes."""
    if len(xs) == 0:
        return 0, 0
    start = (int(xs[0]) // 8) * 8
    end = (int(xs[-1]) // 8 + 1) * 8
    return start, end - start


def winmask_size(pos: int, win_bytes: int) -> int:
    """Exact mode-3 wire bytes: mode + 3xu32 header + bits + vals."""
    return 13 + win_bytes // 8 + pos


def encode_frame_v4_numpy(pos: int, xs: np.ndarray, vals: np.ndarray,
                          frame_after: np.ndarray) -> bytes:
    """The pure-numpy v4 encode — the byte-layout SPEC.

    Per-frame cheapest of the three v3 modes plus mode 3 "winmask"; exact
    sizes, deterministic tie order delta16 > winmask > bitmask > raw
    (first listed wins ties). The zero-index fast path
    (:meth:`V4Encoder.encode` on a :class:`MaskPayload`) must produce
    byte-identical output: its trimmed window equals this function's
    minimal 8-aligned window by construction."""
    n = frame_after.size
    xs = np.asarray(xs, dtype=np.int64)[:pos]
    vals = np.asarray(vals, dtype=np.uint8)[:pos]
    n_exc = int(np.count_nonzero(np.diff(xs, prepend=-1) >= _GAP_ESC))
    start, wb = winmask_window(xs)
    size_d, size_b, size_r = v3_sizes(pos, n_exc, n)
    size_w = winmask_size(pos, wb)
    if size_d <= size_w and size_d <= size_b and size_d <= size_r:
        return bytes([MODE_DELTA16]) + pack_payload_v2(pos, xs, vals)
    if size_w <= size_b and size_w <= size_r:
        window = np.zeros(wb, dtype=np.uint8)
        window[xs - start] = 1
        bits = np.packbits(window, bitorder="little")
        return (
            bytes([MODE_WINMASK])
            + _3U32.pack(pos, start, wb)
            + bits.tobytes()
            + vals.tobytes()
        )
    if size_b <= size_r:
        mask = pack_bitmask_from_xs(xs, n)
        return (
            bytes([MODE_BITMASK])
            + _U32.pack(pos)
            + mask.tobytes()
            + vals.tobytes()
        )
    return bytes([MODE_RAW]) + np.ascontiguousarray(
        frame_after, dtype=np.uint8
    ).tobytes()


# stateless v4 encode, peer of encode_frame_v3 (no native fast path: the
# performance-sensitive v4 path is the zero-index MaskPayload forward in
# V4Encoder, which never touches an index stream at all)
encode_frame_v4 = encode_frame_v4_numpy


@dataclasses.dataclass
class MaskPayload:
    """One frame delta as the device's packed change-bits window plus
    the merged ascending values — the zero-index landing result
    (``TiledLander`` with ``return_mask``; ``config.mask_payload``).

    ``bits`` is LSB-first (the :func:`~cudavideostream_tpu.ops.diff.
    pack_bitmask` layout): bit ``k`` of ``bits[j]`` covers frame byte
    ``start_byte + 8*j + k``. ``start_byte`` is a multiple of 8. The
    window may carry zero margin bytes on either side (the landing's
    speculative window); encoders trim it. ``vals`` holds at least
    ``pos`` entries; only ``vals[:pos]`` are payload.
    """

    pos: int
    start_byte: int
    bits: np.ndarray  # (win_bytes/8,) uint8
    vals: np.ndarray  # (>= pos,) uint8

    def to_flat(self) -> Tuple[np.ndarray, np.ndarray]:
        """Rebuild flat ``(xs, vals)`` host arrays (the slow path v4
        exists to skip — v1/v2/v3 senders and library users only)."""
        xs = decode_bitmask(
            np.asarray(self.bits, np.uint8), 8 * len(self.bits)
        ) + np.int32(self.start_byte)
        if xs.size != self.pos:
            raise ValueError(
                f"mask payload popcount {xs.size} != pos {self.pos}"
            )
        return xs, np.asarray(self.vals, np.uint8)[: self.pos]


class V4Encoder(V3Encoder):
    """Per-connection adaptive encoder for the v4 wire.

    v3's shadow machinery plus mode 3, with the zero-index fast path:
    a :class:`MaskPayload` whose winmask encoding wins is trimmed and
    forwarded UNTRANSLATED — no index stream is ever materialized, and
    the shadow applies through the bits directly (boolean-mask wrap-add
    over the window slice, ascending order by construction)."""

    def encode(self, pos: int, xs, vals) -> bytes:
        if isinstance(xs, MaskPayload):
            return self._encode_mask(xs)
        if isinstance(xs, TiledPayload):
            xs, vals = xs.to_flat()
        xs = np.asarray(xs, dtype=np.int64)[:pos]
        vals = np.asarray(vals, dtype=np.uint8)[:pos]
        if pos:
            self.frame[xs] = self.frame[xs] + vals  # uint8 wrap-add
        buf = encode_frame_v4_numpy(pos, xs, vals, self.frame)
        self.last_mode = buf[0]
        return buf

    def _encode_mask(self, mp: MaskPayload) -> bytes:
        bits = np.asarray(mp.bits, np.uint8)
        nzb = np.flatnonzero(bits)
        if nzb.size == 0:
            if mp.pos:
                raise RuntimeError(
                    f"mask payload window is empty but pos={mp.pos} "
                    "(the landing window missed changed units)"
                )
            buf = bytes([MODE_DELTA16]) + pack_payload_v2(
                0, np.empty(0, np.int64), np.empty(0, np.uint8)
            )
            self.last_mode = MODE_DELTA16
            return buf
        pos = mp.pos
        nzv = bits[nzb]
        total = int(_POPCNT8[nzv].sum())
        if total != pos:
            raise RuntimeError(
                f"mask payload popcount {total} != device pos {pos} "
                "(invariant violation, never truncate)"
            )
        vals = np.asarray(mp.vals, np.uint8)[:pos]
        b0, b1 = int(nzb[0]), int(nzb[-1]) + 1
        start = mp.start_byte + 8 * b0
        wb = 8 * (b1 - b0)
        n = self.frame.size
        # exact delta16 size without materializing xs: escape gaps can
        # only occur across byte-level zero runs (within one byte a gap
        # is <= 7), so the per-byte extreme-bit LUTs give every
        # candidate gap exactly
        glo = mp.start_byte + 8 * nzb + _LOWBIT8[nzv]
        ghi = mp.start_byte + 8 * nzb + _HIGHBIT8[nzv]
        n_exc = int(glo[0] + 1 >= _GAP_ESC) + int(
            np.count_nonzero(glo[1:] - ghi[:-1] >= _GAP_ESC)
        )
        size_d, size_b, size_r = v3_sizes(pos, n_exc, n)
        size_w = winmask_size(pos, wb)
        if size_w < size_d and size_w <= size_b and size_w <= size_r:
            bw = bits[b0:b1]
            seg = self.frame[start: start + wb]
            m = np.unpackbits(bw, bitorder="little")[: seg.size].view(bool)
            seg[m] = seg[m] + vals  # uint8 wrap-add, ascending order
            self.last_mode = MODE_WINMASK
            return (
                bytes([MODE_WINMASK])
                + _3U32.pack(pos, start, wb)
                + bw.tobytes()
                + vals.tobytes()
            )
        # a v3 mode is at least as small (or delta16 ties): rebuild the
        # indices once and take the generic path — same sizes, same tie
        # order, so the output equals the SPEC's
        xs, vals = mp.to_flat()
        return self.encode(pos, xs, vals)


def unpack_frame_v3(buf: bytes, offset: int, n_bytes: int):
    """Parse one v3/v4 frame from a buffer.

    Returns ``(pos, xs, vals, raw, consumed)`` — ``raw`` is the full
    replacement frame for mode 2 (``xs``/``vals`` empty), else None.
    Mode 3 (winmask) appears in v4 streams only; its window bits are
    rebuilt into global ``xs`` here.
    """
    if len(buf) - offset < 1:
        raise ValueError("short buffer: v3 mode byte")
    mode = buf[offset]
    o = offset + 1
    if mode == MODE_DELTA16:
        pos, xs, vals, used = unpack_payload_v2(buf, o)
        return pos, xs, vals, None, 1 + used
    if mode == MODE_BITMASK:
        mb = (n_bytes + 7) // 8
        if len(buf) - o < 4:
            raise ValueError("short buffer: v3 bitmask header")
        (pos,) = _U32.unpack_from(buf, o)
        need = 4 + mb + pos
        if len(buf) - o < need:
            raise ValueError("short buffer: v3 bitmask body")
        mask = np.frombuffer(buf, dtype=np.uint8, count=mb, offset=o + 4)
        vals = np.frombuffer(
            buf, dtype=np.uint8, count=pos, offset=o + 4 + mb
        ).copy()
        xs = decode_bitmask(mask, n_bytes)
        if xs.size != pos:
            raise ValueError(f"v3 bitmask popcount {xs.size} != pos {pos}")
        return pos, xs, vals, None, 1 + need
    if mode == MODE_RAW:
        if len(buf) - o < n_bytes:
            raise ValueError("short buffer: v3 raw body")
        raw = np.frombuffer(buf, dtype=np.uint8, count=n_bytes, offset=o).copy()
        return n_bytes, None, None, raw, 1 + n_bytes
    if mode == MODE_WINMASK:
        if len(buf) - o < 12:
            raise ValueError("short buffer: v4 winmask header")
        pos, start, wb = _3U32.unpack_from(buf, o)
        mb = wb // 8
        need = 12 + mb + pos
        if len(buf) - o < need:
            raise ValueError("short buffer: v4 winmask body")
        bits = np.frombuffer(buf, dtype=np.uint8, count=mb, offset=o + 12)
        vals = np.frombuffer(
            buf, dtype=np.uint8, count=pos, offset=o + 12 + mb
        ).copy()
        xs = decode_bitmask(bits, wb) + np.int32(start)
        if xs.size != pos:
            raise ValueError(f"v4 winmask popcount {xs.size} != pos {pos}")
        return pos, xs, vals, None, 1 + need
    raise ValueError(f"unknown v3 mode {mode}")


def decode_bitmask(mask: np.ndarray, n_bytes: int) -> np.ndarray:
    """Ascending changed indices from an LSB-first bitmask."""
    bits = np.unpackbits(np.asarray(mask, dtype=np.uint8), bitorder="little")
    return np.nonzero(bits[:n_bytes])[0].astype(np.int32)


def _reader(src):
    """Normalize a frame-read source: a socket, or a ``read(n)->bytes``
    callable (the client passes its recording tee) — so the wire layout
    lives HERE once, not re-implemented per consumer."""
    return src if callable(src) else (lambda n: read_exact(src, n))


def read_frame_v3(src, n_bytes: int):
    """Blocking read of one v3 frame: ``(pos, xs, vals, raw)``.

    ``src``: socket or ``read(n)`` callable (see :func:`_reader`)."""
    rd = _reader(src)
    mode = rd(1)[0]
    if mode == MODE_DELTA16:
        pos, xs, vals = read_payload_v2(rd)
        return pos, xs, vals, None
    if mode == MODE_BITMASK:
        (pos,) = _U32.unpack(rd(4))
        mask = np.frombuffer(rd((n_bytes + 7) // 8), dtype=np.uint8)
        vals = np.frombuffer(rd(pos), dtype=np.uint8).copy()
        xs = decode_bitmask(mask, n_bytes)
        if xs.size != pos:
            raise ValueError(f"v3 bitmask popcount {xs.size} != pos {pos}")
        return pos, xs, vals, None
    if mode == MODE_RAW:
        raw = np.frombuffer(rd(n_bytes), dtype=np.uint8).copy()
        return n_bytes, None, None, raw
    if mode == MODE_WINMASK:
        pos, start, wb = _3U32.unpack(rd(12))
        bits = np.frombuffer(rd(wb // 8), dtype=np.uint8)
        vals = np.frombuffer(rd(pos), dtype=np.uint8).copy()
        xs = decode_bitmask(bits, wb) + np.int32(start)
        if xs.size != pos:
            raise ValueError(f"v4 winmask popcount {xs.size} != pos {pos}")
        return pos, xs, vals, None
    raise ValueError(f"unknown v3 mode {mode}")


def v3_frame_extent(data, off: int, n_bytes: int) -> int:
    """End offset of the v3 frame whose mode byte is ``data[off]``.

    Size-only scan over an in-memory capture (bytes or mmap) — the one
    place the v3 frame layout is *measured*; the replayer's framing
    pre-scan uses this. Raises ``ValueError`` on a truncated frame or
    unknown mode."""
    if off + 1 > len(data):
        raise ValueError("truncated v3 frame: mode byte")
    mode = data[off]
    if mode == MODE_RAW:
        end = off + 1 + n_bytes
    elif mode == MODE_BITMASK:
        if off + 5 > len(data):
            raise ValueError("truncated v3 frame: bitmask header")
        (pos,) = _U32.unpack_from(data, off + 1)
        end = off + 1 + 4 + (n_bytes + 7) // 8 + pos
    elif mode == MODE_DELTA16:
        if off + 9 > len(data):
            raise ValueError("truncated v3 frame: delta16 header")
        pos, n_exc = _2U32.unpack_from(data, off + 1)
        end = off + 1 + 8 + 3 * pos + 4 * n_exc
    elif mode == MODE_WINMASK:
        if off + 13 > len(data):
            raise ValueError("truncated v4 frame: winmask header")
        pos, _start, wb = _3U32.unpack_from(data, off + 1)
        end = off + 13 + wb // 8 + pos
    else:
        raise ValueError(f"unknown v3 mode {mode} at offset {off}")
    if end > len(data):
        raise ValueError("truncated v3 frame: body")
    return end


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


def read_payload(src) -> Tuple[int, np.ndarray, np.ndarray]:
    """Blocking read of one frame delta (socket or ``read(n)``)."""
    rd = _reader(src)
    (pos,) = _U32.unpack(rd(4))
    xs = np.frombuffer(rd(pos * 4), dtype="<i4").copy()
    vals = np.frombuffer(rd(pos), dtype=np.uint8).copy()
    return pos, xs, vals


def read_payload_v2(src) -> Tuple[int, np.ndarray, np.ndarray]:
    """Blocking read of one delta16 frame (socket or ``read(n)``)."""
    rd = _reader(src)
    pos, n_exc = _2U32.unpack(rd(8))
    gaps = np.frombuffer(rd(2 * pos), dtype="<u2")
    exc = np.frombuffer(rd(4 * n_exc), dtype="<u4")
    vals = np.frombuffer(rd(pos), dtype=np.uint8).copy()
    return pos, decode_gaps(gaps, exc), vals


def read_base_frame(src, n_bytes: int) -> np.ndarray:
    return np.frombuffer(_reader(src)(n_bytes), dtype=np.uint8).copy()
