"""Native helper library loader (ctypes; graceful Python fallback).

Build with ``python -m cudavideostream_tpu.native.build`` (done
automatically on first load when a compiler is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_build", "libcvstpu.so")  # outside module space
_SRC = os.path.join(_DIR, "csrc", "cvstpu.c")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build_library(verbose: bool = False) -> bool:
    """Compile the helper library; returns True on success."""
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        os.environ.get("CC", "cc"),
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _SO,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        if verbose:
            print(res.stderr)
        return False
    return True


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed); returns None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
    except OSError:
        # csrc/ absent (shipped .so without sources): use the .so as-is
        # if present — the contract is "None when unavailable", never an
        # exception out of the graceful-fallback callers
        stale = not os.path.exists(_SO)
    if stale:
        if not build_library():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    c = ctypes
    lib.wire_send_payload.argtypes = [
        c.c_int, c.c_uint32, c.POINTER(c.c_int32), c.POINTER(c.c_uint8)
    ]
    lib.wire_send_payload.restype = c.c_int
    lib.wire_send_segments.argtypes = [
        c.c_int, c.c_uint32, c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
        c.POINTER(c.c_int32), c.c_int, c.c_int,
    ]
    lib.wire_send_segments.restype = c.c_int
    lib.compact_bitmask.argtypes = [
        c.POINTER(c.c_uint8), c.POINTER(c.c_uint8), c.c_int64,
        c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
    ]
    lib.compact_bitmask.restype = c.c_int64
    lib.compact_update.argtypes = [
        c.POINTER(c.c_uint8), c.POINTER(c.c_uint8), c.POINTER(c.c_uint8),
        c.c_int64, c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
    ]
    lib.compact_update.restype = c.c_int64
    lib.client_apply.argtypes = [
        c.POINTER(c.c_uint8), c.POINTER(c.c_int32), c.POINTER(c.c_uint8), c.c_int64
    ]
    lib.client_apply.restype = None
    lib.client_decode.argtypes = [
        c.c_char_p, c.c_int, c.c_int64, c.c_int64,
        c.POINTER(c.c_uint8), c.POINTER(c.c_uint64),
    ]
    lib.client_decode.restype = c.c_int64
    lib.wire_encode_v3.argtypes = [
        c.POINTER(c.c_int32), c.c_int64, c.c_int64,
        c.POINTER(c.c_int32), c.POINTER(c.c_uint8),
        c.POINTER(c.c_uint8), c.c_int64, c.c_int,
        c.POINTER(c.c_uint8), c.c_int64,
    ]
    lib.wire_encode_v3.restype = c.c_int64
    lib.v4l2_open.argtypes = [c.c_char_p, c.c_int, c.c_int]
    lib.v4l2_open.restype = c.c_int
    lib.v4l2_grab.argtypes = [c.c_int, c.POINTER(c.c_uint8), c.c_int64]
    lib.v4l2_grab.restype = c.c_int
    lib.v4l2_close.argtypes = [c.c_int]
    lib.v4l2_close.restype = None
    _lib = lib
    return _lib


def compact_bitmask_np(delta, bitmask):
    """numpy wrapper over the C packer; falls back to numpy if unbuilt."""
    import numpy as np

    delta = np.ascontiguousarray(delta, dtype=np.uint8)
    bitmask = np.ascontiguousarray(bitmask, dtype=np.uint8)
    lib = load_native()
    if lib is None:
        bits = np.unpackbits(bitmask, bitorder="little")[: delta.size].astype(bool)
        xs = np.nonzero(bits)[0].astype(np.int32)
        return xs, delta[bits]
    xs = np.empty(delta.size, dtype=np.int32)
    vals = np.empty(delta.size, dtype=np.uint8)
    c = ctypes
    n = lib.compact_bitmask(
        delta.ctypes.data_as(c.POINTER(c.c_uint8)),
        bitmask.ctypes.data_as(c.POINTER(c.c_uint8)),
        delta.size,
        xs.ctypes.data_as(c.POINTER(c.c_int32)),
        vals.ctypes.data_as(c.POINTER(c.c_uint8)),
    )
    return xs[:n], vals[:n]


def compact_update_np(cur, prev, bitmask):
    """Host-source packer: ``vals = cur - prev`` (uint8 wrap) at masked
    bytes, ``prev`` updated in place to ``cur`` there (the negative-
    feedback state update). Returns ``(xs, vals)``. ``prev`` must be a
    writable contiguous uint8 array; falls back to numpy if unbuilt."""
    import numpy as np

    cur = np.ascontiguousarray(cur, dtype=np.uint8)
    # hard errors, not asserts: the C packer writes through a raw pointer
    # into prev, so a read-only page or a strided view would segfault or
    # silently corrupt (and asserts vanish under python -O)
    if prev.dtype != np.uint8 or not prev.flags.c_contiguous:
        raise ValueError("prev must be a contiguous uint8 array")
    if not prev.flags.writeable:
        raise ValueError("prev must be writable (it is updated in place)")
    bitmask = np.ascontiguousarray(bitmask, dtype=np.uint8)
    lib = load_native()
    if lib is None:
        bits = np.unpackbits(bitmask, bitorder="little")[: cur.size].astype(bool)
        xs = np.nonzero(bits)[0].astype(np.int32)
        vals = cur[xs] - prev[xs]
        prev[xs] = cur[xs]
        return xs, vals
    xs = np.empty(cur.size, dtype=np.int32)
    vals = np.empty(cur.size, dtype=np.uint8)
    c = ctypes
    n = lib.compact_update(
        cur.ctypes.data_as(c.POINTER(c.c_uint8)),
        prev.ctypes.data_as(c.POINTER(c.c_uint8)),
        bitmask.ctypes.data_as(c.POINTER(c.c_uint8)),
        cur.size,
        xs.ctypes.data_as(c.POINTER(c.c_int32)),
        vals.ctypes.data_as(c.POINTER(c.c_uint8)),
    )
    return xs[:n], vals[:n]


def encode_v3_np(counts, xs, vals, shadow, apply: bool):
    """Adaptive v3 frame encode in C over tiled payload blocks (a flat
    payload passes 1-D ``xs``/``vals`` and ``counts=[pos]``). Byte-
    identical to ``runtime.wire.encode_frame_v3``. Returns the wire
    bytes, or None when the native lib is unavailable (callers fall
    back to the numpy encoder). ``shadow`` is the client-state frame;
    with ``apply`` the payload is folded into it first (uint8 wrap-add
    — the V3Encoder contract), so it must be writable then."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return None
    # hard errors, not asserts: the C encoder reads/writes raw pointers
    if shadow.dtype != np.uint8 or not shadow.flags.c_contiguous:
        raise ValueError("shadow must be a contiguous uint8 array")
    if apply and not shadow.flags.writeable:
        raise ValueError("shadow must be writable when apply is set")
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    xs = np.ascontiguousarray(xs, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.uint8)
    if xs.ndim == 1:
        xs = xs.reshape(1, -1)
        vals = vals.reshape(1, -1)
    if xs.shape != vals.shape or counts.size != xs.shape[0]:
        raise ValueError("counts/xs/vals block shapes disagree")
    n_tiles, tile_cap = xs.shape
    pos = int(counts.sum())
    n = shadow.size
    # enough for the delta16 working area and any chosen mode
    cap = max(10 + 7 * pos, 1 + n)
    out = np.empty(cap, dtype=np.uint8)
    c = ctypes
    rc = lib.wire_encode_v3(
        counts.ctypes.data_as(c.POINTER(c.c_int32)),
        n_tiles, tile_cap,
        xs.ctypes.data_as(c.POINTER(c.c_int32)),
        vals.ctypes.data_as(c.POINTER(c.c_uint8)),
        shadow.ctypes.data_as(c.POINTER(c.c_uint8)),
        n, 1 if apply else 0,
        out.ctypes.data_as(c.POINTER(c.c_uint8)),
        cap,
    )
    if rc < 0:
        return None
    return out[:rc].tobytes()


def client_apply_np(frame, xs, vals) -> None:
    """In-place uint8 wrap-add scatter via C (numpy fallback)."""
    import numpy as np

    lib = load_native()
    if lib is None:
        frame[np.asarray(xs, dtype=np.int64)] += np.asarray(vals, dtype=np.uint8)
        return
    c = ctypes
    xs = np.ascontiguousarray(xs, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.uint8)
    lib.client_apply(
        frame.ctypes.data_as(c.POINTER(c.c_uint8)),
        xs.ctypes.data_as(c.POINTER(c.c_int32)),
        vals.ctypes.data_as(c.POINTER(c.c_uint8)),
        xs.size,
    )


def client_decode_np(host: str, port: int, n_bytes: int, max_frames: int):
    """Run the native C decode loop (the reference client's exact read
    protocol); returns ``(frames, final_frame, digest)``, or None if the
    native lib is unavailable. Raises ``ValueError`` on a corrupt or
    hostile stream (the C side validates every payload index and
    returns an error instead of scattering out of bounds)."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return None
    c = ctypes
    frame = np.zeros(n_bytes, dtype=np.uint8)
    digest = c.c_uint64(0)
    frames = lib.client_decode(
        host.encode(),
        port,
        n_bytes,
        max_frames,
        frame.ctypes.data_as(c.POINTER(c.c_uint8)),
        c.byref(digest),
    )
    if frames < 0:
        raise ValueError(f"native client_decode failed: {frames} "
                         "(corrupt stream or connection error)")
    return int(frames), frame, int(digest.value)


def wire_send_payload_fd(fd: int, pos: int, xs, vals) -> int:
    """Send a payload on a raw fd via one writev; -1 if lib missing."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return -1
    c = ctypes
    xs = np.ascontiguousarray(xs, dtype=np.int32)
    vals = np.ascontiguousarray(vals, dtype=np.uint8)
    return lib.wire_send_payload(
        fd,
        pos,
        xs.ctypes.data_as(c.POINTER(c.c_int32)),
        vals.ctypes.data_as(c.POINTER(c.c_uint8)),
    )


def wire_send_segments_fd(fd: int, pos: int, counts, xs_t, vals_t) -> int:
    """Scatter-gather send of a tiled payload (per-tile prefixes) on a
    raw fd; one writev assembles the flat wire bytes without any host
    repacking. -1 if lib missing."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return -1
    c = ctypes
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    xs_t = np.ascontiguousarray(xs_t, dtype=np.int32)
    vals_t = np.ascontiguousarray(vals_t, dtype=np.uint8)
    n_tiles, tile_cap = xs_t.shape
    return lib.wire_send_segments(
        fd,
        pos,
        xs_t.ctypes.data_as(c.POINTER(c.c_int32)),
        vals_t.ctypes.data_as(c.POINTER(c.c_uint8)),
        counts.ctypes.data_as(c.POINTER(c.c_int32)),
        n_tiles,
        tile_cap,
    )
