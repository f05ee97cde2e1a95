"""Wire-format round-trip tests (the compatibility contract,
reference threads.cpp:224-231 / client/opencv.cpp:39-66)."""

import numpy as np
import pytest

from cudavideostream_tpu.runtime import wire


def test_roundtrip(rng):
    pos = 37
    xs = np.sort(rng.choice(10000, size=pos, replace=False)).astype(np.int32)
    vals = rng.integers(0, 255, pos, endpoint=True, dtype=np.uint8)
    buf = wire.pack_payload(pos, xs, vals)
    assert len(buf) == 4 + pos * 5
    p2, xs2, vals2, used = wire.unpack_payload(buf)
    assert used == len(buf)
    assert p2 == pos
    assert xs2.tolist() == xs.tolist()
    assert vals2.tolist() == vals.tolist()


def test_empty_payload():
    buf = wire.pack_payload(0, np.empty(0, np.int32), np.empty(0, np.uint8))
    assert buf == b"\x00\x00\x00\x00"
    p, xs, vals, used = wire.unpack_payload(buf)
    assert p == 0 and xs.size == 0 and vals.size == 0 and used == 4


def test_layout_is_little_endian_u32_i32_u8():
    buf = wire.pack_payload(1, np.array([258], np.int32), np.array([7], np.uint8))
    assert buf == b"\x01\x00\x00\x00" + b"\x02\x01\x00\x00" + b"\x07"


def test_pack_truncates_to_pos():
    xs = np.arange(10, dtype=np.int32)
    vals = np.arange(10, dtype=np.uint8)
    buf = wire.pack_payload(3, xs, vals)
    assert len(buf) == 4 + 15


def test_short_buffer_raises():
    with pytest.raises(ValueError):
        wire.unpack_payload(b"\x01\x00")
    with pytest.raises(ValueError):
        wire.unpack_payload(b"\x02\x00\x00\x00" + b"\x00" * 5)
