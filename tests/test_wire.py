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


def test_tiled_payload_wire_bytes_equal_flat():
    counts = np.array([2, 0, 3], np.int32)
    xs_t = np.zeros((3, 4), np.int32)
    vals_t = np.zeros((3, 4), np.uint8)
    xs_t[0, :2] = [5, 9]
    vals_t[0, :2] = [1, 2]
    xs_t[2, :3] = [100, 200, 300]
    vals_t[2, :3] = [3, 4, 5]
    tp = wire.TiledPayload(5, counts, xs_t, vals_t)
    fx, fv = tp.to_flat()
    np.testing.assert_array_equal(fx, [5, 9, 100, 200, 300])
    np.testing.assert_array_equal(fv, [1, 2, 3, 4, 5])
    assert tp.to_wire_bytes() == wire.pack_payload(5, fx, fv)


def test_tiled_payload_empty():
    tp = wire.TiledPayload(
        0, np.empty(0, np.int32), np.empty((0, 4), np.int32),
        np.empty((0, 4), np.uint8),
    )
    assert tp.to_wire_bytes() == b"\x00\x00\x00\x00"


def test_native_send_segments_matches_python(tmp_path):
    """The C scatter-gather sender writes the identical bytes through a
    real socketpair."""
    import socket

    from cudavideostream_tpu import native

    if native.load_native() is None:
        import pytest

        pytest.skip("native helper unavailable")
    counts = np.array([1, 0, 2], np.int32)
    xs_t = np.zeros((3, 4), np.int32)
    vals_t = np.zeros((3, 4), np.uint8)
    xs_t[0, 0] = 7
    vals_t[0, 0] = 9
    xs_t[2, :2] = [11, 12]
    vals_t[2, :2] = [13, 14]
    tp = wire.TiledPayload(3, counts, xs_t, vals_t)
    a, b = socket.socketpair()
    rc = native.wire_send_segments_fd(a.fileno(), 3, counts, xs_t, vals_t)
    a.close()
    assert rc == 0
    got = b.recv(1 << 16)
    b.close()
    assert got == tp.to_wire_bytes()


class TestWireV2:
    def test_gap_codec_roundtrip(self, rng):
        for trial in range(20):
            n = int(rng.integers(0, 400))
            xs = np.sort(rng.choice(1 << 24, size=n, replace=False)).astype(np.int32)
            vals = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
            buf = wire.pack_payload_v2(n, xs, vals)
            pos, xs2, vals2, used = wire.unpack_payload_v2(buf)
            assert pos == n and used == len(buf)
            np.testing.assert_array_equal(xs2, xs)
            np.testing.assert_array_equal(vals2, vals)

    def test_gap_codec_adversarial(self):
        # first index forces an escape; a 65534 gap does not; 65535 does
        xs = np.array([70000, 70001, 70001 + 65534, 70001 + 65534 + 65535],
                      np.int64)
        vals = np.array([1, 2, 3, 4], np.uint8)
        buf = wire.pack_payload_v2(4, xs, vals)
        pos, xs2, vals2, _ = wire.unpack_payload_v2(buf)
        np.testing.assert_array_equal(xs2, xs)
        # two escapes: the first index and the 65535 gap
        n_exc = np.frombuffer(buf, "<u4", 2)[1]
        assert n_exc == 2

    def test_v2_smaller_than_v1(self, rng):
        n = 1000
        xs = np.sort(rng.choice(200_000, size=n, replace=False)).astype(np.int32)
        vals = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        v1 = wire.pack_payload(n, xs, vals)
        v2 = wire.pack_payload_v2(n, xs, vals)
        assert len(v2) < 0.7 * len(v1)  # 3B+eps vs 5B per entry

    def test_empty_payload_v2(self):
        buf = wire.pack_payload_v2(0, np.empty(0, np.int32), np.empty(0, np.uint8))
        pos, xs, vals, used = wire.unpack_payload_v2(buf)
        assert pos == 0 and xs.size == 0 and used == 8
