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


class TestWireV3:
    """Adaptive wire: per-frame cheapest of delta16/bitmask/raw, worst
    case capped at ~one raw frame (v1's worst case is 5x the frame)."""

    def _roundtrip(self, enc_buf, n_bytes, shadow_before):
        """Decode one encoded frame and apply it like the client would."""
        pos, xs, vals, raw, used = wire.unpack_frame_v3(enc_buf, 0, n_bytes)
        assert used == len(enc_buf)
        frame = shadow_before.copy()
        if raw is not None:
            frame = raw.copy()
        elif pos:
            frame[xs] = frame[xs] + vals  # uint8 wrap-add
        return frame, enc_buf[0]

    def test_mode_selection_and_reconstruction(self, rng):
        n = 9216
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        enc = wire.V3Encoder(base)
        client = base.copy()
        # (changed fraction, expected mode)
        plans = [
            (0.01, wire.MODE_DELTA16),
            (0.25, wire.MODE_BITMASK),
            (1.00, wire.MODE_RAW),
            (0.00, wire.MODE_DELTA16),  # static frame: 9-byte header
        ]
        for frac, want_mode in plans:
            k = int(n * frac)
            xs = np.sort(rng.choice(n, size=k, replace=False)).astype(np.int32)
            vals = rng.integers(1, 255, k, endpoint=True, dtype=np.uint8)
            expect = enc.frame.copy()
            expect[xs] = expect[xs] + vals
            buf = enc.encode(k, xs, vals)
            assert buf[0] == want_mode == enc.last_mode
            client, mode = self._roundtrip(buf, n, client)
            np.testing.assert_array_equal(client, expect)
            np.testing.assert_array_equal(enc.frame, expect)
            # selection is exact: the emitted size is the min of the three
            n_exc = int(np.count_nonzero(np.diff(xs, prepend=-1) >= 0xFFFF))
            assert len(buf) == min(wire.v3_sizes(k, n_exc, n))
            assert len(buf) <= n + 1  # the cap

    def test_bitmask_layout_matches_device_packer(self, rng):
        """The wire bitmask uses the same LSB-first layout as the device
        op (ops.diff.pack_bitmask) and the C packer consumes."""
        import jax.numpy as jnp

        from cudavideostream_tpu.ops import diff

        n = 2048
        mask = rng.random(n) < 0.3
        xs = np.nonzero(mask)[0]
        host = wire.pack_bitmask_from_xs(xs, n)
        dev = np.asarray(diff.pack_bitmask(jnp.asarray(mask)))
        np.testing.assert_array_equal(host, dev)
        np.testing.assert_array_equal(wire.decode_bitmask(host, n), xs)

    def test_tiled_payload_accepted(self, rng):
        n = 4096
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        k = 64
        xs = np.sort(rng.choice(n, size=k, replace=False)).astype(np.int32)
        vals = rng.integers(1, 255, k, endpoint=True, dtype=np.uint8)
        counts = np.array([40, 24], np.int32)
        xs_t = np.zeros((2, 40), np.int32)
        vals_t = np.zeros((2, 40), np.uint8)
        xs_t[0, :40], xs_t[1, :24] = xs[:40], xs[40:]
        vals_t[0, :40], vals_t[1, :24] = vals[:40], vals[40:]
        tp = wire.TiledPayload(k, counts, xs_t, vals_t)
        flat = wire.V3Encoder(base).encode(k, xs, vals)
        tiled = wire.V3Encoder(base).encode(k, tp, None)
        assert flat == tiled

    def test_mask_payload_accepted(self, rng):
        """config.py promises v1/v2/v3 senders fall back through
        MaskPayload.to_flat(): a v3 encoder fed the mask-landing result
        must emit the same bytes (and advance the same shadow) as the
        flat path — it used to TypeError instead (r4 advisor finding)."""
        n = 200_000
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        cases = [
            np.arange(1000, 3000, 2),                       # dense cluster
            np.sort(rng.choice(n, 200, replace=False)),     # sparse
            np.empty(0, np.int64),                          # static frame
        ]
        for xs in cases:
            xs = np.asarray(xs, np.int64)
            vals = rng.integers(1, 255, xs.size,
                                endpoint=True, dtype=np.uint8)
            if xs.size:
                start = (int(xs[0]) // 8) * 8
                end = (int(xs[-1]) // 8 + 1) * 8
                window = np.zeros(end - start, np.uint8)
                window[xs - start] = 1
                mp = wire.MaskPayload(
                    xs.size, start,
                    np.packbits(window, bitorder="little"), vals)
            else:
                mp = wire.MaskPayload(0, 0, np.zeros(8, np.uint8),
                                      np.empty(0, np.uint8))
            e_ref = wire.V3Encoder(base.copy())
            e_mask = wire.V3Encoder(base.copy())
            ref_buf = e_ref.encode(xs.size, xs, vals)
            got = e_mask.encode(xs.size, mp, None)
            assert got == ref_buf
            np.testing.assert_array_equal(e_mask.frame, e_ref.frame)

    def test_short_buffer_raises(self):
        n = 1024
        enc = wire.V3Encoder(np.zeros(n, np.uint8))
        xs = np.arange(0, n, 2, dtype=np.int32)
        buf = enc.encode(xs.size, xs, np.full(xs.size, 7, np.uint8))
        assert buf[0] == wire.MODE_BITMASK
        for cut in (0, 1, 4, len(buf) - 1):
            with pytest.raises(ValueError):
                wire.unpack_frame_v3(buf[:cut], 0, n)

    def test_mode_crossovers_are_exact(self):
        """Brute-force the density sweep: the encoder always emits the
        smallest of the three encodings."""
        n = 4096
        rng = np.random.default_rng(5)
        for frac in (0.0, 0.02, 0.05, 0.0625, 0.07, 0.2, 0.5, 0.86, 0.9, 1.0):
            k = int(n * frac)
            xs = np.sort(rng.choice(n, size=k, replace=False)).astype(np.int32)
            vals = np.full(k, 9, np.uint8)
            enc = wire.V3Encoder(np.zeros(n, np.uint8))
            buf = enc.encode(k, xs, vals)
            n_exc = int(np.count_nonzero(np.diff(xs, prepend=-1) >= 0xFFFF))
            sizes = wire.v3_sizes(k, n_exc, n)
            assert len(buf) == min(sizes), (frac, len(buf), sizes)


class TestWireV4:
    """v4 = v3's adaptive modes + mode 3 "winmask" (window change-bits),
    plus the zero-index fast path: a landing's MaskPayload is trimmed
    and forwarded UNTRANSLATED when winmask wins — no index stream is
    ever materialized on the server."""

    @staticmethod
    def _sizes4(pos, xs, n):
        n_exc = int(np.count_nonzero(np.diff(xs, prepend=-1) >= 0xFFFF))
        _, wb = wire.winmask_window(xs)
        return wire.v3_sizes(pos, n_exc, n) + (wire.winmask_size(pos, wb),)

    @staticmethod
    def _mask_payload(pos, xs, vals, n, margin=64):
        """Build the lander-shaped bits window (with zero margins the
        encoder must trim) for ascending xs."""
        if pos == 0:
            return wire.MaskPayload(0, 0, np.zeros(8, np.uint8),
                                    np.empty(0, np.uint8))
        start = max(0, (int(xs[0]) // 8) * 8 - margin)
        end = min((n + 7) // 8 * 8, (int(xs[-1]) // 8 + 1) * 8 + margin)
        window = np.zeros(end - start, np.uint8)
        window[np.asarray(xs, np.int64) - start] = 1
        return wire.MaskPayload(
            pos, start, np.packbits(window, bitorder="little"), vals
        )

    def _apply(self, buf, n, client):
        pos, xs, vals, raw, used = wire.unpack_frame_v3(buf, 0, n)
        assert used == len(buf)
        if raw is not None:
            return raw.copy()
        if pos:
            client = client.copy()
            client[xs] = client[xs] + vals
        return client

    def test_mode_selection_and_reconstruction(self, rng):
        """A density/locality sweep drives all FOUR modes; every emitted
        frame is the exact min of the four sizes and reconstructs."""
        n = 9216
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        enc = wire.V4Encoder(base)
        client = base.copy()
        # (index builder, expected mode)
        plans = [
            (np.arange(4000, 4600), wire.MODE_WINMASK),  # dense cluster
            (np.sort(rng.choice(n, 90, replace=False)), wire.MODE_DELTA16),
            (np.sort(rng.choice(n, n // 4, replace=False)),
             wire.MODE_BITMASK),
            (np.arange(n), wire.MODE_RAW),
            (np.empty(0, np.int64), wire.MODE_DELTA16),  # static frame
        ]
        for xs, want_mode in plans:
            k = xs.size
            vals = rng.integers(1, 255, k, endpoint=True, dtype=np.uint8)
            expect = enc.frame.copy()
            if k:
                expect[xs] = expect[xs] + vals
            buf = enc.encode(k, xs, vals)
            assert buf[0] == want_mode == enc.last_mode
            assert len(buf) == min(self._sizes4(k, xs, n))
            client = self._apply(buf, n, client)
            np.testing.assert_array_equal(client, expect)
            np.testing.assert_array_equal(enc.frame, expect)

    def test_winmask_wins_on_local_clusters(self):
        """The mode v4 exists for: a moving subject (locally dense span
        in a big frame) costs ~pos/8 index bytes where delta16 pays
        2*pos and the full bitmask pays n/8."""
        n = 1 << 20
        xs = np.arange(300_000, 330_000)  # 30k contiguous changed bytes
        vals = np.full(xs.size, 5, np.uint8)
        enc = wire.V4Encoder(np.zeros(n, np.uint8))
        buf = enc.encode(xs.size, xs, vals)
        assert buf[0] == wire.MODE_WINMASK
        assert len(buf) < xs.size + xs.size // 8 + 64  # ~1.125 B/byte
        # v3 on the same frame pays the delta16 index stream (3 B/byte)
        v3 = wire.V3Encoder(np.zeros(n, np.uint8)).encode(
            xs.size, xs, vals)
        assert len(v3) >= 3 * xs.size
        assert len(buf) < 0.4 * len(v3)

    def test_mask_payload_forward_is_byte_identical(self, rng):
        """The zero-index path (MaskPayload in, margins trimmed, bits
        forwarded) emits exactly the SPEC encoder's bytes and maintains
        the shadow exactly — across all four winning modes."""
        n = 200_000
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        cases = [
            np.arange(1000, 3000, 2),                      # winmask
            np.sort(rng.choice(n, 200, replace=False)),    # delta16
            np.sort(rng.choice(n, n // 4, replace=False)), # bitmask
            np.arange(0, n - 5),                           # raw
            np.empty(0, np.int64),                         # empty
        ]
        for xs in cases:
            xs = np.asarray(xs, np.int64)
            vals = rng.integers(1, 255, xs.size,
                                endpoint=True, dtype=np.uint8)
            e_ref = wire.V4Encoder(base.copy())
            e_mask = wire.V4Encoder(base.copy())
            ref_buf = e_ref.encode(xs.size, xs, vals)
            got = e_mask.encode(
                xs.size, self._mask_payload(xs.size, xs, vals, n), None
            )
            assert got == ref_buf
            np.testing.assert_array_equal(e_mask.frame, e_ref.frame)

    def test_mask_payload_escape_exactness(self, rng):
        """The mask path sizes delta16 WITHOUT materializing xs; its
        byte-LUT escape count must be exact at the 65535 gap boundary
        and for the first-index escape — asserted via byte identity
        with the from-xs SPEC path."""
        n = 400_000
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        for g in (65533, 65534, 65535, 65536, 131070):
            for first in (3, 65533, 65534, 65535, 65536):
                xs = np.array([first, first + g, first + g + 7], np.int64)
                vals = np.array([1, 2, 3], np.uint8)
                e_ref = wire.V4Encoder(base.copy())
                e_mask = wire.V4Encoder(base.copy())
                ref_buf = e_ref.encode(3, xs, vals)
                got = e_mask.encode(
                    3, self._mask_payload(3, xs, vals, n), None)
                assert got == ref_buf, (g, first)

    def test_mask_payload_popcount_mismatch_raises(self):
        """The rebuild's window-missed-units invariant moved into the
        encoder: a bits window whose popcount disagrees with the device
        pos must fail loudly, never truncate."""
        bits = np.zeros(16, np.uint8)
        bits[3] = 0b101
        enc = wire.V4Encoder(np.zeros(4096, np.uint8))
        with pytest.raises(RuntimeError, match="popcount"):
            enc.encode(3, wire.MaskPayload(
                3, 0, bits, np.array([1, 2, 3], np.uint8)), None)
        with pytest.raises(RuntimeError, match="missed"):
            enc.encode(2, wire.MaskPayload(
                2, 0, np.zeros(8, np.uint8), np.array([1, 2], np.uint8)
            ), None)

    def test_tiled_payload_accepted(self, rng):
        n = 4096
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        xs = np.arange(800, 1100)
        vals = rng.integers(1, 255, xs.size, endpoint=True, dtype=np.uint8)
        counts = np.array([200, 100], np.int32)
        xs_t = np.zeros((2, 200), np.int32)
        vals_t = np.zeros((2, 200), np.uint8)
        xs_t[0, :200], xs_t[1, :100] = xs[:200], xs[200:]
        vals_t[0, :200], vals_t[1, :100] = vals[:200], vals[200:]
        tp = wire.TiledPayload(xs.size, counts, xs_t, vals_t)
        flat = wire.V4Encoder(base.copy()).encode(xs.size, xs, vals)
        tiled = wire.V4Encoder(base.copy()).encode(xs.size, tp, None)
        assert flat == tiled and flat[0] == wire.MODE_WINMASK

    def test_stream_scan_and_read(self, rng):
        """v3_frame_extent measures winmask frames (the replayer's
        framing pre-scan) and read_frame_v3 decodes them from a stream."""
        n = 8192
        base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        enc = wire.V4Encoder(base.copy())
        stream = b""
        scripted = [np.arange(100, 1400), np.arange(4000, 4032),
                    np.sort(rng.choice(n, 60, replace=False))]
        for xs in scripted:
            stream += enc.encode(
                xs.size, xs, np.full(xs.size, 9, np.uint8))
        # extent scan walks the exact frame boundaries
        off, marks = 0, []
        while off < len(stream):
            end = wire.v3_frame_extent(stream, off, n)
            marks.append((off, end))
            off = end
        assert len(marks) == len(scripted)
        # streaming reader agrees, and the decode reconstructs
        client = base.copy()
        cursor = [0]

        def rd(k):
            b = stream[cursor[0]: cursor[0] + k]
            cursor[0] += k
            return b

        for xs in scripted:
            pos, dxs, dvals, raw = wire.read_frame_v3(rd, n)
            assert pos == xs.size and raw is None
            np.testing.assert_array_equal(dxs, xs)
            client[dxs] = client[dxs] + dvals
        np.testing.assert_array_equal(client, enc.frame)

    def test_mask_payload_to_flat(self, rng):
        n = 10000
        xs = np.sort(rng.choice(n, 500, replace=False)).astype(np.int64)
        vals = rng.integers(0, 255, 500, endpoint=True, dtype=np.uint8)
        mp = self._mask_payload(500, xs, vals, n)
        fx, fv = mp.to_flat()
        np.testing.assert_array_equal(fx, xs)
        np.testing.assert_array_equal(fv, vals)


def test_pack_bitmask_matmul_path_equals_fallback(rng):
    """The (M,384) MXU packing (used at frame sizes) must equal the
    generic reshape path and the host packer bit-for-bit — asserted
    DIRECTLY: the same prefix of one mask goes through both paths
    (384*24 bytes → matmul; that minus 8 bytes → 384-indivisible →
    reshape fallback), and both must agree with the host packer."""
    import jax.numpy as jnp

    from cudavideostream_tpu.ops import diff

    n = 384 * 24  # divisible by 384: takes the matmul fast path
    mask = rng.random(n) < 0.37
    dev = np.asarray(diff.pack_bitmask(jnp.asarray(mask)))
    host = wire.pack_bitmask_from_xs(np.nonzero(mask)[0], n)
    np.testing.assert_array_equal(dev, host)
    np.testing.assert_array_equal(wire.decode_bitmask(dev, n),
                                  np.nonzero(mask)[0])
    # forced fallback on the shared prefix: byte-aligned but not a
    # multiple of 384, so pack_bitmask takes the generic reshape path
    m = n - 8
    fb = np.asarray(diff.pack_bitmask(jnp.asarray(mask[:m])))
    np.testing.assert_array_equal(fb, dev[: m // 8])
