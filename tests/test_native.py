"""Native helper library tests (build + byte-exactness vs oracle).

Skipped when no C compiler is available; the Python fallbacks are
exercised either way via the _np wrappers.
"""

import socket
import threading

import numpy as np
import pytest

from cudavideostream_tpu import native
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime import wire


@pytest.fixture(scope="module")
def lib():
    lib = native.load_native()
    if lib is None:
        pytest.skip("no C toolchain / build failed")
    return lib


def test_build_succeeds(lib):
    assert lib is not None


def test_compact_bitmask_matches_oracle(lib, rng):
    n = 6144
    prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur = np.where(
        rng.random(n) < 0.1, (prev.astype(np.int32) + 99) % 256, prev
    ).astype(np.uint8)
    pos_r, xs_r, vals_r, _ = ref.diff_encode(cur, prev)
    df = (cur.astype(np.int32) - prev.astype(np.int32))
    mask = np.abs(df) > 20
    delta = df.astype(np.uint8)
    bitmask = np.packbits(mask, bitorder="little")
    xs, vals = native.compact_bitmask_np(delta, bitmask)
    assert xs.size == pos_r
    np.testing.assert_array_equal(xs, xs_r)
    np.testing.assert_array_equal(vals, vals_r)


def test_compact_bitmask_tail_handling(lib):
    # n not a multiple of 64 exercises the scalar tail loop
    n = 100
    delta = np.arange(n, dtype=np.uint8)
    mask = np.zeros(n, dtype=bool)
    mask[[0, 63, 64, 65, 99]] = True
    xs, vals = native.compact_bitmask_np(delta, np.packbits(mask, bitorder="little"))
    assert xs.tolist() == [0, 63, 64, 65, 99]
    assert vals.tolist() == [0, 63, 64, 65, 99]


def test_client_apply_matches_oracle(lib, rng):
    n = 2048
    frame = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    xs = np.sort(rng.choice(n, 100, replace=False)).astype(np.int32)
    vals = rng.integers(0, 255, 100, endpoint=True, dtype=np.uint8)
    expect = ref.client_apply(frame, xs, vals)
    got = frame.copy()
    native.client_apply_np(got, xs, vals)
    np.testing.assert_array_equal(got, expect)


def test_wire_send_payload_over_socket(lib, rng):
    pos = 1000
    xs = np.sort(rng.choice(100000, pos, replace=False)).astype(np.int32)
    vals = rng.integers(0, 255, pos, endpoint=True, dtype=np.uint8)
    a, b = socket.socketpair()
    received = bytearray()

    def reader():
        want = 4 + pos * 5
        while len(received) < want:
            received.extend(b.recv(65536))

    t = threading.Thread(target=reader)
    t.start()
    rc = native.wire_send_payload_fd(a.fileno(), pos, xs, vals)
    t.join(timeout=10)
    a.close()
    b.close()
    assert rc == 0
    p2, xs2, vals2, _ = wire.unpack_payload(bytes(received))
    assert p2 == pos
    np.testing.assert_array_equal(xs2, xs)
    np.testing.assert_array_equal(vals2, vals)


def test_c_client_decodes_server_stream(lib, small_config):
    """The native C decoder (the reference client's exact read loop)
    decodes our server's stream to the oracle-exact reconstruction."""
    import dataclasses
    import threading

    from cudavideostream_tpu.runtime.server import DeltaStreamServer
    from cudavideostream_tpu.runtime.sources import SyntheticSource

    cfg = dataclasses.replace(small_config, port=0)
    n_frames = 3
    server = DeltaStreamServer(
        cfg, SyntheticSource(cfg, seed=21), verbose=False, overlay_status=False
    )
    server.listen()
    t = threading.Thread(
        target=server.serve, kwargs={"max_frames": n_frames}, daemon=True
    )
    t.start()
    result = native.client_decode_np(
        "127.0.0.1", server.port, cfg.frame_bytes, n_frames
    )
    t.join(timeout=30)
    assert result is not None
    frames, final, digest = result
    assert frames == n_frames
    # oracle replay
    replay = SyntheticSource(cfg, seed=21)
    prev = next(replay).copy()
    for _ in range(n_frames):
        prev, *_ = ref.step_oracle(prev, next(replay), cfg)
    np.testing.assert_array_equal(final, prev)


def test_compact_update_matches_oracle_and_updates_prev(lib, rng):
    """The host-source packer: vals from (cur, prev shadow), shadow
    updated in place to the negative-feedback new_prev."""
    n = 6144
    prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur = np.where(
        rng.random(n) < 0.1, (prev.astype(np.int32) + 99) % 256, prev
    ).astype(np.uint8)
    # sub-threshold noise on some unchanged bytes (negfeed must NOT
    # update the shadow there)
    noise = rng.random(n) < 0.2
    cur = np.where(
        noise & (cur == prev), (cur.astype(np.int32) + 5) % 256, cur
    ).astype(np.uint8)
    pos_r, xs_r, vals_r, new_prev_r = ref.diff_encode(cur, prev)
    mask = np.abs(cur.astype(np.int32) - prev.astype(np.int32)) > 20
    bitmask = np.packbits(mask, bitorder="little")
    shadow = prev.copy()
    xs, vals = native.compact_update_np(cur, shadow, bitmask)
    assert xs.size == pos_r
    np.testing.assert_array_equal(xs, xs_r)
    np.testing.assert_array_equal(vals, vals_r)
    np.testing.assert_array_equal(shadow, new_prev_r)


def test_compact_update_c_equals_numpy_fallback(lib, rng):
    n = 777  # non-multiple of 64: exercises the tail loop
    prev = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    cur = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    mask = rng.random(n) < 0.3
    bitmask = np.packbits(mask, bitorder="little")
    s1, s2 = prev.copy(), prev.copy()
    xs_c, vals_c = native.compact_update_np(cur, s1, bitmask)
    # force the numpy fallback
    saved = native._lib
    native._lib, native._tried = None, True
    try:
        xs_n, vals_n = native.compact_update_np(cur, s2, bitmask)
    finally:
        native._lib, native._tried = saved, True
    np.testing.assert_array_equal(xs_c, xs_n)
    np.testing.assert_array_equal(vals_c, vals_n)
    np.testing.assert_array_equal(s1, s2)


def test_c_client_rejects_out_of_range_indices(lib, small_config):
    """The native decoder validates network-supplied byte indices: a
    payload pointing outside the frame returns an error (-6), never an
    out-of-bounds write into the reconstruction buffer."""
    import socket
    import struct
    import threading

    n_bytes = small_config.frame_bytes
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def malicious_server():
        conn, _ = srv.accept()
        conn.sendall(bytes(n_bytes))  # base frame
        # one frame: pos=2, second index past the frame end
        xs = np.array([0, n_bytes], dtype="<i4")
        vals = np.array([7, 7], dtype=np.uint8)
        conn.sendall(struct.pack("<I", 2) + xs.tobytes() + vals.tobytes())
        conn.close()
        srv.close()

    t = threading.Thread(target=malicious_server, daemon=True)
    t.start()
    with pytest.raises(ValueError, match="client_decode"):
        native.client_decode_np("127.0.0.1", port, n_bytes, 4)
    t.join(timeout=10)


class TestNativeV3Encode:
    """cvstpu.c:wire_encode_v3 must be byte-identical to the numpy SPEC
    (wire.encode_frame_v3_numpy) in every mode, at the crossovers, on
    escapes, and must maintain the V3Encoder shadow exactly."""

    N = 20000  # frame bytes: small enough to sweep densities fast

    def _payload(self, rng, density):
        k = max(0, int(self.N * density))
        xs = np.sort(rng.choice(self.N, size=k, replace=False)).astype(np.int64)
        vals = rng.integers(1, 255, size=k, endpoint=True, dtype=np.uint8)
        return k, xs, vals

    @pytest.mark.parametrize("density", [0.0, 0.0005, 0.02, 0.2, 0.6, 1.0])
    def test_identical_to_numpy_spec(self, lib, rng, density):
        pos, xs, vals = self._payload(rng, density)
        shadow = rng.integers(0, 255, self.N, endpoint=True, dtype=np.uint8)
        after = shadow.copy()
        after[xs] = after[xs] + vals
        expected = wire.encode_frame_v3_numpy(pos, xs, vals, after)
        got = native.encode_v3_np(
            np.array([pos], np.int32), xs, vals, after, apply=False
        )
        assert got == expected
        # and the applying variant folds the payload into the shadow
        sh2 = shadow.copy()
        got2 = native.encode_v3_np(
            np.array([pos], np.int32), xs, vals, sh2, apply=True
        )
        assert got2 == expected
        np.testing.assert_array_equal(sh2, after)

    def test_escape_gaps(self, lib):
        """Gaps >= 0xFFFF take the 4-byte absolute escape path."""
        xs = np.array([0, 1, 70000, 70001, 140000], np.int64)
        vals = np.array([5, 6, 7, 8, 9], np.uint8)
        after = np.zeros(150000, np.uint8)
        after[xs] = vals
        expected = wire.encode_frame_v3_numpy(len(xs), xs, vals, after)
        got = native.encode_v3_np(
            np.array([len(xs)], np.int32), xs, vals, after, apply=False
        )
        assert got == expected
        assert got[0] == wire.MODE_DELTA16
        # decode round-trip through the public reader
        pos, dxs, dvals, raw, used = wire.unpack_frame_v3(got, 0, after.size)
        assert raw is None and used == len(got)
        np.testing.assert_array_equal(dxs, xs)
        np.testing.assert_array_equal(dvals, vals)

    def test_tiled_blocks_match_flat(self, lib, rng):
        """Block-form input == flat-form input == numpy SPEC."""
        pos, xs, vals = self._payload(rng, 0.05)
        after = rng.integers(0, 255, self.N, endpoint=True, dtype=np.uint8)
        tile_cap = 128
        n_tiles = -(-self.N // tile_cap)  # ceil: last tile partial
        counts = np.zeros(n_tiles, np.int32)
        xs_b = np.zeros((n_tiles, tile_cap), np.int32)
        vals_b = np.zeros((n_tiles, tile_cap), np.uint8)
        for t in range(n_tiles):
            sel = (xs >= t * tile_cap) & (xs < (t + 1) * tile_cap)
            c = int(sel.sum())
            counts[t] = c
            xs_b[t, :c] = xs[sel]
            vals_b[t, :c] = vals[sel]
        expected = wire.encode_frame_v3_numpy(pos, xs, vals, after)
        got = native.encode_v3_np(counts, xs_b, vals_b, after, apply=False)
        assert got == expected

    def test_v3encoder_uses_native_and_matches(self, lib, rng):
        """V3Encoder over TiledPayload: wire bytes and shadow equal the
        numpy path driven with identical inputs."""
        pos, xs, vals = self._payload(rng, 0.03)
        base = rng.integers(0, 255, self.N, endpoint=True, dtype=np.uint8)
        tp = wire.TiledPayload(
            pos,
            np.array([pos], np.int32),
            xs.astype(np.int32).reshape(1, -1),
            vals.reshape(1, -1),
        )
        enc_native = wire.V3Encoder(base)
        buf_n = enc_native.encode(pos, tp, None)
        # numpy reference: flat arrays + stateless encode on a hand-kept
        # shadow
        shadow = base.copy()
        shadow[xs] = shadow[xs] + vals
        buf_ref = wire.encode_frame_v3_numpy(pos, xs, vals, shadow)
        assert buf_n == buf_ref
        np.testing.assert_array_equal(enc_native.frame, shadow)

    def test_capacity_refusal_leaves_shadow_untouched(self, lib, rng):
        """A -1 capacity refusal must happen BEFORE the apply pass: the
        Python wrapper's numpy fallback re-applies the payload, so a
        post-apply -1 would fold it into the shadow twice (r4 advisor
        finding). Sweep out_cap from 0 past every mode's size and assert
        the shadow is bit-identical whenever the call refuses."""
        import ctypes as c

        n = 4096
        shadow0 = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        # dense enough that bitmask/raw are in play
        xs = np.arange(0, n, 2, dtype=np.int32)
        vals = np.full(xs.size, 7, np.uint8)
        counts = np.array([xs.size], np.int32)
        after = shadow0.copy()
        after[xs] = after[xs] + vals
        expected = wire.encode_frame_v3_numpy(xs.size, xs, vals, after)
        for cap in [0, 4, 100, len(expected) - 1, len(expected),
                    10 + 7 * xs.size, 1 + n]:
            sh = shadow0.copy()
            out = np.empty(max(cap, 1), np.uint8)
            rc = lib.wire_encode_v3(
                counts.ctypes.data_as(c.POINTER(c.c_int32)),
                1, xs.size,
                xs.ctypes.data_as(c.POINTER(c.c_int32)),
                vals.ctypes.data_as(c.POINTER(c.c_uint8)),
                sh.ctypes.data_as(c.POINTER(c.c_uint8)),
                n, 1,
                out.ctypes.data_as(c.POINTER(c.c_uint8)),
                cap,
            )
            if rc < 0:
                np.testing.assert_array_equal(sh, shadow0), cap
            else:
                assert out[:rc].tobytes() == expected, cap
                np.testing.assert_array_equal(sh, after)

    def test_mode_crossovers(self, lib, rng):
        """The C encoder picks the same mode as the SPEC at both
        boundaries (delta16 <-> bitmask <-> raw)."""
        n = 4096
        after = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
        for k in range(0, n + 1, 64):
            xs = np.arange(k, dtype=np.int64)
            vals = np.full(k, 3, np.uint8)
            expected = wire.encode_frame_v3_numpy(k, xs, vals, after)
            got = native.encode_v3_np(
                np.array([k], np.int32), xs, vals, after, apply=False
            )
            assert got == expected, f"k={k}"
