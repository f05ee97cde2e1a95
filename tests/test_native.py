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
