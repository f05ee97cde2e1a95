"""Property-based fuzzing of the codec invariants (hypothesis).

Deeper version of the reference's self-checking harnesses
(``tests/test_cuda/pixel_diff.cu`` loops forever on random data; here the
shrinker hunts for counterexamples instead).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime import wire

frames = arrays(np.uint8, st.integers(16, 512), elements=st.integers(0, 255))


@st.composite
def frame_pairs(draw):
    n = draw(st.integers(16, 512))
    prev = draw(arrays(np.uint8, n, elements=st.integers(0, 255)))
    cur = draw(arrays(np.uint8, n, elements=st.integers(0, 255)))
    return prev, cur


@settings(max_examples=200, deadline=None)
@given(frame_pairs(), st.integers(0, 255))
def test_client_always_reconstructs(pair, threshold):
    """For ANY frames and ANY threshold: applying the payload to prev
    yields exactly the negative-feedback reconstruction, and the
    reconstruction is within threshold of the true frame."""
    prev, cur = pair
    pos, xs, vals, new_prev = ref.diff_encode(cur, prev, threshold)
    recon = ref.client_apply(prev, xs, vals)
    np.testing.assert_array_equal(recon, new_prev)
    err = np.abs(new_prev.astype(np.int32) - cur.astype(np.int32))
    assert err.max(initial=0) <= threshold
    # count invariant (the pixel_diff.cu check)
    df = cur.astype(np.int32) - prev.astype(np.int32)
    assert pos == int((np.abs(df) > threshold).sum())


@settings(max_examples=100, deadline=None)
@given(frame_pairs())
def test_wire_roundtrip_any_payload(pair):
    prev, cur = pair
    pos, xs, vals, _ = ref.diff_encode(cur, prev)
    buf = wire.pack_payload(pos, xs, vals)
    p2, xs2, vals2, used = wire.unpack_payload(buf)
    assert used == len(buf) == 4 + 5 * pos
    np.testing.assert_array_equal(xs2, xs)
    np.testing.assert_array_equal(vals2, vals)


@settings(max_examples=100, deadline=None)
@given(frame_pairs())
def test_idempotent_second_frame(pair):
    """Feeding the same frame twice ships nothing the second time."""
    prev, cur = pair
    _, _, _, state = ref.diff_encode(cur, prev)
    pos2, _, _, state2 = ref.diff_encode(cur, state)
    assert pos2 == 0
    np.testing.assert_array_equal(state2, state)


@settings(max_examples=50, deadline=None)
@given(st.data())
def test_drift_eventually_ships(data):
    """Monotone drift must ship within ceil((T+1)/step) frames and the
    reconstruction must converge to the target value."""
    threshold = data.draw(st.integers(1, 60))
    step = data.draw(st.integers(1, 40))
    start = data.draw(st.integers(0, 100))
    prev = np.array([start], np.uint8)
    target = min(255, start + 8 * step)
    v = start
    for _ in range(64):
        v = min(target, v + step)
        _, _, _, prev = ref.diff_encode(np.array([v], np.uint8), prev, threshold)
        if v == target and int(prev[0]) == target:
            break
    # final state within threshold of target always
    assert abs(int(prev[0]) - target) <= threshold


@settings(max_examples=60, deadline=None)
@given(frames)
def test_grayscale_bounds_and_equality(frame):
    n = (frame.size // 3) * 3
    frame = frame[:n]
    if n == 0:
        return
    for fn in (ref.grayscale_average, ref.grayscale_weighted):
        g = fn(frame).reshape(-1, 3)
        assert np.all(g[:, 0] == g[:, 1]) and np.all(g[:, 1] == g[:, 2])
        px = frame.reshape(-1, 3)
        assert np.all(g[:, 0] <= px.max(axis=1))
        assert np.all(g[:, 0].astype(int) >= px.min(axis=1).astype(int) - 1)


@settings(max_examples=60, deadline=None)
@given(arrays(np.int64, 256, elements=st.integers(0, 10_000)))
def test_top2_matches_c_scan_semantics(hist):
    """The vectorized device formulation must equal the literal C scan for
    arbitrary histograms (including ties and all-zero)."""
    import jax.numpy as jnp

    from cudavideostream_tpu.ops import filters

    imax, isec = ref.top2_scan(hist)
    di, ds = filters.top2_prefix_max(jnp.asarray(hist))
    assert (int(di), int(ds)) == (imax, isec)
    t = ref.binarize_threshold(hist)
    assert 50 <= t <= 200


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, (1 << 25) - 1), unique=True, max_size=300),
    st.data(),
)
def test_wire_v2_codec_roundtrip(idxs, data):
    """ANY ascending index set (arbitrary gaps, huge first index) must
    survive the delta16 encode/decode byte-exactly."""
    xs = np.sort(np.asarray(idxs, np.int64)).astype(np.int32)
    vals = np.asarray(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=xs.size, max_size=xs.size
            )
        ),
        np.uint8,
    )
    buf = wire.pack_payload_v2(xs.size, xs, vals)
    pos, xs2, vals2, used = wire.unpack_payload_v2(buf)
    assert pos == xs.size and used == len(buf)
    np.testing.assert_array_equal(xs2, xs)
    np.testing.assert_array_equal(vals2, vals)


@settings(max_examples=100, deadline=None)
@given(frame_pairs(), st.data())
def test_threshold_map_oracle_semantics(pair, data):
    """Per-byte threshold maps: byte i ships iff |df_i| > map[i], and the
    negative-feedback reconstruction stays within map[i] everywhere."""
    prev, cur = pair
    tm = np.asarray(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=prev.size, max_size=prev.size
            )
        ),
        np.uint8,
    )
    pos, xs, vals, new_prev = ref.diff_encode(cur, prev, tm)
    recon = ref.client_apply(prev, xs, vals)
    np.testing.assert_array_equal(recon, new_prev)
    err = np.abs(new_prev.astype(np.int32) - cur.astype(np.int32))
    assert (err <= tm.astype(np.int32)).all()
    df = np.abs(cur.astype(np.int32) - prev.astype(np.int32))
    assert pos == int((df > tm).sum())
