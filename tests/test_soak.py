"""Adversarial serving soak — the composed state machine under fuzz.

The targeted tests pin each mechanism in isolation; this drives them
COMPOSED, the way a real session does: OverlayShadow text hints x
velocity-predicted speculative windows x depth-K landing queue x the v4
adaptive encoder (delta16 / bitmask / raw / winmask, chosen per frame) x
scene cuts x density swings x empty frames x client reconnects —
hundreds of randomized frames, every landed payload round-tripped
through real wire bytes and checked byte-exact against the CPU oracle.

A wrong speculative window, a desynced overlay shadow, a stale encoder
shadow after reconnect, or a mis-trimmed winmask would all surface here
as a byte mismatch within a few frames of the injected event.
"""

import numpy as np
import pytest

from cudavideostream_tpu.config import StreamConfig
from cudavideostream_tpu.ops import reference_cpu as ref
from cudavideostream_tpu.runtime import wire
from cudavideostream_tpu.runtime.executor import BatchedLandExecutor
from cudavideostream_tpu.utils import fonts

N_FRAMES = 400          # per scenario; a few minutes of 30 fps serving


def _random_walk_frames(rng, base, n):
    """Adversarial frame script: a drifting band whose width, velocity,
    and delta churn randomly, plus scene cuts, dense bursts, and exact
    repeats (pos == 0 frames)."""
    size = base.size
    frame = base.copy()
    start, width, vel = 5000, 4000, 512
    for t in range(n):
        r = rng.random()
        if r < 0.03:                      # scene cut: everything changes
            if rng.random() < 0.5:
                # +128 shift: EVERY byte crosses threshold (pos == n) —
                # the only density where the v4 raw mode is cheapest
                # (below ~87% the winmask window stays smaller)
                frame = frame + np.uint8(128)
            else:
                frame = rng.integers(0, 255, size, endpoint=True,
                                     dtype=np.uint8)
            yield frame.copy()
            continue
        if r < 0.08:                      # exact repeat: pos == 0
            yield frame.copy()
            continue
        if r < 0.13:                      # dense burst: ~40% of frame
            f = frame.copy()
            m = rng.random(size) < 0.4
            f[m] += rng.integers(30, 200, int(m.sum())).astype(np.uint8)
            frame = f
            yield frame.copy()
            continue
        if rng.random() < 0.1:            # velocity jump (spec misses)
            vel = int(rng.integers(-4096, 4096))
        width = int(np.clip(width + rng.integers(-1500, 1500),
                            500, 20000))
        start = int((start + vel) % max(1, size - width))
        f = frame.copy()
        f[start:start + width] += np.uint8(rng.integers(25, 200))
        frame = f
        yield frame.copy()


@pytest.mark.parametrize("maskonly", [False, True],
                         ids=["indexed", "maskonly"])
def test_v4_serving_soak(maskonly):
    cfg = StreamConfig(height=96, width=128, overlay_scale=4,
                       tiled_payload=True, fetch_mode="mask",
                       emit_bitmask=True, mask_payload=True,
                       wire_format="v4", maskonly_payload=maskonly)
    rng = np.random.default_rng(20260820 + maskonly)
    n = cfg.frame_bytes
    base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)

    K = 5
    ex = BatchedLandExecutor(cfg, depth=K)
    ex.start(base)
    atlas = ex.pipe.atlas_np
    enc = wire.V4Encoder(base)            # per-connection wire shadow
    recon = base.copy()                   # client reconstruction
    oracle_prev = base.copy()
    expected = []                         # oracle prevs awaiting landing
    modes_seen = set()
    text, next_text_change = "", 0
    frames_iter = _random_walk_frames(rng, base, N_FRAMES)

    def land(results):
        nonlocal recon
        for pos, xs, vals, _aux in results:
            want = expected.pop(0)
            # round-trip through REAL wire bytes: encode (adaptive mode
            # choice + shadow apply) then decode like the client
            buf = enc.encode(pos, xs, vals)
            modes_seen.add(buf[0])
            p, dx, dv, raw, used = wire.unpack_frame_v3(buf, 0, n)
            assert used == len(buf)
            if raw is not None:
                recon = raw.copy()
            elif p:
                w = recon.astype(np.int32)
                np.add.at(w, dx, dv.astype(np.int32))
                recon = (w % 256).astype(np.uint8)
            np.testing.assert_array_equal(recon, want)

    for t, frame in enumerate(frames_iter):
        if t >= next_text_change:         # text churn: overlay hints +
            # volatile-frame machinery; occasional empty-text stretches
            # (overlay off) let a +128 scene cut change EVERY byte —
            # the only way the v4 raw mode can win while an unchanged
            # overlay strip would otherwise anchor a winmask hole
            text = "" if rng.random() < 0.25 else f"FPS {t} BW {t * 7}"
            next_text_change = t + int(rng.integers(5, 20))
        ids = fonts.encode_text(text)
        oracle_prev, _, _, _, _ = ref.step_oracle(
            oracle_prev, frame, cfg, atlas=atlas, char_ids=ids)
        expected.append(oracle_prev.copy())
        out = ex.process(frame, text=text)
        if out is not None:
            land(out)
        if t > 0 and t % 150 == 0:        # client reconnect mid-session
            tail = ex.flush()
            if tail:
                land(tail)
            snap = ex.resync()
            assert not expected
            # the resync frame must equal the oracle's prev exactly —
            # a fresh client bootstraps from it
            np.testing.assert_array_equal(snap, oracle_prev)
            enc = wire.V4Encoder(snap.copy())
            recon = snap.copy()

    tail = ex.flush()
    if tail:
        land(tail)
    assert not expected
    np.testing.assert_array_equal(ex.resync(), oracle_prev)

    # the fuzz genuinely exercised the machine: speculation engaged and
    # both hit and missed; the encoder exercised >= 3 of its 4 modes
    sc = ex._lander.spec_counts
    assert sc["hit"] > 0 and sc["miss"] > 0, sc
    assert len(modes_seen) >= 3, modes_seen
