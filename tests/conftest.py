"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding paths compile and execute without TPU hardware. This must happen
before the first ``import jax`` anywhere in the test process.
"""

import os

# NB: in the TPU container a sitecustomize imports jax at interpreter
# startup and pins JAX_PLATFORMS to the hardware backend, so env vars set
# here are too late for import-time config — but backend *initialization*
# is lazy, so jax.config.update still wins as long as no device has been
# touched yet. XLA_FLAGS is read at CPU-client init, which is also lazy.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def small_config():
    """A small frame config so tests stay fast; geometry divisible by the
    tiling the kernels use. overlay_scale=4 keeps the (taller) stroke
    font's cells inside the 48-row frame so overlay paths stay covered."""
    from cudavideostream_tpu.config import StreamConfig

    return StreamConfig(height=48, width=64, overlay_scale=4)


def make_frame_pair(rng, n_bytes, change_frac=0.06, lo=0, hi=255):
    """Synthetic (prev, cur) pair with ~change_frac bytes beyond threshold,
    the rest within +-threshold noise — mimics the reference's measured
    5.93% changed-pixel rate (report.tex:2594)."""
    prev = rng.integers(lo, hi, size=n_bytes, endpoint=True, dtype=np.uint8)
    noise = rng.integers(-15, 15, size=n_bytes, endpoint=True).astype(np.int32)
    big = rng.random(n_bytes) < change_frac
    jump = rng.integers(30, 200, size=n_bytes) * rng.choice([-1, 1], size=n_bytes)
    delta = np.where(big, jump, noise)
    cur = ((prev.astype(np.int32) + delta) % 256).astype(np.uint8)
    return prev, cur


@pytest.fixture
def frame_pair(rng):
    return make_frame_pair(rng, 48 * 64 * 3)


class ScriptedSource:
    """Deterministic frame-script source (FrameSource interface) for
    tests that need exact control over per-frame change counts."""

    def __init__(self, base, frames):
        self._base = base
        self._frames = list(frames)
        self._i = 0

    def base_frame(self):
        return self._base

    def __next__(self):
        if self._i >= len(self._frames):
            raise StopIteration
        f = self._frames[self._i]
        self._i += 1
        return f
