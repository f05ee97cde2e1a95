"""Chunked transfer/compute overlap experiment.

The reference prototyped 5-stream sliced HtoD/kernel/DtoH overlap
(``tests/benchmark.cu:63-91``, ``tests/cuda_streaming/server.cu:92-101``)
and *documented the rejected result* (report.tex:1016-1027). This is the
TPU analogue: does hand-slicing the host->device frame upload into row
bands dispatched ahead of the step beat XLA's own async dispatch?

Variants measured over a host-fed frame loop (same synthetic frames):

* ``sync``     — upload full frame, step, fetch pos every frame;
* ``ahead``    — upload + dispatch step, fetch the previous frame's pos
                 (the PipelinedExecutor's one-frame-deep overlap);
* ``chunked4`` — upload the next frame as 4 row-band ``device_put``s
                 issued while the current step runs, concatenated on
                 device at step time;
* ``donated``  — upload into a donated device buffer via jitted identity
                 (the "pinned ring" analogue: reuse HBM, no realloc).

Run on TPU:  ``python benchmarks/ingest_overlap.py [--out benchmarks/ingest_overlap_results]``
"""

from __future__ import annotations

import argparse
import time

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N_FRAMES = 48


def run(out_path: str | None = None, n_frames: int = N_FRAMES):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.utils import fonts

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = StreamConfig() if on_tpu else StreamConfig(height=48, width=64)
    pipe = DeltaStreamPipeline(cfg)
    n = cfg.frame_bytes
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, n, endpoint=True, dtype=np.uint8)
    frames = [
        np.where(rng.random(n) < 0.06, (base.astype(np.int32) + 100) % 256, base)
        .astype(np.uint8)
        for _ in range(8)
    ]
    ids = jnp.asarray(fonts.encode_text("FPS: 240", 28), jnp.int32)
    nch = jnp.int32(8)

    step = pipe._step  # donated prev

    def warm(state):
        out = step(state, jnp.asarray(frames[0]), ids, nch)
        jax.device_get(out[1])
        return out[0]

    results = []

    # -- sync ----------------------------------------------------------
    state = warm(pipe.init_state(base))
    t0 = time.perf_counter()
    for t in range(n_frames):
        dev = jnp.asarray(frames[t % 8])
        out = step(state, dev, ids, nch)
        state = out[0]
        _ = int(out[1])
    sync_ms = 1e3 * (time.perf_counter() - t0) / n_frames
    results.append(("sync", sync_ms))

    # -- dispatch-ahead (fetch lags one frame) -------------------------
    state = warm(pipe.init_state(base))
    pending = None
    t0 = time.perf_counter()
    for t in range(n_frames):
        dev = jnp.asarray(frames[t % 8])
        out = step(state, dev, ids, nch)
        state = out[0]
        if pending is not None:
            _ = int(pending)
        pending = out[1]
    _ = int(pending)
    ahead_ms = 1e3 * (time.perf_counter() - t0) / n_frames
    results.append(("ahead", ahead_ms))

    # -- chunked upload (4 row bands issued ahead) ---------------------
    rows = cfg.height
    band = rows // 4
    wb = cfg.width * 3

    @jax.jit
    def step_banded(prev, b0, b1, b2, b3, ids, nch):
        frame = jnp.concatenate(
            [b.reshape(-1) for b in (b0, b1, b2, b3)], axis=0
        )
        return pipe._step_impl(prev, frame, ids, nch)

    def put_bands(f):
        img = f.reshape(rows, wb)
        return tuple(
            jnp.asarray(img[i * band : (i + 1) * band]) for i in range(4)
        )

    state = pipe.init_state(base)
    out = step_banded(state, *put_bands(frames[0]), ids, nch)
    jax.device_get(out[1])
    state = out[0]
    pending = None
    next_bands = put_bands(frames[0])
    t0 = time.perf_counter()
    for t in range(n_frames):
        bands = next_bands
        out = step_banded(state, *bands, ids, nch)
        state = out[0]
        next_bands = put_bands(frames[(t + 1) % 8])  # overlaps the step
        if pending is not None:
            _ = int(pending)
        pending = out[1]
    _ = int(pending)
    chunk_ms = 1e3 * (time.perf_counter() - t0) / n_frames
    results.append(("chunked4", chunk_ms))

    # -- donated upload buffer (device_put_with donation analogue) -----
    upload = jax.jit(lambda dst, src: src, donate_argnums=(0,))
    state = warm(pipe.init_state(base))
    dev = jnp.asarray(frames[0])
    pending = None
    t0 = time.perf_counter()
    for t in range(n_frames):
        dev = upload(dev, jnp.asarray(frames[t % 8]))
        out = step(state, dev, ids, nch)
        state = out[0]
        if pending is not None:
            _ = int(pending)
        pending = out[1]
    _ = int(pending)
    don_ms = 1e3 * (time.perf_counter() - t0) / n_frames
    results.append(("donated", don_ms))

    for name, ms in results:
        print(f"{name:10s} {ms:8.2f} ms/frame  ({1e3/ms:7.1f} fps host-fed)")
    if out_path:
        with open(out_path, "w") as f:
            f.write(
                f"# variant\tms_per_frame ({cfg.height}x{cfg.width}, "
                f"host-fed over {jax.devices()[0].platform}; "
                f"n={n_frames}; reference experiment: tests/benchmark.cu:63-91)\n"
            )
            for name, ms in results:
                f.write(f"{name}\t{ms:.3f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return results


class _SlowSource:
    """Stand-in for the reference's real bottleneck: a ~33 ms camera
    grab (V4L2+MJPG decode, report.tex:782)."""

    def __init__(self, inner, delay_s: float):
        self.inner = inner
        self.delay_s = delay_s

    def base_frame(self):
        return self.inner.base_frame()

    def __iter__(self):
        return self

    def __next__(self):
        time.sleep(self.delay_s)
        return next(self.inner)


def run_prefetch_ab(out_path: str | None = None, n_frames: int = 60,
                    source_ms: float = 33.0):
    """--prefetch A/B: the full executor loop fed by a deliberately slow
    source, with and without the capture-prefetch thread
    (``runtime.sources.PrefetchSource`` = the reference's ``th_cap``).

    Expectation: when source latency dominates, prefetch collapses
    ms/frame from (source + compute) toward max(source, compute); when
    the source is instant, prefetch is a wash (one extra queue hop)."""
    import dataclasses

    import jax

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.runtime.executor import StreamExecutor
    from cudavideostream_tpu.runtime.sources import (
        PrefetchSource,
        SyntheticSource,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = StreamConfig() if on_tpu else StreamConfig(height=48, width=64)
    delay_s = source_ms * 1e-3

    def measure(slow: bool, prefetch: bool) -> float:
        src = SyntheticSource(cfg, seed=0)
        if slow:
            src = _SlowSource(src, delay_s)
        if prefetch:
            src = PrefetchSource(src)
        ex = StreamExecutor(cfg)
        ex.start(src.base_frame())
        # warm the jit outside the timed region
        ex.process(next(src))
        t0 = time.perf_counter()
        for _ in range(n_frames):
            ex.process(next(src))
        ms = 1e3 * (time.perf_counter() - t0) / n_frames
        if prefetch:
            src.close()
        return ms

    rows = []
    for slow, prefetch in ((True, False), (True, True),
                           (False, False), (False, True)):
        label = (f"{'slow' if slow else 'fast'}_src_"
                 f"{'prefetch' if prefetch else 'inline'}")
        ms = measure(slow, prefetch)
        rows.append((label, ms))
        print(f"{label:24s} {ms:8.2f} ms/frame")
    if out_path:
        with open(out_path, "w") as f:
            f.write(
                f"# variant\tms_per_frame ({cfg.height}x{cfg.width} on "
                f"{jax.devices()[0].platform}; slow source = synthetic + "
                f"{source_ms:.0f} ms sleep, the reference's camera grab "
                f"latency report.tex:782; n={n_frames}; th_cap analogue "
                f"= runtime.sources.PrefetchSource, server --prefetch)\n"
            )
            for label, ms in rows:
                f.write(f"{label}\t{ms:.3f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument("--frames", type=int, default=N_FRAMES)
    p.add_argument("--prefetch-ab", action="store_true",
                   help="run the capture-prefetch (th_cap) A/B instead "
                        "of the transfer-overlap experiment")
    p.add_argument("--source-ms", type=float, default=33.0)
    args = p.parse_args()
    if args.prefetch_ab:
        run_prefetch_ab(args.out, n_frames=args.frames,
                        source_ms=args.source_ms)
    else:
        run(args.out, n_frames=args.frames)
