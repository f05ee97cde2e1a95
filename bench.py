"""Headline benchmark: 1080p frames/sec/chip for diff-encode + compact.

Matches BASELINE.json's metric ("1080p frames/sec/chip (diff-encode+
compact); ms/frame per filter kernel"). The steady-state loop runs
entirely on device — frames are generated in HBM by a procedural source
(SURVEY.md §6: the rebuild must fix the reference's capture bottleneck
with a synthetic source at benchmark time) and T pipeline steps are
chained in one ``lax.scan``, so the measurement is chip throughput, not
host-tunnel bandwidth. A payload byte-exactness check against the CPU
oracle gates the number.

Prints ONE json line to stdout:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/26}
(26 fps = the reference's best end-to-end rate on its own hardware,
REPORT/report.tex:914; its kernel-only ceiling ~292 fps = 3.42 ms
kernel2.)

``--full`` additionally prints the per-filter-kernel ms table (stderr).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 26.0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=24, help="scan length")
    p.add_argument("--iters", type=int, default=8, help="scan invocations")
    p.add_argument("--full", action="store_true", help="per-kernel table")
    p.add_argument("--skip-check", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.ops import reference_cpu as ref
    from cudavideostream_tpu.runtime.sources import device_synthetic_frames
    from cudavideostream_tpu.utils import fonts

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = StreamConfig() if on_tpu else StreamConfig(height=48, width=64)
    print(
        f"bench: {cfg.height}x{cfg.width} on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    pipe = DeltaStreamPipeline(cfg)
    init_frame, next_frame = device_synthetic_frames(cfg, seed=0)

    ids = jnp.asarray(fonts.encode_text("FPS: 240 BW: 14000 kbps", 28), jnp.int32)
    n_chars = jnp.int32(23)
    T = args.frames

    def scan_step(carry, t):
        prev, key = carry
        key, sub = jax.random.split(key)
        frame = next_frame(sub, t)
        prev, pos, xs, vals = pipe._step_impl(prev, frame, ids, n_chars)[:4]
        # digest forces full payload materialization (int32 wrap is fine)
        digest = jnp.sum(xs) + jnp.sum(vals.astype(jnp.int32))
        return (prev, key), (pos, digest)

    @jax.jit
    def run_scan(prev, key):
        return jax.lax.scan(scan_step, (prev, key), jnp.arange(T))

    prev0 = jnp.asarray(np.asarray(init_frame))
    key0 = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    (prev, key), (pos_hist, digests) = run_scan(prev0, key0)
    pos_hist.block_until_ready()
    _ = jax.device_get(pos_hist)
    compile_s = time.perf_counter() - t0
    print(f"compile+first scan: {compile_s:.1f}s  pos={np.asarray(pos_hist)[:4]}...",
          file=sys.stderr)

    # byte-exactness gate: one step's payload vs the CPU oracle
    if not args.skip_check:
        key, sub = jax.random.split(key0)
        frame1 = next_frame(sub, jnp.int32(0))
        new_prev, pos, xs, vals = pipe._step_impl(
            jnp.asarray(np.asarray(init_frame)).copy(), frame1, ids, n_chars
        )[:4]
        pos = int(pos)
        f_h = np.asarray(frame1)
        p_h = np.asarray(init_frame)
        exp_prev, exp_pos, exp_xs, exp_vals, _ = ref.step_oracle(
            p_h, f_h, cfg, atlas=pipe.atlas_np,
            char_ids=fonts.encode_text("FPS: 240 BW: 14000 kbps"),
        )
        assert pos == exp_pos, (pos, exp_pos)
        np.testing.assert_array_equal(np.asarray(xs)[:pos], exp_xs)
        np.testing.assert_array_equal(np.asarray(vals)[:pos], exp_vals)
        np.testing.assert_array_equal(np.asarray(new_prev), exp_prev)
        print(f"byte-exact vs oracle: OK (pos={pos})", file=sys.stderr)

    # timed region: iters scans, one sync at the end (minus measured rtt)
    state = (prev0, key0)
    out = run_scan(*state)
    _ = jax.device_get(out[1][0].ravel()[0])
    t0 = time.perf_counter()
    _ = jax.device_get(out[1][0].ravel()[0])
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        (prev0, key0), out = run_scan(prev0, key0)
    _ = jax.device_get(out[0].ravel()[0])
    total = time.perf_counter() - t0 - rtt
    fps = args.iters * T / total

    if args.full:
        _kernel_table(cfg, file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "1080p_fps_per_chip_diff_encode_compact",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )
    return 0


def _kernel_table(cfg, file=sys.stderr) -> None:
    """Per-kernel ms table (scan-chained; see benchmarks/kernels.py)."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks import kernels

    kernels.run()


if __name__ == "__main__":
    sys.exit(main())
