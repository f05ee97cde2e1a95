"""Denoise-filter bandwidth study — rebuild of the reference's
changed-pixel-savings experiment (REPORT/report.tex:2594-2617: 369,350
changed px unfiltered = 5.93%; Gaussian K=3 saves 3.58% ... K=7 1.66%;
chosen operating point Gaussian K~4).

Measures how many payload bytes each Gaussian/mean kernel size saves on
a noisy synthetic scene.

Run:  ``python benchmarks/bandwidth.py [--out benchmarks/bandwidth_1080p]``
"""

from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(height=1080, width=1920, noise=26, seed=0, out_path=None):
    """Both sides of the diff pass through the filter, exactly as in the
    pipeline (the conv feeds ``d_current`` *before* diffing,
    kernels.cu:457-459) — two noisy observations of the same scene plus a
    real moving object."""
    from cudavideostream_tpu.ops import reference_cpu as ref

    rng = np.random.default_rng(seed)
    n = height * width * 3
    scene = rng.integers(30, 225, n, dtype=np.uint8)

    def observe(t):
        img = np.clip(
            scene.astype(np.int32)
            + rng.integers(-noise, noise, n, endpoint=True),
            0, 255,
        ).astype(np.uint8).reshape(height, width, 3)
        img[100 + 10 * t : 300 + 10 * t, 200:500] = 255
        return img.ravel()

    f1, f2 = observe(0), observe(1)

    pos0, *_ = ref.diff_encode(f2, f1)
    print(f"unfiltered changed bytes: {pos0} ({100*pos0/n:.2f}%)")
    rows = [("none", 0, pos0, 0.0)]
    for kind, make in (("gauss", ref.gaussian_kernel), ("mean", ref.mean_kernel)):
        for k in (3, 5, 7, 9):
            g1 = ref.convolve(f1, make(k), height, width)
            g2 = ref.convolve(f2, make(k), height, width)
            pos, *_ = ref.diff_encode(g2, g1)
            saved = 100 * (pos0 - pos) / n
            print(f"{kind} K={k}: changed {pos} ({100*pos/n:.2f}%), saved {saved:.2f}% of frame")
            rows.append((kind, k, pos, saved))
    if out_path:
        with open(out_path, "w") as f:
            f.write(
                f"# kind\tK\tchanged_bytes\tsaved_pct_of_frame "
                f"({height}x{width}, noise=+-{noise}, seed={seed}; "
                f"reference table: report.tex:2594-2617)\n"
            )
            for kind, k, pos, saved in rows:
                f.write(f"{kind}\t{k}\t{pos}\t{saved:.2f}\n")
        print(f"wrote {out_path}", file=sys.stderr)
    return rows


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    run(out_path=p.parse_args().out)
