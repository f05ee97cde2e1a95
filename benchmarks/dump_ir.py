"""Dump lowered IR for the hot kernels — the analogue of the reference's
SASS-level analysis (cuobjdump/nvdisasm dumps committed as
``tests/heat_map_red_benchmark/v1.S``, discussed report.tex:1940+).

``python benchmarks/dump_ir.py [--out benchmarks/ir]`` writes the StableHLO
for the fused pipeline step and the Mosaic-lowered kernel, for eyeballing
fusion decisions and vector op counts.
"""

from __future__ import annotations

import argparse
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def run(out_dir: str = "benchmarks/ir", compile_opt: bool = False):
    import jax
    import jax.numpy as jnp

    from cudavideostream_tpu.config import StreamConfig
    from cudavideostream_tpu.models import DeltaStreamPipeline
    from cudavideostream_tpu.utils import fonts

    os.makedirs(out_dir, exist_ok=True)
    cfg = StreamConfig()
    pipe = DeltaStreamPipeline(cfg)
    rng = np.random.default_rng(0)
    prev = jnp.asarray(rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8))
    frame = jnp.asarray(rng.integers(0, 255, cfg.frame_bytes, endpoint=True, dtype=np.uint8))
    ids = jnp.asarray(fonts.encode_text("FPS: 30", 28), jnp.int32)

    lowered = pipe.jitted.lower(prev, frame, ids, jnp.int32(7))
    with open(os.path.join(out_dir, "pipeline_step.stablehlo.txt"), "w") as f:
        f.write(lowered.as_text())
    if compile_opt:
        compiled = lowered.compile()
        with open(os.path.join(out_dir, "pipeline_step.hlo_opt.txt"), "w") as f:
            f.write(compiled.as_text())
    print(f"wrote IR dumps under {out_dir}/")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/ir")
    p.add_argument("--compile", action="store_true",
                   help="also dump compiler-optimized HLO (slow)")
    a = p.parse_args()
    run(a.out, a.compile)
