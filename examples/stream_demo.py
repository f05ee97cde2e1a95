"""Library-API walkthrough: every model variant over a synthetic scene.

Runs each named pipeline variant for a few frames, prints payload sizes
and aux-frame stats, and dumps a viewable PPM of the heatmap aux output.

    python examples/stream_demo.py [--height 256 --width 384]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--out", default="/tmp/cvstpu_demo")
    args = p.parse_args()

    from cudavideostream_tpu.models import DeltaStreamPipeline, available, get_config
    from cudavideostream_tpu.runtime.client import write_ppm
    from cudavideostream_tpu.runtime.sources import SyntheticSource

    os.makedirs(args.out, exist_ok=True)
    for name in available():
        cfg = get_config(name, height=args.height, width=args.width)
        pipe = DeltaStreamPipeline(cfg)
        src = SyntheticSource(cfg, seed=4)
        state = pipe.init_state(src.base_frame())
        total_payload = 0
        aux = None
        for t in range(args.frames):
            state, pos, xs, vals, aux = pipe.step(
                state, next(src), text=f"FPS: {30+t}"
            )
            total_payload += 4 + 5 * int(pos)
        dense = args.frames * cfg.frame_bytes
        line = (f"{name:16s} payload {total_payload/1024:8.1f} KiB "
                f"({100*total_payload/dense:5.2f}% of dense)")
        if aux is not None:
            aux_np = np.asarray(aux)
            line += f"   aux mean {aux_np.mean():6.1f}"
            write_ppm(os.path.join(args.out, f"{name}_aux.ppm"),
                      aux_np, cfg.height, cfg.width)
        print(line)
    # the reconstruction itself, viewable
    write_ppm(os.path.join(args.out, "reconstruction.ppm"),
              np.asarray(state), cfg.height, cfg.width)
    print(f"viewable PPM dumps in {args.out}/")


if __name__ == "__main__":
    main()
