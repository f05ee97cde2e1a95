from cudavideostream_tpu.utils.shapes import MatSize
from cudavideostream_tpu.utils.timing import Timer, bench_op

__all__ = ["MatSize", "Timer", "bench_op"]
