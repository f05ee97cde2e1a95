"""cudavideostream_tpu — a TPU-native real-time video delta-streaming
framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
MatteoBattilana/CUDAVideoStream: thresholded per-byte frame deltas with
negative feedback, deterministic sparse compaction into a
``(pos, xs, vals)`` wire payload, a filter bank (grayscale, binarization,
motion heatmap, red-noise visualizers, Gaussian/mean/median denoise), a
GPU-free glyph text overlay, and a host runtime that speaks the exact TCP
wire format of the reference client.
"""

from cudavideostream_tpu.config import (
    DEFAULT_CONFIG,
    CompactionBackend,
    StreamConfig,
    Visualizer,
)

__version__ = "0.1.0"

__all__ = [
    "StreamConfig",
    "Visualizer",
    "CompactionBackend",
    "DEFAULT_CONFIG",
    "__version__",
]
