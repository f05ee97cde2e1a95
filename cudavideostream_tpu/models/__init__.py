"""Pipeline models: configured, jit-compiled end-to-end frame processors."""

from cudavideostream_tpu.models.batched import BatchedDeltaPipeline
from cudavideostream_tpu.models.pipeline import DeltaStreamPipeline
from cudavideostream_tpu.models.variants import available, get_config

__all__ = [
    "BatchedDeltaPipeline", "DeltaStreamPipeline", "available", "get_config",
]
