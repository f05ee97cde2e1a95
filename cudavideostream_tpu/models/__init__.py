"""Pipeline models: configured, jit-compiled end-to-end frame processors."""

from cudavideostream_tpu.models.pipeline import DeltaStreamPipeline

__all__ = ["DeltaStreamPipeline"]
