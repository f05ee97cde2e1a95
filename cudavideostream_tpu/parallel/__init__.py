"""Multi-chip SPMD parallelism.

The reference is single-GPU: its "parallelism inventory" is CUDA
intra-device threading (SURVEY.md §2.2). The TPU rebuild scales the same
pipeline across chips with ``jax.sharding`` + ``shard_map``:

* frame rows sharded over a ``space`` mesh axis (the spatial analogue of
  the reference's per-thread contiguous chunks, ``kernels.cu:404-408``);
* multiple independent streams sharded over a ``data`` axis;
* the conv filter's halo rows exchanged neighbor-to-neighbor with
  ``ppermute`` (the reference stages halos in ``__shared__`` memory,
  ``kernels.cu:97-136`` — here the halo crosses ICI instead of SMEM);
* the sparse payload assembled with ``all_gather`` (counts) + ``psum``
  (disjoint scatter blocks), a collective ragged concat.
"""

from cudavideostream_tpu.parallel.mesh import make_mesh
from cudavideostream_tpu.parallel.sharded import ShardedDeltaPipeline

__all__ = ["make_mesh", "ShardedDeltaPipeline"]
