"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "space"),
    data_parallel: int = 1,
) -> Mesh:
    """Build a ``(data, space)`` mesh over the first ``n_devices`` devices.

    ``data`` shards independent streams; ``space`` shards frame rows.
    With ``data_parallel=1`` the mesh is effectively 1-D over space.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    if n_devices % data_parallel:
        raise ValueError("n_devices must be divisible by data_parallel")
    arr = np.array(devices[:n_devices]).reshape(
        data_parallel, n_devices // data_parallel
    )
    return Mesh(arr, axis_names=tuple(axis_names))
