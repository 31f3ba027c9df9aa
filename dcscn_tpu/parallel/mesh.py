"""Device mesh construction.

The reference is strictly single-device (helper/tf_graph.py:65-71 pins one
GPU id; no tf.distribute anywhere — SURVEY.md §2d). Parallelism here is a
first-class new capability: a 2-D ('data', 'spatial') jax.sharding.Mesh.
'data' carries minibatch sharding for training (gradient psum over ICI);
'spatial' carries image-row sharding for large-image inference (halo
exchange via ppermute, see parallel/spatial.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_data: int = 0,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh. n_data == 0 uses all remaining
    devices after n_spatial is satisfied."""
    devices = list(devices if devices is not None else jax.devices())
    if n_spatial <= 0:
        n_spatial = 1
    if n_data <= 0:
        n_data = max(len(devices) // n_spatial, 1)
    need = n_data * n_spatial
    if need > len(devices):
        raise ValueError(
            "mesh %dx%d needs %d devices, have %d"
            % (n_data, n_spatial, need, len(devices))
        )
    grid = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(grid, ("data", "spatial"))


def data_sharding(mesh: Mesh):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec("data"))


def replicated(mesh: Mesh):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec())
