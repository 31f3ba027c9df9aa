"""Parallelism: device meshes, data-parallel training, spatial sharding."""

from dcscn_tpu.parallel import mesh, spatial  # noqa: F401
