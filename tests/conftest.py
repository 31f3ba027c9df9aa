"""Test env: force CPU with 8 virtual devices to emulate a TPU mesh."""

import os

# Must be set before jax is imported anywhere. Force CPU even if the
# environment pre-set a TPU platform: unit tests emulate the mesh on host.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
