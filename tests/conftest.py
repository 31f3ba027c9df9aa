"""Test env: force CPU with 8 virtual devices to emulate a TPU mesh.

The machine's sitecustomize registers a TPU (axon) PJRT plugin and forces
jax_platforms at interpreter start, so env vars alone are not enough — we
override the config and clear any initialized backends before tests run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover - jax version fallback
    pass

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
