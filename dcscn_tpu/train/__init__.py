"""Training: optax optimizers, jitted train steps, epoch scan, trainer loop."""

from dcscn_tpu.train import optimizers, trainer  # noqa: F401
