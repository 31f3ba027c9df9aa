"""Checkpoint I/O: native pytree checkpoints + reference-TF converter."""

from dcscn_tpu.io import checkpoint  # noqa: F401
