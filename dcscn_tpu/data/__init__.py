"""Data pipeline: image-set builders, patch stores, dynamic sampling."""

from dcscn_tpu.data import builders  # noqa: F401
