"""Model family: DCSCN v2 and its variants as pure functions."""

from dcscn_tpu.models import dcscn  # noqa: F401
