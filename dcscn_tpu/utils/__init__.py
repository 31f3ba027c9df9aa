"""Host utilities: filesystem, image I/O, logging, timing."""

from dcscn_tpu.utils import files, imaging, logging_util  # noqa: F401
