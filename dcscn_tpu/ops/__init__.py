"""Array ops: color conversion, resampling, flips, metrics, patches.

These are the TPU-native replacements for the reference's host-side
PIL/numpy/skimage utilities (reference: helper/utilty.py). Every op has a
numpy host path (bit-matching the reference pipeline for evaluation parity)
and a jittable jnp path for on-device use.
"""

from dcscn_tpu.ops import color, flips, metrics, patches, resize  # noqa: F401
