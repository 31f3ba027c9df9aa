"""dcscn_tpu — a TPU-native (JAX/XLA/Pallas) super-resolution framework.

A ground-up rebuild of the capabilities of jiny2001/dcscn-super-resolution
("Fast and Accurate Image Super Resolution by Deep CNN with Skip Connection
and Network in Network", arXiv:1707.05425), designed TPU-first:

- the DCSCN model family is a pure function (params pytree + apply) compiled
  by XLA onto the MXU, instead of a TF1 graph object
  (reference: /root/reference/DCSCN.py:222-332),
- bicubic resampling, color conversion, dihedral flips and metrics are
  jittable array ops (reference: helper/utilty.py),
- the x8 self-ensemble runs as a batched forward instead of 8 sequential
  session calls (reference: DCSCN.py:559-573),
- training scales over a jax.sharding.Mesh with data parallelism, and huge
  images are tiled spatially across devices with exact halo handling.

Public API mirrors the reference's surface: see `dcscn_tpu.api.SuperResolution`
and the CLI modules under `dcscn_tpu.cli`.
"""

__version__ = "0.1.0"

from dcscn_tpu.config import Config  # noqa: F401
