"""Spatially-sharded inference: image rows across devices, halos over ICI.

The CP/SP analog for a fully-convolutional SR model (SURVEY.md §2d): a huge
image's rows are sharded over the 'spatial' mesh axis; each device computes
its band. Two design points make this *bit-exact* with the single-device
whole-image result:

1. Halo rows are REAL neighbor pixels fetched with `jax.lax.ppermute`
   (never synthetic zero padding — zeros corrupt deep SAME-conv stacks
   because post-bias/PReLU activations in fake rows are nonzero).
2. Border devices shift their compute window inward (same trick as
   engine.py's shifted tiles): every device runs the same
   [band + 2*halo]-row window, but device 0's window starts exactly at the
   true top border and the last device's ends at the true bottom border,
   so XLA's SAME zero-padding is applied exactly where the whole-image run
   would apply it.

Each device exchanges 2*halo rows with each neighbor (one bidirectional
ppermute pair riding ICI), selects its window with a device-dependent
dynamic_slice, runs the full model, and keeps its owned output rows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn


def spatial_forward_fn(cfg: Config, mesh: Mesh, halo: Optional[int] = None,
                       compute_dtype=jnp.float32, bn_state=None):
    """Build a jitted fn (params, x [H,W,1], x2 [H*s,W*s,1]) -> [H*s,W*s,1]
    with rows of x/x2/output sharded over the 'spatial' mesh axis.

    Requires H % n_spatial == 0 and band >= 2*halo (callers pad/choose
    accordingly; engine-level drivers handle ragged sizes with tiles).
    """
    s = cfg.scale
    if halo is None:
        halo = dcscn.receptive_field_lr(cfg)
    n_sp = mesh.shape["spatial"]

    def shard_body(params, x, x2):
        # x: this device's band [hb, W, 1]; x2: [hb*s, W*s, 1]
        if n_sp == 1:
            # degenerate mesh: no neighbors — wraparound halos would splice
            # the image's own rows; just run the whole image
            y, _ = dcscn.apply(params, x[None], x2[None], cfg, training=False,
                               bn_state=bn_state, compute_dtype=compute_dtype)
            return y[0]
        idx = jax.lax.axis_index("spatial")
        hb = x.shape[0]
        win = hb + 2 * halo

        def exchange(block, h):
            """ext = [prev's bottom 2h rows, block, next's top 2h rows]."""
            fwd = [(i, (i + 1) % n_sp) for i in range(n_sp)]
            bwd = [(i, (i - 1) % n_sp) for i in range(n_sp)]
            from_prev = jax.lax.ppermute(block[-2 * h :], "spatial", fwd)
            from_next = jax.lax.ppermute(block[: 2 * h], "spatial", bwd)
            return jnp.concatenate([from_prev, block, from_next], axis=0)

        ext = exchange(x, halo)          # [hb + 4*halo, W, 1]
        ext2 = exchange(x2, halo * s)    # [(hb + 4*halo)*s, W*s, 1]

        # window offset within ext: interior=halo, first=2*halo (start at
        # true top border), last=0 (end at true bottom border)
        off = jnp.where(idx == 0, 2 * halo, jnp.where(idx == n_sp - 1, 0, halo))
        win_x = jax.lax.dynamic_slice_in_dim(ext, off, win, axis=0)
        win_x2 = jax.lax.dynamic_slice_in_dim(ext2, off * s, win * s, axis=0)

        y, _ = dcscn.apply(params, win_x[None], win_x2[None], cfg,
                           training=False, bn_state=bn_state,
                           compute_dtype=compute_dtype)

        # owned rows within the window: global own start - window start
        own_off = jnp.where(idx == 0, 0, jnp.where(idx == n_sp - 1, 2 * halo, halo))
        return jax.lax.dynamic_slice_in_dim(y[0], own_off * s, hb * s, axis=0)

    sharded = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P("spatial", None, None), P("spatial", None, None)),
        out_specs=P("spatial", None, None),
    )

    @functools.partial(jax.jit)
    def run(params, x, x2):
        return sharded(params, x, x2)

    def place(arr):
        return jax.device_put(arr, NamedSharding(mesh, P("spatial", None, None)))

    run.place = place
    return run
