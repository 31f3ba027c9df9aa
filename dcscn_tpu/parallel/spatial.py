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
                       compute_dtype=jnp.float32, bn_state=None,
                       pad: int = 0):
    """Build a jitted fn (params, x [Hp,W,1], x2 [Hp*s,W*s,1]) -> [Hp*s,W*s,1]
    with rows of x/x2/output sharded over the 'spatial' mesh axis.

    Requires Hp % n_spatial == 0 and band >= 2*halo + pad.

    Ragged heights: callers pad the image bottom with `pad` arbitrary rows to
    reach Hp = H + pad (a band multiple); pass that `pad` here. The last
    device's compute window is shifted upward so it ends exactly at the TRUE
    bottom border (global row H) — padded rows never enter any window, so the
    first H*s output rows are bit-identical to the whole-image run and the
    final pad*s rows are garbage the caller drops. pad=0 reproduces the
    original exact scheme. (Same shifted-window trick as engine._tile_plan.)
    """
    s = cfg.scale
    if halo is None:
        halo = dcscn.receptive_field_lr(cfg)
    n_sp = mesh.shape["spatial"]
    if pad < 0:
        raise ValueError("pad must be >= 0")

    def shard_body(params, x, x2):
        # x: this device's band [hb, W, 1]; x2: [hb*s, W*s, 1]
        if n_sp == 1:
            # degenerate mesh: no neighbors — wraparound halos would splice
            # the image's own rows; just run the whole image
            if pad:
                y, _ = dcscn.apply(params, x[None, : x.shape[0] - pad],
                                   x2[None, : (x.shape[0] - pad) * s], cfg,
                                   training=False, bn_state=bn_state,
                                   compute_dtype=compute_dtype)
                return jnp.pad(y[0], ((0, pad * s), (0, 0), (0, 0)))
            y, _ = dcscn.apply(params, x[None], x2[None], cfg, training=False,
                               bn_state=bn_state, compute_dtype=compute_dtype)
            return y[0]
        idx = jax.lax.axis_index("spatial")
        hb = x.shape[0]
        if hb < 2 * halo + pad:
            raise ValueError(
                "spatial band %d rows < 2*halo + pad = %d; use fewer devices"
                % (hb, 2 * halo + pad))
        win = hb + 2 * halo
        e = 2 * halo + pad  # rows exchanged with each neighbor

        def exchange(block, ee):
            """ext = [prev's bottom ee rows, block, next's top ee rows]."""
            fwd = [(i, (i + 1) % n_sp) for i in range(n_sp)]
            bwd = [(i, (i - 1) % n_sp) for i in range(n_sp)]
            from_prev = jax.lax.ppermute(block[-ee:], "spatial", fwd)
            from_next = jax.lax.ppermute(block[:ee], "spatial", bwd)
            return jnp.concatenate([from_prev, block, from_next], axis=0)

        ext = exchange(x, e)          # [hb + 2*e, W, 1]
        ext2 = exchange(x2, e * s)    # [(hb + 2*e)*s, W*s, 1]

        # window offset within ext (ext starts at global idx*hb - e):
        # interior = e - halo (window starts halo above the owned band),
        # first = e (start at true top border, global row 0),
        # last = 0 (window ends at true bottom border, global row H)
        off = jnp.where(idx == 0, e, jnp.where(idx == n_sp - 1, 0, e - halo))
        win_x = jax.lax.dynamic_slice_in_dim(ext, off, win, axis=0)
        win_x2 = jax.lax.dynamic_slice_in_dim(ext2, off * s, win * s, axis=0)

        y, _ = dcscn.apply(params, win_x[None], win_x2[None], cfg,
                           training=False, bn_state=bn_state,
                           compute_dtype=compute_dtype)

        # owned rows within the window: global own start - window start.
        # The last device owns hb rows of which the final `pad` are fake;
        # its slice [2*halo + pad, 2*halo + pad + hb) overruns the window by
        # `pad` rows — pad y's bottom so those rows exist (garbage, dropped
        # by the caller) without dynamic_slice clamping shifting the start.
        own_off = jnp.where(idx == 0, 0,
                            jnp.where(idx == n_sp - 1, 2 * halo + pad, halo))
        y0 = y[0]
        if pad:
            y0 = jnp.pad(y0, ((0, pad * s), (0, 0), (0, 0)))
        return jax.lax.dynamic_slice_in_dim(y0, own_off * s, hb * s, axis=0)

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
    run.sharded = sharded
    return run


def spatial_ensemble_fn(cfg: Config, mesh: Mesh, ensemble: int,
                        halo: Optional[int] = None,
                        compute_dtype=jnp.float32, bn_state=None,
                        members=None):
    """Fused dihedral self-ensemble over the spatially-sharded forward:
    ONE dispatch for all `ensemble` members (vs the reference's sequential
    per-member session calls, DCSCN.py:559-573).

    Members are generated ON DEVICE from the already-sharded image by a
    `lax.scan` over the member index (model traced once, same scheme as
    engine._tiled_fn): the flip/transpose of a row-sharded array is computed
    by XLA with collective permutes riding ICI, each member then runs the
    bit-exact spatially-sharded forward, and the un-flipped outputs
    accumulate on device. Exactness: each member is an independent exact
    spatial forward of the flipped image, so the mean equals the host loop.

    Requires pad == 0 (flips along H move pad rows to the top, breaking the
    pad-at-bottom contract) and a square image when ensemble > 4 (transposed
    members swap H and W). For NON-square images the engine instead composes
    two of these with `members` subsets (the transposed-sum identity, see
    engine._run_tiled_deferred): with `members` (a subset of flips 0..3)
    this returns the un-normalized SUM over exactly those members.
    """
    single = spatial_forward_fn(cfg, mesh, halo=halo,
                                compute_dtype=compute_dtype,
                                bn_state=bn_state, pad=0)

    def _t(v):
        return jnp.transpose(v, (1, 0, 2))

    # same dihedral tables as engine._tiled_fn, for [H,W,C] single images
    fwd_branches = [
        lambda v: v,
        lambda v: v[::-1],
        lambda v: v[:, ::-1],
        lambda v: v[::-1, ::-1],
        lambda v: _t(v)[::-1],        # rot90
        lambda v: _t(v)[:, ::-1],     # rot90(-1)
        lambda v: _t(v),              # flipud(rot90)
        lambda v: _t(v)[::-1, ::-1],  # flipud(rot90(-1))
    ]
    inv_branches = [
        lambda v: v,
        lambda v: v[::-1],
        lambda v: v[:, ::-1],
        lambda v: v[::-1, ::-1],
        lambda v: _t(v)[:, ::-1],
        lambda v: _t(v)[::-1],
        lambda v: _t(v),
        lambda v: _t(v[::-1, ::-1]),
    ]
    # slice the branch tables: lax.switch traces EVERY branch, and the
    # transposed branches (4-7) only shape-check for square images
    # (members mode and ensemble <= 4 never reach them)
    if members is not None:
        fb = fwd_branches[:4]
        ib = inv_branches[:4]
        idxs_static = tuple(int(m) for m in members)
    else:
        fb = fwd_branches[:ensemble]
        ib = inv_branches[:ensemble]
        idxs_static = None

    @functools.partial(jax.jit)
    def run(params, x, x2):
        def body(acc, i):
            xi = jax.lax.switch(i, fb, x)
            x2i = jax.lax.switch(i, fb, x2)
            yi = single.sharded(params, xi, x2i)
            return acc + jax.lax.switch(i, ib, yi), None

        idxs = (jnp.asarray(idxs_static, jnp.int32) if idxs_static is not None
                else jnp.arange(ensemble, dtype=jnp.int32))
        acc, _ = jax.lax.scan(body, jnp.zeros(x2.shape, x2.dtype), idxs)
        if idxs_static is not None:
            return acc  # raw member sum; caller normalizes
        return acc / float(ensemble)

    run.place = single.place
    return run
