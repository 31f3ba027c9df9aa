"""Dihedral-group (x8 self-ensemble) transforms.

Exact same 8 transforms and inverses as the reference
(helper/utilty.py:595-617): 0 identity, 1 flipud, 2 fliplr,
3 flipud(fliplr), 4 rot90, 5 rot90(-1), 6 flipud(rot90), 7 flipud(rot90(-1)).

The reference applies these on the host and runs 8 sequential session calls
(DCSCN.py:559-573). Here they are also provided as batched on-device ops so
the whole ensemble runs as (at most) two batched forwards: transforms 0-3
keep (H, W); transforms 4-7 are the same four flips composed with one
transpose, so `make_ensemble_batch` returns an [4, H, W, C] batch and a
[4, W, H, C] batch.
"""

from __future__ import annotations

import numpy as np


def flip(image: np.ndarray, flip_type: int, invert: bool = False) -> np.ndarray:
    """Host-side single-image transform, numerically identical to the
    reference's `util.flip` (helper/utilty.py:595-617)."""
    if flip_type == 0:
        return image
    if flip_type == 1:
        return np.flipud(image)
    if flip_type == 2:
        return np.fliplr(image)
    if flip_type == 3:
        return np.flipud(np.fliplr(image))
    if flip_type == 4:
        return np.rot90(image, 1 if not invert else -1)
    if flip_type == 5:
        return np.rot90(image, -1 if not invert else 1)
    if flip_type == 6:
        if not invert:
            return np.flipud(np.rot90(image))
        return np.rot90(np.flipud(image), -1)
    if flip_type == 7:
        if not invert:
            return np.flipud(np.rot90(image, -1))
        return np.rot90(np.flipud(image), 1)
    raise ValueError("flip_type must be in [0, 7], got %d" % flip_type)


# ----------------------------------------------------------------------
# Device (jnp) batched paths
# ----------------------------------------------------------------------


def _flips4_jnp(img):
    """[H,W,C] -> [4,H,W,C]: identity, flipud, fliplr, both."""
    import jax.numpy as jnp

    ud = img[::-1, :, :]
    lr = img[:, ::-1, :]
    udlr = img[::-1, ::-1, :]
    return jnp.stack([img, ud, lr, udlr], axis=0)


def make_ensemble_batch(img, count: int):
    """Build the self-ensemble input batches on device.

    img: [H, W, C]. Returns (batch_a, batch_b) where batch_a is
    [min(count,4), H, W, C] (transforms 0..3) and batch_b is
    [max(count-4,0), W, H, C] (transforms 4..7), or None if empty.

    Transform identities (k = rot90 CCW once):
      4 = k, 5 = k^-1, 6 = flipud∘k, 7 = flipud∘k^-1
    Using rot90(x) == flipud(x).T and rot90(x,-1) == fliplr(x).T:
      4 = flipud(x).T, 5 = fliplr(x).T, 6 = x.T (flipud of flipud.T),
      7 = flipud(fliplr(flipud(x).T)) == (flipud(fliplr(x)).T flipped) —
    rather than deriving each, we transpose once and reuse the 4 flips:
      {4,5,6,7} == {T∘f : f in flips4} up to relabeling, handled by tables
      _FWD_A/_FWD_B below.
    """
    import jax.numpy as jnp

    batch_a = _flips4_jnp(img)[: min(count, 4)]
    if count <= 4:
        return batch_a, None
    t = jnp.transpose(img, (1, 0, 2))
    # transform 4: rot90(x) = transpose then flipud? rot90(x)=flipud(x.T)?
    # np.rot90(x) == x.T[::-1, :] (flipud of transpose). Verified in tests.
    b4 = t[::-1, :, :]  # rot90(x, 1)
    b5 = t[:, ::-1, :]  # rot90(x, -1)
    b6 = t  # flipud(rot90(x)) == x.T
    b7 = t[::-1, ::-1, :]  # flipud(rot90(x, -1))
    batch_b = jnp.stack([b4, b5, b6, b7], axis=0)[: count - 4]
    return batch_a, batch_b


def invert_ensemble_batch(out_a, out_b):
    """Undo the transforms on the model outputs and return their sum.

    out_a: [<=4, H', W', C] (transforms 0..3 applied),
    out_b: [<=4, W', H', C] or None (transforms 4..7 applied).
    Returns [H', W', C] summed over ensemble members.
    """
    import jax.numpy as jnp

    n_a = out_a.shape[0]
    acc = out_a[0]
    if n_a > 1:
        acc = acc + out_a[1][::-1, :, :]
    if n_a > 2:
        acc = acc + out_a[2][:, ::-1, :]
    if n_a > 3:
        acc = acc + out_a[3][::-1, ::-1, :]
    if out_b is not None:
        n_b = out_b.shape[0]
        # inverses: 4: rot90(y,-1) = y.T fliplr'd; 5: rot90(y,1); 6: y.T
        # (transform 6 is an involution); 7: rot90(flipud(y),1)
        if n_b > 0:
            y = out_b[0]  # inverse of rot90: rot90(y, -1) == y.T[:, ::-1]
            acc = acc + jnp.transpose(y, (1, 0, 2))[:, ::-1, :]
        if n_b > 1:
            y = out_b[1]  # inverse of rot90(-1): rot90(y, 1) == y.T[::-1]
            acc = acc + jnp.transpose(y, (1, 0, 2))[::-1, :, :]
        if n_b > 2:
            y = out_b[2]  # inverse of transpose is transpose
            acc = acc + jnp.transpose(y, (1, 0, 2))
        if n_b > 3:
            y = out_b[3]  # inverse of flipud∘fliplr∘transpose
            acc = acc + jnp.transpose(y[::-1, ::-1, :], (1, 0, 2))
    return acc
