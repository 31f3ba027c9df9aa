"""Pallas TPU kernels for the data-movement hot paths.

`gather_windows`: build the tiled-inference window batch ON DEVICE. The
engine's exact tiling (engine.py) needs overlapping [win_h, win_w] windows
of the LR/bicubic images; assembling them on the host costs host memcpy
plus ~2x duplicated host->device transfer (halos overlap). This kernel
keeps the image in HBM (`pl.ANY`), scalar-prefetches the per-tile window
origins, and DMAs each window HBM->VMEM into its output slot — one linear
image upload, windows materialized at HBM bandwidth.

A jittable XLA fallback (`gather_windows_xla`, vmapped dynamic_slice) is
used on CPU and for verification; tests assert bit-equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


_PALLAS_BROKEN = False  # set after a failed TPU mosaic compile (e.g. remote
# compile services that only support plain XLA); we then use the XLA path


def gather_windows_xla(img, row_starts, col_starts, win_h: int, win_w: int):
    """[H, W, C], [n], [n] -> [n, win_h, win_w, C] via vmapped dynamic_slice."""
    c = img.shape[-1]

    def one(r, cs):
        return jax.lax.dynamic_slice(img, (r, cs, 0), (win_h, win_w, c))

    return jax.vmap(one)(row_starts, col_starts)


def gather_windows(img, row_starts, col_starts, win_h: int, win_w: int,
                   interpret: bool = False):
    """Pallas window gather on TPU; falls back to XLA elsewhere or when the
    TPU toolchain cannot compile Mosaic kernels."""
    global _PALLAS_BROKEN
    platform = jax.devices()[0].platform
    if (platform != "tpu" or _PALLAS_BROKEN) and not interpret:
        return _gather_windows_xla_jit(img, row_starts, col_starts, win_h, win_w)
    try:
        return _gather_windows_pallas(img, row_starts, col_starts, win_h, win_w,
                                      interpret)
    except Exception:
        if interpret:
            raise
        _PALLAS_BROKEN = True
        return _gather_windows_xla_jit(img, row_starts, col_starts, win_h, win_w)


_gather_windows_xla_jit = jax.jit(gather_windows_xla, static_argnums=(3, 4))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _gather_windows_pallas(img, row_starts, col_starts, win_h: int, win_w: int,
                           interpret: bool = False):

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = row_starts.shape[0]
    c = img.shape[-1]

    h_img, w_img = img.shape[0], img.shape[1]

    def kernel(rows_ref, cols_ref, img_ref, out_ref):
        i = pl.program_id(0)
        # clamp like dynamic_slice so the TPU path bit-matches the XLA
        # fallback even for out-of-range origins
        r0 = jnp.clip(rows_ref[i], 0, h_img - win_h)
        c0 = jnp.clip(cols_ref[i], 0, w_img - win_w)

        def body(sem):
            dma = pltpu.make_async_copy(
                img_ref.at[pl.ds(r0, win_h), pl.ds(c0, win_w), :],
                out_ref.at[0],
                sem,
            )
            dma.start()
            dma.wait()

        pl.run_scoped(body, pltpu.SemaphoreType.DMA)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, win_h, win_w, c),
            lambda i, rows, cols: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, win_h, win_w, c), img.dtype),
        interpret=interpret,
    )
    return fn(row_starts.astype(jnp.int32), col_starts.astype(jnp.int32), img)
