"""Device-side window gather for tiled inference.

`gather_windows` builds the tiled-inference window batch ON DEVICE: the
engine's exact tiling (engine.py) needs overlapping [win_h, win_w] windows
of the LR/bicubic images; assembling them on the host costs host memcpy
plus ~2x duplicated host->device transfer (halos overlap).

Measured on v5e (tools/bench_gather.py, round 3, bsd100-like 481x321 LR,
77 windows of 82x82, results/r3/bench_gather.json):

    xla (vmapped dynamic_slice, on device)   1.84 ms
    host assembly + transfer                37.0  ms   (20x slower)

so the device-side gather matters — but the XLA lowering already delivers
it, at ~0.4% of the 480 ms tiled-ensemble dispatch it feeds. The Mosaic
kernel below additionally CANNOT compile for C=1 images: a window slice
is unaligned in the lane dimension ("Slice shape along dimension 2 must
be aligned to tiling (128), but is 1"), and shuffling W into the lane dim
would make the arbitrary column offsets unaligned instead. The Pallas
path is therefore retired from the hot path (kept, with its interpret-mode
tests, as the worked example for a future toolchain that supports
sub-tile DMA slicing); `gather_windows` uses the XLA gather everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather_windows_xla(img, row_starts, col_starts, win_h: int, win_w: int):
    """[H, W, C], [n], [n] -> [n, win_h, win_w, C] via vmapped dynamic_slice."""
    c = img.shape[-1]

    def one(r, cs):
        return jax.lax.dynamic_slice(img, (r, cs, 0), (win_h, win_w, c))

    return jax.vmap(one)(row_starts, col_starts)


def gather_windows(img, row_starts, col_starts, win_h: int, win_w: int,
                   interpret: bool = False):
    """Device-side window gather (XLA vmapped dynamic_slice — see module
    docstring for why this, and not the Mosaic kernel, is the TPU path).
    `interpret=True` runs the retired Pallas kernel in interpret mode for
    its equivalence tests."""
    if interpret:
        return _gather_windows_pallas(img, row_starts, col_starts, win_h,
                                      win_w, True)
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
