"""Inference engine: jitted, batched, tile-parallel super resolution.

Replaces the reference's per-image `sess.run` inference (DCSCN.py:547-586)
with a TPU-first design:

- **Batched self-ensemble**: the reference runs the 8 dihedral transforms as
  8 sequential session calls (DCSCN.py:559-573). Here the 4 same-orientation
  transforms run as ONE [4, H, W, 1] batch and the 4 rotated ones as one
  [4, W, H, 1] batch — at most 2 device dispatches, with transform/inverse/
  mean all fused on device.
- **Exact shifted-tile mode**: SAME zero-padding makes naive pad-and-crop
  inexact (padded activations bleed through deep conv stacks), so instead we
  gather fixed-size windows shifted inward at image borders, with a halo
  sized from the model's receptive field; each output pixel is then
  bit-identical to the whole-image run while every tile batch reuses ONE
  compiled shape (no per-image-recompiles) and shards across devices.
- Per-shape jit caching with optional persistent XLA compilation cache.

`run` mirrors the semantics of the reference's `do()` including max_value
rescaling (DCSCN.py:552-557, :581-584).
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn
from dcscn_tpu.ops import flips
from dcscn_tpu.ops import resize as resize_ops


_GROUP_CHUNK = 64  # windows per lax.map chunk in run_many's group dispatch

# cap on windows per group dispatch: bounds HBM for run_many's canvas path
# regardless of dataset size (LR 82x82 + HR 164x164 f32 windows are ~240 KB
# each incl. output, so 4096 windows stay near ~1 GB on a 16 GB chip)
_MAX_GROUP_WINDOWS = 4096

# max images with un-materialized results in run_many's pipeline strategy:
# enough lookahead to hide per-dispatch relay latency, while bounding the
# device buffers (inputs + window batches + outputs) held per image
_MAX_INFLIGHT = 16

# dihedral member j in 4..7 of image x equals flip _T_MEMBER[j] of x^T
# (verified: fwd4=flipud(T), fwd5=fliplr(T), fwd6=T, fwd7=flipud(fliplr(T))),
# and summing inv_j(f(fwd_j(x))) over j in 4..e-1 equals the TRANSPOSE of the
# flip-subset ensemble sum of x^T — the identity behind the two-dispatch
# non-square tiled ensemble (the reference instead runs 8 sequential
# sess.runs, DCSCN.py:559-573)
_T_MEMBER = {4: 1, 5: 2, 6: 0, 7: 3}


def _transposed_members(ensemble: int) -> Tuple[int, ...]:
    """Flip subset to run on x^T covering dihedral members 4..ensemble-1."""
    return tuple(sorted(_T_MEMBER[j] for j in range(4, ensemble)))


def _combine_transposed_sum(out_a: np.ndarray, out_b: np.ndarray,
                            ensemble: int) -> np.ndarray:
    """Ensemble mean from the two member-sum passes of the dihedral
    identity: `out_a` = members 0-3 summed on x, `out_b` = the
    `_transposed_members` flip subset summed on x^T (HWC)."""
    return (out_a + np.transpose(out_b, (1, 0, 2))) / float(ensemble)


def _bucket(n: int) -> int:
    """Round a tile count up to a small set of buckets (1,2,4,8,16,24,32,...)
    so compiled program count stays tiny across image sizes."""
    if n <= 1:
        return 1
    b = 2
    while b < n:
        b = b * 2 if b < 16 else b + 8
    return b


def init_compilation_cache(cache_dir: str) -> None:
    """Persistent XLA compilation cache: critical when compiles are remote
    (axon) or when many distinct image shapes are evaluated."""
    import jax

    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _tile_plan(size: int, interior: int, halo: int) -> List[Tuple[int, int, int]]:
    """Per-axis shifted-window plan.

    Returns a list of (window_start, own_start, own_end) with window size
    interior + 2*halo; own_{start,end} are absolute coordinates of the
    region this window is responsible for. Windows near borders shift
    inward so they always contain real pixels (exactness argument in the
    module docstring).
    """
    win = interior + 2 * halo
    if size <= win:
        return [(0, 0, size)]
    plans = []
    n = math.ceil(size / interior)
    for i in range(n):
        a = i * interior
        b = min(a + interior, size)
        ws = min(max(a - halo, 0), size - win)
        plans.append((ws, a, b))
    return plans


class InferenceEngine:
    """Compiled SR inference for a fixed (params, config)."""

    def __init__(
        self,
        params,
        cfg: Config,
        bn_state=None,
        compute_dtype=jnp.float32,
        donate: bool = False,
    ):
        self.cfg = cfg
        self.params = jax.device_put(params)
        self.bn_state = jax.device_put(bn_state) if bn_state is not None else None
        self.compute_dtype = compute_dtype
        self._fns: Dict[Tuple, object] = {}
        self.halo_lr = dcscn.receptive_field_lr(cfg)
        self._mesh = None
        self.n_spatial = 1
        if cfg.mesh_spatial > 1:
            n_dev = len(jax.devices())
            self.n_spatial = min(cfg.mesh_spatial, n_dev)
            if self.n_spatial < cfg.mesh_spatial:
                import logging

                logging.warning(
                    "mesh_spatial=%d but only %d devices visible; using %d"
                    % (cfg.mesh_spatial, n_dev, self.n_spatial))
            if self.n_spatial > 1:
                from dcscn_tpu.parallel import mesh as mesh_mod

                self._mesh = mesh_mod.make_mesh(1, self.n_spatial)

    # ------------------------------------------------------------------
    def _forward_fn(self, ensemble: int):
        """Jitted fn: (params, x [N,h,w,1], x2 [N,H,W,1]) -> mean-ensembled
        HR output [H,W,1] when ensemble>1, else [N,H,W,1]."""
        cfg = self.cfg
        cdt = self.compute_dtype
        bn = self.bn_state

        if ensemble <= 1:

            def fwd(params, x, x2):
                y, _ = dcscn.apply(params, x, x2, cfg, training=False,
                                   bn_state=bn, compute_dtype=cdt)
                return y

            return jax.jit(fwd)

        def fwd_ens(params, x_img, x2_img):
            # x_img [h,w,1], x2_img [H,W,1]
            batch_a, batch_b = flips.make_ensemble_batch(x_img, ensemble)
            x2_a, x2_b = flips.make_ensemble_batch(x2_img, ensemble)
            if batch_b is not None and x_img.shape[0] == x_img.shape[1]:
                # square input: all 8 transforms share one shape -> ONE pass
                n_a = batch_a.shape[0]
                out, _ = dcscn.apply(
                    params, jnp.concatenate([batch_a, batch_b], axis=0),
                    jnp.concatenate([x2_a, x2_b], axis=0), cfg,
                    training=False, bn_state=bn, compute_dtype=cdt)
                out_a, out_b = out[:n_a], out[n_a:]
            else:
                out_a, _ = dcscn.apply(params, batch_a, x2_a, cfg, training=False,
                                       bn_state=bn, compute_dtype=cdt)
                out_b = None
                if batch_b is not None:
                    out_b, _ = dcscn.apply(params, batch_b, x2_b, cfg, training=False,
                                           bn_state=bn, compute_dtype=cdt)
            total = flips.invert_ensemble_batch(out_a, out_b)
            return total / float(ensemble)

        return jax.jit(fwd_ens)

    def _tiled_fn(self, ensemble: int, own_h: int, own_w: int,
                  members: Optional[Tuple[int, ...]] = None):
        """Jitted fn (params, batch [N,h,w,1], batch2 [N,H,W,1], offs [N,2])
        -> per-tile ensembled outputs cropped to their OWNED regions
        [N, own_h, own_w, 1] (HR units), all in ONE dispatch.

        With ``members`` (a subset of flips 0..3) the fn instead returns the
        un-normalized SUM over exactly those dihedral members — the caller
        combines two such sums (original + transposed image) into a full
        8-member ensemble for non-square windows in TWO dispatches total.

        Two fusions relative to the reference loop (DCSCN.py:559-573):
        - the 8 dihedral variants of each *window* are generated on device
          and consumed by a `lax.scan` over the ensemble index (model traced
          once). Exactness: a dihedral transform of a shifted window of the
          image IS a shifted window of the transformed image (borders map to
          borders), so per-window ensembling equals whole-image ensembling.
          Requires square windows when ensemble > 4 (transposed members).
        - each tile's owned output region is cropped on device (offs are
          per-tile HR offsets into the window), so only own_h*own_w pixels
          per tile cross the device->host link instead of the whole halo'd
          window (~3x less transfer at tile 48 / L12 halo)."""
        cfg = self.cfg
        cdt = self.compute_dtype
        bn = self.bn_state

        def _t(v):
            return jnp.transpose(v, (0, 2, 1, 3))

        # forward dihedral transforms on an [N,H,W,C] batch (axes 1,2), same
        # tables as ops/flips.py for single images
        fwd_branches = [
            lambda v: v,
            lambda v: v[:, ::-1],
            lambda v: v[:, :, ::-1],
            lambda v: v[:, ::-1, ::-1],
            lambda v: _t(v)[:, ::-1],        # rot90
            lambda v: _t(v)[:, :, ::-1],     # rot90(-1)
            lambda v: _t(v),                 # flipud(rot90)
            lambda v: _t(v)[:, ::-1, ::-1],  # flipud(rot90(-1))
        ]
        inv_branches = [
            lambda v: v,
            lambda v: v[:, ::-1],
            lambda v: v[:, :, ::-1],
            lambda v: v[:, ::-1, ::-1],
            lambda v: _t(v)[:, :, ::-1],
            lambda v: _t(v)[:, ::-1],
            lambda v: _t(v),
            lambda v: _t(v[:, ::-1, ::-1]),
        ]

        def crop_own(out, offs):
            def one(o, t):
                return jax.lax.dynamic_slice(
                    t, (o[0], o[1], 0), (own_h, own_w, t.shape[-1]))

            return jax.vmap(one)(offs, out)

        def fwd(params, batch, batch2, offs):
            if members is None and ensemble <= 1:
                y, _ = dcscn.apply(params, batch, batch2, cfg, training=False,
                                   bn_state=bn, compute_dtype=cdt)
                return crop_own(y, offs)

            # slice the branch tables: lax.switch traces EVERY branch, and
            # the transposed branches (4-7) only shape-check for square
            # windows (members mode and ensemble <= 4 never reach them)
            if members is not None:
                fb = fwd_branches[:4]
                ib = inv_branches[:4]
                idxs = jnp.asarray(members, jnp.int32)
            else:
                fb = fwd_branches[:ensemble]
                ib = inv_branches[:ensemble]
                idxs = jnp.arange(ensemble, dtype=jnp.int32)

            def body(acc, i):
                xi = jax.lax.switch(i, fb, batch)
                x2i = jax.lax.switch(i, fb, batch2)
                yi, _ = dcscn.apply(params, xi, x2i, cfg, training=False,
                                    bn_state=bn, compute_dtype=cdt)
                return acc + jax.lax.switch(i, ib, yi), None

            acc, _ = jax.lax.scan(
                body, jnp.zeros(batch2.shape, batch2.dtype), idxs)
            if members is not None:
                return crop_own(acc, offs)  # raw sum; caller normalizes
            return crop_own(acc / float(ensemble), offs)

        return jax.jit(fwd)

    def _get_fn(self, key, builder):
        fn = self._fns.get(key)
        if fn is None:
            fn = builder()
            self._fns[key] = fn
        return fn

    def _dispatch_deferred(self, fn, *args, retries: int = 2, params=None):
        """Submit a compiled forward WITHOUT blocking and return a thunk
        that materializes the result (np.asarray) on call.

        jax dispatch is asynchronous: issuing many forwards before the first
        materialization lets the runtime pipeline host->device transfers and
        compute across dispatches, which is the whole ballgame when every
        dispatch carries ~50 ms of relay latency (results/r3 profile).
        Transient runtime failures (remote TPU runtimes occasionally surface
        FAILED_PRECONDITION on a healthy program) are retried by re-issuing;
        params are immutable here so that is safe."""
        import jax.errors

        if params is None:
            params = self.params
        state = {}
        try:
            state["dev"] = fn(params, *args)
        except jax.errors.JaxRuntimeError:  # pragma: no cover - transient
            pass  # re-issued with backoff in materialize()

        def materialize():
            last = None
            for attempt in range(retries + 1):
                try:
                    if "dev" not in state:
                        state["dev"] = fn(params, *args)
                    return np.asarray(state.pop("dev"))
                except jax.errors.JaxRuntimeError as e:  # pragma: no cover
                    state.pop("dev", None)
                    last = e
                    if attempt < retries:
                        time.sleep(1.0 + attempt)
            raise last

        return materialize

    def _dispatch(self, fn, *args, retries: int = 2, params=None):
        """Blocking dispatch (issue + materialize) with transient retry."""
        return self._dispatch_deferred(fn, *args, retries=retries,
                                       params=params)()

    def _spatial_mesh(self, n: int):
        """A (1, n) mesh and params replicated over it (both cached)."""
        cached = self._fns.get(("mesh", n))
        if cached is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from dcscn_tpu.parallel import mesh as mesh_mod

            mesh = (self._mesh if self._mesh is not None and n == self.n_spatial
                    else mesh_mod.make_mesh(1, n))
            params = jax.device_put(jax.device_get(self.params),
                                    NamedSharding(mesh, P()))
            cached = (mesh, params)
            self._fns[("mesh", n)] = cached
        return cached

    # ------------------------------------------------------------------
    def run(
        self,
        input_image: np.ndarray,
        bicubic_input_image: Optional[np.ndarray] = None,
        self_ensemble: Optional[int] = None,
    ) -> np.ndarray:
        """Reference `do()` semantics (DCSCN.py:547-586): [h,w,1] float Y in
        0..255 -> [h*s, w*s, 1] float output in 0..255."""
        return self._run_deferred(input_image, bicubic_input_image,
                                  self_ensemble)()

    def _run_deferred(
        self,
        input_image: np.ndarray,
        bicubic_input_image: Optional[np.ndarray] = None,
        self_ensemble: Optional[int] = None,
    ):
        """`run`, split into an eager submission phase and a returned thunk
        that materializes the result. Issuing many images' dispatches before
        materializing any of them pipelines transfer/compute across images
        (see `_dispatch_deferred`); `run_many` builds on this."""
        cfg = self.cfg
        ensemble = cfg.self_ensemble if self_ensemble is None else self_ensemble
        ensemble = max(1, min(int(ensemble), 8))  # flag range is [1, 8]
        if input_image.ndim == 2:
            input_image = input_image[:, :, None]

        if bicubic_input_image is None:
            bicubic_input_image = resize_ops.resize_image(
                input_image, cfg.scale, method="bicubic"
            )
        if cfg.max_value != 255.0:
            input_image = np.multiply(input_image, cfg.max_value / 255.0)
            bicubic_input_image = np.multiply(bicubic_input_image, cfg.max_value / 255.0)

        if cfg.tile_size > 0:
            fin = self._run_tiled_deferred(input_image, bicubic_input_image, ensemble)
        elif self._mesh is not None:
            # spatial mode drives multi-dispatch logic of its own: keep sync
            x, x2 = input_image, bicubic_input_image
            fin = lambda: self._run_spatial(x, x2, ensemble)
        else:
            fin = self._run_whole_deferred(input_image, bicubic_input_image, ensemble)

        if cfg.max_value != 255.0:
            inner = fin
            fin = lambda: np.multiply(inner(), 255.0 / cfg.max_value)
        return fin

    # ------------------------------------------------------------------
    def run_many(
        self,
        inputs,
        bicubic_inputs=None,
        self_ensemble: Optional[int] = None,
        strategy: str = "auto",
    ):
        """Batched-dataset inference: SR every image in `inputs` with the
        per-dispatch overhead amortized across the whole set.

        Two strategies:

        - ``pipeline`` (default): every image's dispatches are ISSUED before
          any result is materialized. jax dispatch is async, so transfers
          and compute of image i+1..n overlap the ~50 ms relay latency of
          image i's readback — the per-image path's programs are reused
          bit-for-bit, so outputs are identical to `run`.
        - ``group``: images sharing an identical tile layout (e.g. all 100
          bsd100 images) are packed into one canvas upload + one window
          gather + one chunked model dispatch (HBM-capped at
          `_MAX_GROUP_WINDOWS` windows per dispatch). Fewer, bigger
          dispatches; kept for A/B measurement and relay profiles where
          submission itself is expensive.

        ``auto`` resolves to ``pipeline`` (measured faster both warm and
        cold on bsd100, results/r4/bench_run_many.json). Non-square windows
        with ensemble > 4 are handled by both strategies via the
        two-dispatch transposed-sum scheme (see `_run_tiled_deferred`).
        Returns a list of [h*s, w*s, 1] float outputs in input order.
        """
        cfg = self.cfg
        ensemble = cfg.self_ensemble if self_ensemble is None else self_ensemble
        ensemble = max(1, min(int(ensemble), 8))
        xs = [x[:, :, None] if x.ndim == 2 else x for x in inputs]
        if bicubic_inputs is None:
            bicubic_inputs = [resize_ops.resize_image(x, cfg.scale, method="bicubic")
                              for x in xs]
        x2s = list(bicubic_inputs)

        results: List[Optional[np.ndarray]] = [None] * len(xs)
        if strategy == "auto":
            strategy = "pipeline"
        if (strategy != "group" or cfg.tile_size <= 0 or self.n_spatial > 1
                or len(xs) < 2):
            # sliding window of in-flight images: deep enough to hide the
            # per-dispatch relay latency, bounded so device buffers for
            # pending images never grow with dataset size
            from collections import deque

            pending: deque = deque()
            out: List[np.ndarray] = []
            for x, x2 in zip(xs, x2s):
                pending.append(self._run_deferred(x, x2, self_ensemble=ensemble))
                if len(pending) > _MAX_INFLIGHT:
                    out.append(pending.popleft()())
            out.extend(p() for p in pending)
            return out

        # group images by exact tile layout (window + owned-block sizes)
        groups: Dict[Tuple, List[int]] = {}
        layouts = []
        for i, x in enumerate(xs):
            layout = self._tile_layout(x.shape[0], x.shape[1])
            layouts.append(layout)
            groups.setdefault(layout[0], []).append(i)

        for key, members in groups.items():
            if len(members) < 2:
                for i in members:
                    results[i] = self.run(xs[i], x2s[i], self_ensemble=ensemble)
                continue
            # HBM cap: split oversized groups at image boundaries so one
            # dispatch never gathers more than _MAX_GROUP_WINDOWS windows
            subsets, sub, count = [], [], 0
            for i in members:
                c = len(layouts[i][1])
                if sub and count + c > _MAX_GROUP_WINDOWS:
                    subsets.append(sub)
                    sub, count = [], 0
                sub.append(i)
                count += c
            subsets.append(sub)
            for sub in subsets:
                outs = self._run_tiled_group(
                    [xs[i] for i in sub], [x2s[i] for i in sub],
                    [layouts[i] for i in sub], ensemble)
                for i, out in zip(sub, outs):
                    results[i] = out
        return results

    def _run_tiled_group(self, xs, x2s, layouts, ensemble):
        """One canvas + one gather + one chunked model dispatch for a group
        of images with identical tile layouts (see run_many). Non-square
        windows with ensemble > 4 run as TWO group dispatches (members 0-3
        on the originals + the transposed flip-subset on the transposed
        images, summed — same identity as `_run_tiled_deferred`), both
        issued before either materializes."""
        win_h, win_w, _own_h, _own_w = layouts[0][0]
        if ensemble > 4 and win_h != win_w:
            fin_a = self._group_dispatch(xs, x2s, layouts, members=(0, 1, 2, 3))
            xts = [np.ascontiguousarray(np.transpose(x, (1, 0, 2))) for x in xs]
            x2ts = [np.ascontiguousarray(np.transpose(x2, (1, 0, 2))) for x2 in x2s]
            layouts_t = [self._tile_layout(x.shape[0], x.shape[1]) for x in xts]
            fin_b = self._group_dispatch(xts, x2ts, layouts_t,
                                         members=_transposed_members(ensemble))
            outs_a, outs_b = fin_a(), fin_b()
            return [_combine_transposed_sum(a, b, ensemble)
                    for a, b in zip(outs_a, outs_b)]
        return self._group_dispatch(xs, x2s, layouts, ensemble=ensemble)()

    def _group_dispatch(self, xs, x2s, layouts, ensemble: int = 1,
                        members: Optional[Tuple[int, ...]] = None):
        """Deferred canvas+gather+chunked-dispatch over one image group;
        returns a thunk producing the per-image assembled outputs (ensemble
        MEAN, or raw member SUM when `members` is given)."""
        cfg = self.cfg
        s = cfg.scale
        win_h, win_w, own_h, own_w = layouts[0][0]
        scale_pre = cfg.max_value / 255.0 if cfg.max_value != 255.0 else None

        # stack the LR images into one [sum(h), max(w)] canvas (and the HR
        # bicubics into its s-scaled twin); windows never straddle images
        # because every origin keeps the window inside its own image
        heights = [x.shape[0] for x in xs]
        widths = [x.shape[1] for x in xs]
        canvas = np.zeros((sum(heights), max(widths), 1), np.float32)
        canvas2 = np.zeros((sum(heights) * s, max(widths) * s, 1), np.float32)
        row_off = []
        r = 0
        for x, x2 in zip(xs, x2s):
            canvas[r : r + x.shape[0], : x.shape[1]] = x
            canvas2[r * s : (r + x.shape[0]) * s, : x.shape[1] * s] = x2
            row_off.append(r)
            r += x.shape[0]
        if scale_pre is not None:
            canvas *= scale_pre
            canvas2 *= scale_pre

        origins, offs, counts = [], [], []
        for (_, img_origins, img_offs, _), off in zip(layouts, row_off):
            origins.extend((ws_r + off, ws_c) for ws_r, ws_c in img_origins)
            offs.extend(img_offs)
            counts.append(len(img_origins))
        n = len(origins)

        chunk = _GROUP_CHUNK
        n_chunks = _bucket(-(-n // chunk))
        n_pad = n_chunks * chunk
        origin_arr = np.zeros((n_pad, 2), np.int32)
        origin_arr[:n] = np.asarray(origins, np.int32)
        offs_arr = np.zeros((n_pad, 2), np.int32)
        offs_arr[:n] = np.asarray(offs, np.int32)

        from dcscn_tpu.ops import pallas_kernels

        rows_i = jnp.asarray(origin_arr[:, 0])
        cols_i = jnp.asarray(origin_arr[:, 1])
        batch = pallas_kernels.gather_windows(
            jnp.asarray(canvas), rows_i, cols_i, win_h, win_w)
        batch2 = pallas_kernels.gather_windows(
            jnp.asarray(canvas2), rows_i * s, cols_i * s, win_h * s, win_w * s)
        mode_key = ("m",) + members if members is not None else ensemble
        fn = self._get_fn(
            ("tilemany", n_chunks, chunk, win_h, win_w, mode_key, own_h, own_w),
            lambda: self._tiled_many_fn(ensemble, s * own_h, s * own_w,
                                        chunk, n_chunks, members=members))
        fin = self._dispatch_deferred(fn, batch, batch2, jnp.asarray(offs_arr))

        def finish():
            out = fin()[:n]
            if scale_pre is not None:
                out = out * (1.0 / scale_pre)
            results = []
            k = 0
            for x, (_, _, _, slots), cnt in zip(xs, layouts, counts):
                h, w = x.shape[:2]
                result = np.zeros((h * s, w * s, 1), np.float32)
                for tile_out, (o_r, o_c) in zip(out[k : k + cnt], slots):
                    result[s * o_r : s * (o_r + own_h),
                           s * o_c : s * (o_c + own_w), :] = tile_out
                results.append(result)
                k += cnt
            return results

        return finish

    def _tiled_many_fn(self, ensemble: int, own_h: int, own_w: int,
                       chunk: int, n_chunks: int,
                       members: Optional[Tuple[int, ...]] = None):
        """Jitted fn over a whole image-group's window batch: lax.map of the
        single-chunk tiled program (`_tiled_fn`, inlined) over fixed-size
        chunks — the entire dataset group runs in ONE dispatch."""
        inner = self._tiled_fn(ensemble, own_h, own_w, members=members)

        def fwd(params, batch, batch2, offs):
            bs = batch.reshape((n_chunks, chunk) + batch.shape[1:])
            b2s = batch2.reshape((n_chunks, chunk) + batch2.shape[1:])
            os_ = offs.reshape(n_chunks, chunk, 2)

            def one(args):
                b, b2, o = args
                return inner(params, b, b2, o)

            outs = jax.lax.map(one, (bs, b2s, os_))
            return outs.reshape((n_chunks * chunk, own_h, own_w) + outs.shape[4:])

        return jax.jit(fwd)

    # ------------------------------------------------------------------
    def _run_whole(self, x: np.ndarray, x2: np.ndarray, ensemble: int) -> np.ndarray:
        return self._run_whole_deferred(x, x2, ensemble)()

    def _run_whole_deferred(self, x: np.ndarray, x2: np.ndarray, ensemble: int):
        h, w = x.shape[:2]
        if ensemble > 1:
            fn = self._get_fn(("ens", h, w, ensemble), lambda: self._forward_fn(ensemble))
            return self._dispatch_deferred(fn, jnp.asarray(x, jnp.float32),
                                           jnp.asarray(x2, jnp.float32))
        fn = self._get_fn(("fwd", 1, h, w), lambda: self._forward_fn(1))
        fin = self._dispatch_deferred(
            fn,
            jnp.asarray(x, jnp.float32)[None],
            jnp.asarray(x2, jnp.float32)[None],
        )
        return lambda: fin()[0]

    # ------------------------------------------------------------------
    def _spatial_plan(self, h: int) -> Tuple[int, int]:
        """Largest feasible spatial split (n, pad) for an H-row image:
        n <= n_spatial devices, band = ceil(h/n), pad = n*band - h, subject
        to the halo-exchange constraint band >= 2*halo + pad (and the window
        fitting the image). n=1 means fall back to single-device whole."""
        halo = self.halo_lr
        for n in range(self.n_spatial, 1, -1):
            band = math.ceil(h / n)
            pad = n * band - h
            if band >= 2 * halo + pad and h >= band + 2 * halo:
                return n, pad
        return 1, 0

    def _run_spatial(self, x: np.ndarray, x2: np.ndarray, ensemble: int) -> np.ndarray:
        """Whole-image inference with rows sharded over the spatial mesh
        (halo exchange over ICI; bit-identical to single-device whole-image
        — see parallel/spatial.py). The dihedral self-ensemble is fused into
        the same spatially-sharded dispatch (members generated on device,
        lax.scan over the member index) when the padding/shape constraints
        allow; otherwise members run as flipped whole images, per-member."""
        cfg = self.cfg
        s = cfg.scale
        h, w = x.shape[:2]
        n, pad = self._spatial_plan(h)
        if ensemble > 1:
            if n <= 1:
                # image too short to split: batched whole-image ensemble
                return self._run_whole(x, x2, ensemble)
            if pad == 0 and (ensemble <= 4 or h == w):
                # fused: ONE dispatch for all members (spatial_ensemble_fn)
                from dcscn_tpu.parallel import spatial as spatial_mod

                mesh, params = self._spatial_mesh(n)
                fn = self._get_fn(
                    ("spatial_ens", n, h, w, ensemble),
                    lambda: spatial_mod.spatial_ensemble_fn(
                        cfg, mesh, ensemble, halo=self.halo_lr,
                        compute_dtype=self.compute_dtype,
                        bn_state=self.bn_state))
                return self._dispatch(fn, jnp.asarray(x, jnp.float32),
                                      jnp.asarray(x2, jnp.float32),
                                      params=params)
            if pad == 0:
                # non-square + transposed members: TWO fused member-sum
                # dispatches (same dihedral identity as _run_tiled_deferred)
                # when the transposed orientation also splits cleanly
                n_t, pad_t = self._spatial_plan(w)
                if n_t > 1 and pad_t == 0:
                    from dcscn_tpu.parallel import spatial as spatial_mod

                    mesh, params = self._spatial_mesh(n)
                    fn_a = self._get_fn(
                        ("spatial_ens", n, h, w, ("m", 0, 1, 2, 3)),
                        lambda: spatial_mod.spatial_ensemble_fn(
                            cfg, mesh, 4, halo=self.halo_lr,
                            compute_dtype=self.compute_dtype,
                            bn_state=self.bn_state, members=(0, 1, 2, 3)))
                    fin_a = self._dispatch_deferred(
                        fn_a, jnp.asarray(x, jnp.float32),
                        jnp.asarray(x2, jnp.float32), params=params)
                    mb = _transposed_members(ensemble)
                    mesh_t, params_t = self._spatial_mesh(n_t)
                    fn_b = self._get_fn(
                        ("spatial_ens", n_t, w, h, ("m",) + mb),
                        lambda: spatial_mod.spatial_ensemble_fn(
                            cfg, mesh_t, len(mb), halo=self.halo_lr,
                            compute_dtype=self.compute_dtype,
                            bn_state=self.bn_state, members=mb))
                    xt = np.ascontiguousarray(np.transpose(x, (1, 0, 2)))
                    x2t = np.ascontiguousarray(np.transpose(x2, (1, 0, 2)))
                    fin_b = self._dispatch_deferred(
                        fn_b, jnp.asarray(xt, jnp.float32),
                        jnp.asarray(x2t, jnp.float32), params=params_t)
                    return _combine_transposed_sum(fin_a(), fin_b(), ensemble)
            acc = None
            for i in range(ensemble):
                xi = np.ascontiguousarray(flips.flip(x, i))
                x2i = np.ascontiguousarray(flips.flip(x2, i))
                yi = self._run_spatial(xi, x2i, 1)
                yi = flips.flip(yi, i, invert=True)
                acc = yi if acc is None else acc + yi
            return acc / float(ensemble)

        if n <= 1:
            return self._run_whole(x, x2, 1)

        from dcscn_tpu.parallel import spatial as spatial_mod

        mesh, params = self._spatial_mesh(n)
        fn = self._get_fn(
            ("spatial", n, pad, h, w),
            lambda: spatial_mod.spatial_forward_fn(
                cfg, mesh, halo=self.halo_lr, compute_dtype=self.compute_dtype,
                bn_state=self.bn_state, pad=pad))
        xp = np.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
        x2p = np.pad(x2, ((0, pad * s), (0, 0), (0, 0))) if pad else x2
        out = self._dispatch(fn, jnp.asarray(xp, jnp.float32),
                             jnp.asarray(x2p, jnp.float32), params=params)
        return out[: h * s]

    # ------------------------------------------------------------------
    def _tile_layout(self, h: int, w: int):
        """Static tiling layout for an [h, w] LR image.

        Returns ((win_h, win_w, own_h, own_w), origins, offs, slots):
        window sizes, per-window LR window origins, per-window HR crop
        offsets into the window, and per-window LR owned-block starts.

        Uniform owned regions: every tile owns an own_h x own_w block with
        clamped start o = min(a, size - own) — border tiles' blocks overlap
        their neighbor's, but overlapping pixels are bit-identical (both
        windows reproduce the whole-image value), so writes commute.
        When a single window spans the whole axis (size <= interior+2*halo)
        it must own the full axis, not just `interior` of it — otherwise
        the tail rows/cols in (interior, size] are never written.
        """
        cfg = self.cfg
        s = cfg.scale
        halo = self.halo_lr
        interior = max(cfg.tile_size, 8)
        rows = _tile_plan(h, interior, halo)
        cols = _tile_plan(w, interior, halo)
        win_h = min(h, interior + 2 * halo)
        win_w = min(w, interior + 2 * halo)
        own_h = h if len(rows) == 1 else interior
        own_w = w if len(cols) == 1 else interior
        origins, offs, slots = [], [], []
        for ws_r, a_r, _b_r in rows:
            for ws_c, a_c, _b_c in cols:
                o_r = max(min(a_r, h - own_h), 0)
                o_c = max(min(a_c, w - own_w), 0)
                origins.append((ws_r, ws_c))
                offs.append((s * (o_r - ws_r), s * (o_c - ws_c)))
                slots.append((o_r, o_c))
        return (win_h, win_w, own_h, own_w), origins, offs, slots

    # ------------------------------------------------------------------
    def _run_tiled(self, x: np.ndarray, x2: np.ndarray, ensemble: int) -> np.ndarray:
        return self._run_tiled_deferred(x, x2, ensemble)()

    def _run_tiled_deferred(self, x: np.ndarray, x2: np.ndarray, ensemble: int):
        """Exact tiled inference (deferred: returns a materializing thunk).
        Ensemble members are generated per-WINDOW on device and fused into
        the same dispatch (`_tiled_fn`); the result equals whole-image
        ensemble output (see that docstring).

        Non-square windows with transposed members (ensemble > 4) run in
        TWO dispatches instead of the 8 sequential per-member passes of
        rounds 1-3 (and of the reference, DCSCN.py:559-573): members 0-3
        sum in one tiled pass on x, and members 4..e-1 equal the TRANSPOSE
        of the flip-subset `_T_MEMBER` sum over the tiled pass on x^T —
        dihedral identity: inv_j(f(fwd_j(x))) == T(flip_m(f(flip_m(T(x)))))
        with m = _T_MEMBER[j], since fwd_j = flip_m ∘ T and the flips are
        involutions. Both dispatches are issued before either materializes.
        """
        cfg = self.cfg
        halo = self.halo_lr
        interior = max(cfg.tile_size, 8)
        h, w = x.shape[:2]
        win_h = min(h, interior + 2 * halo)
        win_w = min(w, interior + 2 * halo)

        if ensemble > 4 and win_h != win_w:
            fin_a = self._tiled_dispatch(x, x2, members=(0, 1, 2, 3))
            xt = np.ascontiguousarray(np.transpose(x, (1, 0, 2)))
            x2t = np.ascontiguousarray(np.transpose(x2, (1, 0, 2)))
            fin_b = self._tiled_dispatch(xt, x2t,
                                         members=_transposed_members(ensemble))

            def finish():
                return _combine_transposed_sum(fin_a(), fin_b(), ensemble)

            return finish

        return self._tiled_dispatch(x, x2, ensemble=ensemble)

    def _tiled_dispatch(self, x: np.ndarray, x2: np.ndarray, ensemble: int = 1,
                        members: Optional[Tuple[int, ...]] = None):
        """Deferred single tiled pass: gather windows, one model dispatch,
        thunk assembles owned blocks into the [h*s, w*s, 1] output (ensemble
        MEAN, or raw member SUM when `members` is given)."""
        cfg = self.cfg
        s = cfg.scale
        h, w = x.shape[:2]
        (win_h, win_w, own_h, own_w), origins, offs, slots = \
            self._tile_layout(h, w)

        n = len(slots)
        # bucket the tile count so every image reuses one compiled program;
        # padded slots re-gather window (0, 0) (in-bounds, discarded)
        n_pad = _bucket(n)
        if self.n_spatial > 1:
            # tile batch shards across the mesh: pad count to a multiple
            n_pad = -(-n_pad // self.n_spatial) * self.n_spatial
        origin_arr = np.zeros((n_pad, 2), np.int32)
        origin_arr[:n] = np.asarray(origins, np.int32)
        offs_arr = np.zeros((n_pad, 2), np.int32)
        offs_arr[:n] = np.asarray(offs, np.int32)

        # windows are assembled ON DEVICE: one linear image upload, then an
        # XLA vmapped dynamic_slice gather (20x faster than host assembly,
        # measured — see ops/pallas_kernels.py)
        from dcscn_tpu.ops import pallas_kernels

        x_dev = jnp.asarray(x, jnp.float32)
        x2_dev = jnp.asarray(x2, jnp.float32)
        rows_i = jnp.asarray(origin_arr[:, 0])
        cols_i = jnp.asarray(origin_arr[:, 1])
        batch = pallas_kernels.gather_windows(x_dev, rows_i, cols_i, win_h, win_w)
        batch2 = pallas_kernels.gather_windows(
            x2_dev, rows_i * s, cols_i * s, win_h * s, win_w * s)
        params = None
        if self.n_spatial > 1:
            # independent tiles = embarrassing parallelism: shard the tile
            # batch over the mesh so each device runs n_pad/n tiles
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh, params = self._spatial_mesh(self.n_spatial)
            shard = NamedSharding(mesh, P("spatial", None, None, None))
            batch = jax.device_put(batch, shard)
            batch2 = jax.device_put(batch2, shard)
        mode_key = ("m",) + members if members is not None else ensemble
        fn = self._get_fn(
            ("tile", n_pad, win_h, win_w, mode_key, own_h, own_w),
            lambda: self._tiled_fn(ensemble, s * own_h, s * own_w,
                                   members=members))
        offs_dev = jnp.asarray(offs_arr)
        if params is not None:
            # keep all operands on the mesh's device set
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh, _ = self._spatial_mesh(self.n_spatial)
            offs_dev = jax.device_put(
                offs_dev, NamedSharding(mesh, P("spatial", None)))
        fin = self._dispatch_deferred(fn, batch, batch2, offs_dev, params=params)

        def finish():
            out = fin()[:n]
            result = np.zeros((h * s, w * s, 1), dtype=np.float32)
            for tile_out, (o_r, o_c) in zip(out, slots):
                result[s * o_r : s * (o_r + own_h),
                       s * o_c : s * (o_c + own_w), :] = tile_out
            return result

        return finish
