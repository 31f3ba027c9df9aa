"""Jitted training: loss, train step, on-device epoch scan, DP sharding.

Loss (reference: DCSCN.py:334-367): diff = y_-y; mse always; image_loss is
MSE or L1 (`use_l1_loss`); plus l2_decay * sum(tf.nn.l2_loss(W)) over conv
kernels (tf l2_loss = sum(w^2)/2; biases/PReLU excluded, DCSCN.py:349-355).
Note: in depthwise-separable mode the reference's decay list contains only
the *unused* dense kernels (tf_graph.py:183-187, :212), i.e. no effective
decay on live weights; we decay the live depthwise/pointwise kernels instead
(documented deviation).

TPU-first data path: the whole patch store lives on device as uint8; a
train step gathers its minibatch by indices, normalizes, and runs
forward+backward in one XLA program — zero per-step host->device transfers
(the reference feeds numpy per step, train.py:80-81 / DCSCN.py:415-425).
`train_epoch_scan` goes further and lax.scan's S steps per dispatch, hiding
host/tunnel latency entirely.

Data parallelism: with a Mesh, the patch store and minibatch indices shard
over the 'data' axis; params/opt-state are replicated and XLA inserts the
gradient all-reduce over ICI from the output shardings.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn
from dcscn_tpu.train import optimizers


class Batch(NamedTuple):
    x: jnp.ndarray  # [N, B, B, 1] LR input
    x2: jnp.ndarray  # [N, B*s, B*s, 1] bicubic upscale
    y: jnp.ndarray  # [N, B*s, B*s, 1] ground truth


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    image_loss: jnp.ndarray
    mse: jnp.ndarray


def l2_penalty(params: Dict[str, Any], cfg: Config) -> jnp.ndarray:
    """l2_decay * sum(||w||^2 / 2) over conv kernels (DCSCN.py:349-355)."""
    if cfg.l2_decay <= 0:
        return jnp.float32(0.0)
    total = jnp.float32(0.0)
    for layer in params.values():
        for key in ("w", "dw", "pw"):
            if key in layer:
                total = total + 0.5 * jnp.sum(jnp.square(layer[key]))
    return cfg.l2_decay * total


def loss_fn(params, batch: Batch, cfg: Config, dropout_rng, bn_state, compute_dtype):
    def fwd(params, x, x2):
        return dcscn.apply(params, x, x2, cfg, training=True,
                           dropout_rng=dropout_rng, bn_state=bn_state,
                           compute_dtype=compute_dtype)

    if cfg.remat:
        # recompute activations in the backward pass (HBM for FLOPs)
        fwd = jax.checkpoint(fwd)
    y, new_bn = fwd(params, batch.x, batch.x2)
    diff = y - batch.y
    mse = jnp.mean(jnp.square(diff))
    image_loss = jnp.mean(jnp.abs(diff)) if cfg.use_l1_loss else mse
    loss = image_loss + l2_penalty(params, cfg)
    return loss, (mse, image_loss, new_bn)


class Trainer:
    """Owns optimizer + compiled steps for one Config."""

    def __init__(self, cfg: Config, mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.optimizer = optimizers.make_optimizer(cfg)
        self.mesh = mesh
        self.compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._train_step = None
        self._epoch_scan = None
        self._grad_sample = None

    def init_opt_state(self, params):
        return self.optimizer.init(params)

    def set_lr(self, opt_state, lr: float):
        return optimizers.set_learning_rate(opt_state, lr)

    # ------------------------------------------------------------------
    def _step_impl(self, params, opt_state, bn_state, batch: Batch, rng):
        (loss, (mse, image_loss, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, self.cfg, rng, bn_state, self.compute_dtype)
        updates, new_opt_state = self.optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, new_bn, StepMetrics(loss, image_loss, mse)

    def train_step(self):
        """Compiled single step on an explicit Batch (host-fed path,
        reference-equivalent train_batch)."""
        if self._train_step is None:
            self._train_step = jax.jit(self._step_impl, donate_argnums=(0, 1, 2))
        return self._train_step

    # ------------------------------------------------------------------
    def grad_sample(self):
        """Compiled observability probe: (params, bn_state, batch, rng) ->
        (grads, y_) on one minibatch, WITHOUT an optimizer update. Feeds the
        per-epoch gradient mean/stddev/histogram and output-tensor summaries
        the reference logs under --save_weights (DCSCN.py:238, :329,
        :397-404); one extra jitted grad eval per epoch keeps the fused
        epoch scan free of per-step summary plumbing."""
        if self._grad_sample is not None:
            return self._grad_sample
        cfg = self.cfg

        def fn(params, bn_state, batch: Batch, rng):
            def loss_and_y(p):
                y, _ = dcscn.apply(p, batch.x, batch.x2, cfg, training=True,
                                   dropout_rng=rng, bn_state=bn_state,
                                   compute_dtype=self.compute_dtype)
                diff = y - batch.y
                mse = jnp.mean(jnp.square(diff))
                image_loss = jnp.mean(jnp.abs(diff)) if cfg.use_l1_loss else mse
                return image_loss + l2_penalty(p, cfg), y

            (_, y), grads = jax.value_and_grad(loss_and_y, has_aux=True)(params)
            return grads, y

        self._grad_sample = jax.jit(fn)
        return self._grad_sample

    # ------------------------------------------------------------------
    def _gather_batch(self, store, idx):
        """Minibatch from the on-device uint8 patch store."""
        x = jnp.take(store["input"], idx, axis=0).astype(jnp.float32)
        x2 = jnp.take(store["interp"], idx, axis=0).astype(jnp.float32)
        y = jnp.take(store["true"], idx, axis=0).astype(jnp.float32)
        if self.cfg.max_value != 255.0:
            scale = self.cfg.max_value / 255.0
            x, x2, y = x * scale, x2 * scale, y * scale
        return Batch(x, x2, y)

    def epoch_scan(self):
        """Compiled multi-step run: (params, opt, bn, store, idx [S, N], rng)
        -> states + per-step metrics. One dispatch for S steps."""
        if self._epoch_scan is not None:
            return self._epoch_scan

        def scan_fn(params, opt_state, bn_state, store, idx, rng):
            def body(carry, step_in):
                params, opt_state, bn_state = carry
                step_idx, step_rng = step_in
                batch = self._gather_batch(store, step_idx)
                params, opt_state, bn_state, m = self._step_impl(
                    params, opt_state, bn_state, batch, step_rng
                )
                return (params, opt_state, bn_state), m

            steps = idx.shape[0]
            rngs = jax.random.split(rng, steps)
            (params, opt_state, bn_state), metrics = jax.lax.scan(
                body, (params, opt_state, bn_state), (idx, rngs)
            )
            return params, opt_state, bn_state, metrics

        self._epoch_scan = jax.jit(scan_fn, donate_argnums=(0, 1, 2))
        return self._epoch_scan

    # ------------------------------------------------------------------
    def shard_store(self, store: Dict[str, np.ndarray]):
        """Place the uint8 patch store on device. With a mesh the store is
        replicated per device and each device gathers only its minibatch
        shard (indices are sharded over 'data' via `shard_indices`), so the
        gather is local and the gradient all-reduce is the only collective.
        """
        if self.mesh is None:
            return {k: jax.device_put(v) for k, v in store.items()}
        replicated = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        return {k: jax.device_put(v, replicated) for k, v in store.items()}

    def shard_indices(self, idx: np.ndarray):
        """Shard [S, N] (or [N]) step indices over the 'data' axis."""
        if self.mesh is None:
            return jnp.asarray(idx)
        spec = (
            jax.sharding.PartitionSpec("data")
            if idx.ndim == 1
            else jax.sharding.PartitionSpec(None, "data")
        )
        return jax.device_put(idx, jax.sharding.NamedSharding(self.mesh, spec))

    def replicate(self, tree):
        if self.mesh is None:
            return jax.device_put(tree)
        repl = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
        return jax.device_put(tree, repl)
