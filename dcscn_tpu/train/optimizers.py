"""Optimizer construction matching the reference's semantics
(DCSCN.py:379-413) on optax:

- optimizer in {gd, adadelta, adagrad, adam, momentum, rmsprop}
- adam uses (beta1, beta2, epsilon) flags; momentum/rmsprop use `momentum`
- global-norm gradient clipping at `clipping_norm` BEFORE the optimizer
  update (tf.clip_by_global_norm at DCSCN.py:406-409)
- the learning rate is a per-step input (the reference feeds an lr
  placeholder, DCSCN.py:339): we expose it via optax.inject_hyperparams so
  the staircase schedule updates opt_state.hyperparams['learning_rate']
  without recompilation.

TF-default internals that differ slightly in optax are noted inline.
"""

from __future__ import annotations

import optax

from dcscn_tpu.config import Config


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    def build(learning_rate):
        txs = []
        if cfg.clipping_norm > 0:
            txs.append(optax.clip_by_global_norm(cfg.clipping_norm))
        name = cfg.optimizer
        if name == "gd":
            txs.append(optax.sgd(learning_rate))
        elif name == "adadelta":
            # TF AdadeltaOptimizer defaults rho=0.95, eps=1e-8
            txs.append(optax.adadelta(learning_rate, rho=0.95, eps=1e-8))
        elif name == "adagrad":
            # TF AdagradOptimizer default initial_accumulator_value=0.1
            txs.append(optax.adagrad(learning_rate, initial_accumulator_value=0.1))
        elif name == "adam":
            txs.append(optax.adam(learning_rate, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.epsilon))
        elif name == "momentum":
            txs.append(optax.sgd(learning_rate, momentum=cfg.momentum))
        elif name == "rmsprop":
            # TF RMSPropOptimizer defaults decay=0.9, eps=1e-10
            txs.append(optax.rmsprop(learning_rate, decay=0.9, eps=1e-10,
                                     momentum=cfg.momentum))
        else:
            raise ValueError(
                "Optimizer arg should be one of [gd, adadelta, adagrad, adam, momentum, rmsprop]."
            )
        return optax.chain(*txs)

    return optax.inject_hyperparams(build)(learning_rate=cfg.initial_lr)


def set_learning_rate(opt_state, lr: float):
    """Update the injected hyperparam (staircase schedule step).

    Assign a CONCRETE f32 array, matching the aval inject_hyperparams
    initialized — a raw Python float (weak type) would change the
    opt_state pytree's aval and force one full retrace of the jitted
    train step at the first LR decay (minutes per program on this TPU).
    """
    import jax.numpy as jnp

    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state
