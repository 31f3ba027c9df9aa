"""Training stack tests: loss semantics, optimizer parity, epoch scan vs
per-step loop, LR staircase."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn
from dcscn_tpu.train import optimizers, trainer as trainer_mod
from dcscn_tpu.train.trainer import Batch, l2_penalty, loss_fn

CFG = Config(layers=2, filters=6, min_filters=4, nin_filters=6, nin_filters2=4,
             dropout_rate=1.0, batch_num=4, batch_image_size=8,
             l2_decay=1e-4, clipping_norm=5.0)


def _params(cfg=CFG, seed=0):
    return dcscn.init_params(jax.random.PRNGKey(seed), cfg)


def _batch(cfg=CFG, seed=1, n=4):
    rng = np.random.default_rng(seed)
    b, s = cfg.batch_image_size, cfg.scale
    x = rng.uniform(0, 255, (n, b, b, 1)).astype(np.float32)
    x2 = rng.uniform(0, 255, (n, b * s, b * s, 1)).astype(np.float32)
    y = x2 + rng.normal(0, 5, x2.shape).astype(np.float32)
    return Batch(jnp.asarray(x), jnp.asarray(x2), jnp.asarray(y))


def test_l2_penalty_matches_tf_l2_loss():
    params = _params()
    expected = 0.0
    for layer in params.values():
        for key in ("w", "dw", "pw"):
            if key in layer:
                expected += 0.5 * float(np.sum(np.square(np.asarray(layer[key]))))
    got = float(l2_penalty(params, CFG))
    assert abs(got - CFG.l2_decay * expected) < 1e-6 * max(1.0, expected)


def test_loss_l1_vs_mse():
    params = _params()
    batch = _batch()
    loss_mse, (mse, img_mse, _) = loss_fn(params, batch, CFG, None, None, jnp.float32)
    cfg_l1 = CFG.replace(use_l1_loss=True)
    loss_l1, (mse2, img_l1, _) = loss_fn(params, batch, cfg_l1, None, None, jnp.float32)
    assert abs(float(mse) - float(mse2)) < 1e-5
    assert float(img_mse) == pytest.approx(float(mse), rel=1e-6)
    assert float(img_l1) != pytest.approx(float(mse), rel=1e-2)


def test_training_reduces_loss():
    tr = trainer_mod.Trainer(CFG)
    params = _params()
    opt_state = tr.init_opt_state(params)
    batch = _batch()
    step = tr.train_step()
    rng = jax.random.PRNGKey(0)
    first = None
    for i in range(30):
        params, opt_state, _, m = step(params, opt_state, None, batch,
                                       jax.random.fold_in(rng, i))
        if first is None:
            first = float(m.loss)
    assert float(m.loss) < first


@pytest.mark.parametrize("name", ["gd", "momentum", "adagrad", "adadelta", "rmsprop", "adam"])
def test_all_optimizers_step(name):
    cfg = CFG.replace(optimizer=name)
    tr = trainer_mod.Trainer(cfg)
    params = _params(cfg)
    opt_state = tr.init_opt_state(params)
    step = tr.train_step()
    p2, _, _, m = step(params, opt_state, None, _batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(m.loss))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(p2[k]["w"]), np.asarray(_params(cfg)[k]["w"]))
        for k in p2 if "w" in p2[k]
    )
    assert moved


def test_adam_matches_torch_reference_step():
    """One adam step on a quadratic must match torch.optim.Adam (same
    hyperparams; TF/optax/torch adam share the same update rule)."""
    import torch

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, -1.5, 2.5], np.float32)
    lr, b1, b2, eps = 0.002, 0.9, 0.999, 1e-8

    import optax

    opt = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    state = opt.init(jnp.asarray(w0))
    updates, _ = opt.update(jnp.asarray(g), state, jnp.asarray(w0))
    ours = np.asarray(jnp.asarray(w0) + updates)

    wt = torch.tensor(w0, requires_grad=True)
    topt = torch.optim.Adam([wt], lr=lr, betas=(b1, b2), eps=eps)
    wt.grad = torch.tensor(g)
    topt.step()
    np.testing.assert_allclose(ours, wt.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_clipping_norm_applied():
    cfg = CFG.replace(clipping_norm=1e-9, l2_decay=0.0, optimizer="gd")
    tr = trainer_mod.Trainer(cfg)
    params = _params(cfg)
    opt_state = tr.init_opt_state(params)
    step = tr.train_step()
    p2, _, _, _ = step(params, opt_state, None, _batch(cfg), jax.random.PRNGKey(0))
    # with a tiny clip norm, updates are ~0
    for k in p2:
        if "w" in p2[k]:
            np.testing.assert_allclose(np.asarray(p2[k]["w"]),
                                       np.asarray(_params(cfg)[k]["w"]), atol=1e-6)


def test_epoch_scan_equals_step_loop():
    cfg = CFG
    store_np = {
        "input": np.random.default_rng(0).integers(0, 255, (32, 8, 8, 1), np.uint8),
        "interp": np.random.default_rng(1).integers(0, 255, (32, 16, 16, 1), np.uint8),
        "true": np.random.default_rng(2).integers(0, 255, (32, 16, 16, 1), np.uint8),
    }
    idx = np.arange(16, dtype=np.int32).reshape(4, 4)

    tr = trainer_mod.Trainer(cfg)
    params = _params()
    opt = tr.init_opt_state(params)
    store = {k: jnp.asarray(v) for k, v in store_np.items()}
    scan_fn = tr.epoch_scan()
    p_scan, o_scan, _, m = scan_fn(params, opt, None, store, jnp.asarray(idx),
                                   jax.random.PRNGKey(7))

    # replicate with explicit per-step calls
    tr2 = trainer_mod.Trainer(cfg)
    params2 = _params()
    opt2 = tr2.init_opt_state(params2)
    step = tr2.train_step()
    rngs = jax.random.split(jax.random.PRNGKey(7), 4)
    for i in range(4):
        batch = Batch(
            jnp.take(store["input"], jnp.asarray(idx[i]), axis=0).astype(jnp.float32),
            jnp.take(store["interp"], jnp.asarray(idx[i]), axis=0).astype(jnp.float32),
            jnp.take(store["true"], jnp.asarray(idx[i]), axis=0).astype(jnp.float32),
        )
        params2, opt2, _, m2 = step(params2, opt2, None, batch, rngs[i])

    for k in p_scan:
        for leaf in p_scan[k]:
            np.testing.assert_allclose(np.asarray(p_scan[k][leaf]),
                                       np.asarray(params2[k][leaf]), rtol=2e-5, atol=2e-6)
    assert float(m.mse[-1]) == pytest.approx(float(m2.mse), rel=1e-4)


def test_lr_staircase_total_epochs():
    cfg = Config()
    lr = cfg.initial_lr
    epochs = 0
    stage = 0
    while lr > cfg.end_lr:
        epochs += 1
        stage += 1
        if stage >= cfg.lr_decay_epoch:
            lr *= cfg.lr_decay
            stage = 0
    assert epochs == cfg.total_epochs == 63


def test_set_learning_rate():
    tr = trainer_mod.Trainer(CFG)
    opt = tr.init_opt_state(_params())
    opt = tr.set_lr(opt, 1e-3)
    assert float(opt.hyperparams["learning_rate"]) == pytest.approx(1e-3)


def test_remat_matches_no_remat():
    cfg = CFG.replace(remat=True)
    tr_r = trainer_mod.Trainer(cfg)
    tr_n = trainer_mod.Trainer(CFG)
    params = _params()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    p_r, _, _, m_r = tr_r.train_step()(params, tr_r.init_opt_state(params), None, batch, rng)
    params2 = _params()
    p_n, _, _, m_n = tr_n.train_step()(params2, tr_n.init_opt_state(params2), None, batch, rng)
    assert float(m_r.loss) == pytest.approx(float(m_n.loss), rel=1e-6)
    for k in p_r:
        for leaf in p_r[k]:
            np.testing.assert_allclose(np.asarray(p_r[k][leaf]),
                                       np.asarray(p_n[k][leaf]), rtol=1e-5, atol=1e-7)


def test_distributed_single_host_noop():
    from dcscn_tpu.parallel import distributed

    assert distributed.initialize() is False
    sl = distributed.host_local_batch_slice(16)
    assert sl == slice(0, 16)


def test_bf16_train_step_differentiable():
    """Mixed-precision training (f32 master weights, bf16 activations) must
    run: with bf16 operands the convs/dots must not request an f32
    accumulator output, whose VJP pairs an f32 cotangent with bf16 weights
    and is rejected by lax (caught by the round-5 bf16 A/B)."""
    import jax
    import jax.numpy as jnp

    from dcscn_tpu.config import Config
    from dcscn_tpu.models import dcscn
    from dcscn_tpu.train import trainer as trainer_mod

    cfg = Config(dtype="bfloat16", layers=3, filters=8, min_filters=4,
                 nin_filters=8, nin_filters2=4, batch_image_size=16)
    tr = trainer_mod.Trainer(cfg)
    assert tr.compute_dtype == jnp.bfloat16
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    b, s = cfg.batch_image_size, cfg.scale
    batch = trainer_mod.Batch(
        jnp.ones((2, b, b, 1), jnp.float32),
        jnp.ones((2, b * s, b * s, 1), jnp.float32),
        jnp.zeros((2, b * s, b * s, 1), jnp.float32))
    p2, _, _, m = tr._step_impl(params, tr.init_opt_state(params), None,
                                batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(m.loss)
    # master weights stay f32 after the update
    assert p2["CNN1"]["w"].dtype == jnp.float32
