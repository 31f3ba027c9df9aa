"""Fine-grained reference-semantics tests: initializers, activators,
bilinear upscale kernel, dropout scaling, BN formula."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcscn_tpu.models import dcscn


def test_upsample_filter_values():
    # reference formula (helper/utilty.py:366-374), verified by hand:
    # size 4 (scale 2): factor 2, center 1.5 -> 1 - |i-1.5|/2 per axis
    f = dcscn.upsample_filter(4)
    row = np.array([1 - abs(i - 1.5) / 2 for i in range(4)])
    np.testing.assert_allclose(f, np.outer(row, row))


def test_upscale_filter_size():
    # 2*scale - scale%2 (helper/utilty.py:377-378)
    assert dcscn.get_upscale_filter_size(2) == 4
    assert dcscn.get_upscale_filter_size(3) == 5
    assert dcscn.get_upscale_filter_size(4) == 8


def test_upscale_weight_diagonal():
    w = np.asarray(dcscn.upscale_weight(2, 3))
    assert w.shape == (4, 4, 3, 3)
    for i in range(3):
        np.testing.assert_allclose(w[:, :, i, i], dcscn.upsample_filter(4))
        for j in range(3):
            if i != j:
                np.testing.assert_allclose(w[:, :, i, j], 0)


def test_he_initializer_stddev():
    # stddev = sqrt(2 / (k*k*cin)), truncated at 2 sigma
    rng = jax.random.PRNGKey(0)
    w = np.asarray(dcscn.init_weight(rng, (3, 3, 64, 64), "he"))
    expect = np.sqrt(2.0 / (9 * 64))
    # truncated normal's std is ~0.88 of sigma
    assert 0.7 * expect < w.std() < expect
    assert np.abs(w).max() <= 2 * expect + 1e-6


def test_xavier_default_truncated_normal():
    # the reference's weight() calls xavier with uniform=False by default
    # (helper/utilty.py:393-395) -> truncated normal stddev sqrt(3/n)
    rng = jax.random.PRNGKey(1)
    shape = (3, 3, 32, 16)
    w = np.asarray(dcscn.init_weight(rng, shape, "xavier"))
    n = 9 * 32 + 9 * 16
    sigma = np.sqrt(3.0 / n)
    assert np.abs(w).max() <= 2 * sigma + 1e-6
    assert 0.7 * sigma < w.std() < sigma


def test_xavier_uniform_variant_range():
    w = np.asarray(dcscn.init_weight(jax.random.PRNGKey(1), (3, 3, 32, 16),
                                     "xavier", uniform=True))
    r = np.sqrt(6.0 / (9 * 32 + 9 * 16))
    assert np.abs(w).max() <= r


def test_identity_initializer_center_one():
    rng = jax.random.PRNGKey(2)
    w = np.asarray(dcscn.init_weight(rng, (3, 3, 4, 6), "identity"))
    for c in range(4):
        assert w[1, 1, c, c] == 1.0


def test_zero_initializer():
    w = np.asarray(dcscn.init_weight(jax.random.PRNGKey(3), (3, 3, 2, 2), "zero"))
    np.testing.assert_array_equal(w, 0)


def test_uniform_initializer_range():
    w = np.asarray(dcscn.init_weight(jax.random.PRNGKey(4), (3, 3, 2, 2), "uniform",
                                     stddev=0.05))
    assert np.abs(w).max() <= 0.1


@pytest.mark.parametrize("name,fn", [
    ("relu", lambda x: np.maximum(x, 0)),
    ("sigmoid", lambda x: 1 / (1 + np.exp(-x))),
    ("tanh", np.tanh),
    ("leaky_relu", lambda x: np.maximum(x, 0.1 * x)),
    ("selu", lambda x: 1.0507009873554805 * np.where(
        x > 0, x, 1.6732632423543772 * (np.exp(x) - 1))),
])
def test_activators_match_formulas(name, fn):
    x = np.linspace(-3, 3, 41, dtype=np.float32)
    got = np.asarray(dcscn._activate(jnp.asarray(x), name))
    np.testing.assert_allclose(got, fn(x), rtol=1e-5, atol=1e-6)


def test_dropout_scaling_preserves_expectation():
    from dcscn_tpu.config import Config

    cfg = Config(layers=2, filters=8, min_filters=8, use_nin=False,
                 reconstruct_filters=4, dropout_rate=0.5)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((1, 8, 8, 1))
    x2 = jnp.zeros((1, 16, 16, 1))
    outs = []
    for i in range(64):
        y, _ = dcscn.apply(params, x, x2, cfg, training=True,
                           dropout_rng=jax.random.PRNGKey(i))
        outs.append(np.asarray(y))
    mean_train = np.mean(outs)
    y_eval, _ = dcscn.apply(params, x, x2, cfg, training=False)
    # inverted dropout: E[train output] ~= eval output
    assert abs(mean_train - float(np.mean(np.asarray(y_eval)))) < 0.25 * abs(
        float(np.mean(np.asarray(y_eval)))) + 0.05


def test_batch_norm_inference_formula():
    x = jnp.asarray(np.random.default_rng(0).normal(2.0, 3.0, (2, 4, 4, 5)),
                    jnp.float32)
    bn = {"mean": jnp.full((5,), 2.0), "var": jnp.full((5,), 9.0)}
    y, new_bn = dcscn._batch_norm(x, bn, jnp.full((5,), 1.5), jnp.full((5,), 0.3),
                                  training=False)
    expect = (np.asarray(x) - 2.0) / np.sqrt(9.0 + 1e-3) * 1.5 + 0.3
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5)
    assert new_bn is bn  # no update at inference


def test_batch_norm_running_update():
    x = jnp.asarray(np.random.default_rng(1).normal(5.0, 1.0, (4, 8, 8, 3)),
                    jnp.float32)
    bn = {"mean": jnp.zeros((3,)), "var": jnp.ones((3,))}
    _, new_bn = dcscn._batch_norm(x, bn, jnp.ones((3,)), jnp.zeros((3,)),
                                  training=True)
    # momentum 0.99: new_mean = 0.99*0 + 0.01*batch_mean (~5.0)
    np.testing.assert_allclose(np.asarray(new_bn["mean"]), 0.01 * np.asarray(
        jnp.mean(x, axis=(0, 1, 2))), rtol=1e-4)
