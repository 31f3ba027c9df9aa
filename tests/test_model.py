"""Model wiring + numerics tests for dcscn_tpu.models.dcscn."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn

TINY = Config(layers=3, filters=8, min_filters=4, nin_filters=8, nin_filters2=4,
              reconstruct_layers=2, reconstruct_filters=6, dropout_rate=1.0)


def test_depth_to_space_tf_semantics():
    """TF depth_to_space: out[b, h*B+i, w*B+j, c] = in[b, h, w, (i*B+j)*C+c]."""
    n, h, w, b, c = 1, 2, 3, 2, 5
    x = np.arange(n * h * w * b * b * c, dtype=np.float32).reshape(n, h, w, b * b * c)
    out = np.asarray(dcscn._depth_to_space(jnp.asarray(x), b))
    assert out.shape == (n, h * b, w * b, c)
    for hh in range(h):
        for ww in range(w):
            for i in range(b):
                for j in range(b):
                    for cc in range(c):
                        assert out[0, hh * b + i, ww * b + j, cc] == x[0, hh, ww, (i * b + j) * c + cc]


def test_prelu_formula():
    x = jnp.asarray(np.linspace(-3, 3, 13, dtype=np.float32).reshape(1, 1, 13, 1))
    alpha = jnp.asarray([0.25], dtype=jnp.float32)
    out = np.asarray(dcscn._activate(x, "prelu", alpha))
    expected = np.maximum(np.asarray(x), 0) + 0.25 * np.minimum(np.asarray(x), 0)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_conv_transpose_matches_scatter():
    """lax path vs a literal transposed-conv (scatter) implementation with
    TF SAME semantics: out = input*s, pad chosen as gradient of SAME conv."""
    rng = np.random.default_rng(0)
    scale, ch, h, w = 2, 3, 5, 4
    k = dcscn.get_upscale_filter_size(scale)  # 4
    x = rng.normal(size=(1, h, w, ch)).astype(np.float32)
    wgt = rng.normal(size=(k, k, ch, ch)).astype(np.float32)

    got = np.asarray(dcscn._conv_transpose(jnp.asarray(x), jnp.asarray(wgt), scale))
    assert got.shape == (1, h * scale, w * scale, ch)

    # scatter implementation: for each input pixel, add w * x into output
    # region. TF conv2d_transpose SAME: pad_total = k - s, pad_begin =
    # pad_total // 2 ... equivalently output[p] = sum_in x[i] w[p - i*s + off]
    out_h, out_w = h * scale, w * scale
    pad_total_h = k - scale
    pad_beg = pad_total_h // 2
    full = np.zeros((1, out_h + pad_total_h, out_w + pad_total_h, ch), np.float32)
    for i in range(h):
        for j in range(w):
            for ci in range(ch):
                for co in range(ch):
                    full[0, i * scale : i * scale + k, j * scale : j * scale + k, co] += (
                        x[0, i, j, ci] * wgt[:, :, co, ci]
                    )
    expected = full[:, pad_beg : pad_beg + out_h, pad_beg : pad_beg + out_w, :]
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_init_shapes_match_plan():
    cfg = TINY
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    plan = {s["name"]: s for s in dcscn.layer_plan(cfg)}
    assert set(params) == set(plan)
    for name, spec in plan.items():
        if spec["kind"] == "tconv":
            continue
        assert params[name]["w"].shape == (spec["k"], spec["k"], spec["cin"], spec["cout"])
        if spec["bias"]:
            assert params[name]["b"].shape == (spec["cout"],)
        if spec["activator"] == "prelu":
            assert params[name]["prelu"].shape == (spec["cout"],)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_forward_shapes_pixel_shuffler(scale):
    cfg = TINY.replace(scale=scale)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 8, 10, 1))
    x2 = jnp.zeros((2, 8 * scale, 10 * scale, 1))
    y, _ = dcscn.apply(params, x, x2, cfg)
    assert y.shape == (2, 8 * scale, 10 * scale, 1)


def test_forward_shapes_transposed_conv():
    cfg = TINY.replace(pixel_shuffler=False, scale=3)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 6, 6, 1))
    x2 = jnp.zeros((1, 18, 18, 1))
    y, _ = dcscn.apply(params, x, x2, cfg)
    assert y.shape == (1, 18, 18, 1)


def test_forward_shapes_depthwise_separable():
    cfg = TINY.replace(depthwise_separable=True)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 8, 8, 1))
    x2 = jnp.zeros((1, 16, 16, 1))
    y, _ = dcscn.apply(params, x, x2, cfg)
    assert y.shape == (1, 16, 16, 1)


def test_forward_no_nin():
    cfg = TINY.replace(use_nin=False)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    y, _ = dcscn.apply(params, jnp.zeros((1, 8, 8, 1)), jnp.zeros((1, 16, 16, 1)), cfg)
    assert y.shape == (1, 16, 16, 1)


def test_forward_batch_norm_state():
    cfg = TINY.replace(batch_norm=True)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    bn = dcscn.init_bn_state(cfg)
    rngs = jax.random.PRNGKey(1)
    x = jax.random.normal(rngs, (2, 8, 8, 1))
    x2 = jnp.zeros((2, 16, 16, 1))
    y, new_bn = dcscn.apply(params, x, x2, cfg, training=True, bn_state=bn,
                            dropout_rng=jax.random.PRNGKey(2), keep_prob=0.8)
    assert y.shape == (2, 16, 16, 1)
    # running stats moved
    assert not np.allclose(np.asarray(new_bn["CNN1"]["mean"]), 0.0)


def test_dropout_train_vs_eval():
    cfg = TINY.replace(dropout_rate=0.5)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    x2 = jnp.zeros((1, 16, 16, 1))
    y_eval, _ = dcscn.apply(params, x, x2, cfg, training=False)
    y_eval2, _ = dcscn.apply(params, x, x2, cfg, training=False)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_tr1, _ = dcscn.apply(params, x, x2, cfg, training=True, dropout_rng=jax.random.PRNGKey(3))
    y_tr2, _ = dcscn.apply(params, x, x2, cfg, training=True, dropout_rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(y_tr1), np.asarray(y_tr2))


def test_global_residual():
    """Zero-weights model must output exactly x2 (bicubic skip)."""
    cfg = TINY.replace(initializer="zero", dropout_rate=1.0)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 1))
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 1))
    y, _ = dcscn.apply(params, x, x2, cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x2), atol=1e-6)


def test_complexity_report_l12():
    rep = dcscn.complexity_report(Config())
    assert rep["receptive_fields"] == 29  # 3 + 11*2 + NIN(0) + PS(2) + R(2)
    assert "Total: (1301)" in rep["features"]


def test_param_count_l7():
    cfg = Config(layers=7, filters=32, min_filters=8, filters_decay_gamma=1.2,
                 nin_filters=24, nin_filters2=8, pixel_shuffler_filters=1)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    # from the shipped ckpt shapes: convs+biases+prelus
    # CNN1..7 W: 3*3*(1*32+32*26+26*22+22*18+18*14+14*11+11*8)
    w = 9 * (1 * 32 + 32 * 26 + 26 * 22 + 22 * 18 + 18 * 14 + 14 * 11 + 11 * 8)
    b = 32 + 26 + 22 + 18 + 14 + 11 + 8
    prelu = b
    nin = (131 * 24 + 24 + 24) + (131 * 8 + 8 + 8) + (9 * 64 + 8 + 8)
    ps = 9 * 32 * 4 + 4
    r = 9 * 1 * 1
    assert dcscn.param_count(params) == w + b + prelu + nin + ps + r
