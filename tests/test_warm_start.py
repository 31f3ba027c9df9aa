"""warm_start_params: scale-transfer checkpoint surgery (tools/warm_start.py).

The DCSCN paper's transfer trick — x3/x4 models inherit the x2 model's
scale-independent layers; only the scale-dependent upsampler stays fresh."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from warm_start import warm_start_params  # noqa: E402

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn

CFG_SMALL = dict(layers=3, filters=8, min_filters=4, nin_filters=8,
                 nin_filters2=4, dropout_rate=1.0)


def _params(cfg, seed=0):
    return jax.device_get(dcscn.init_params(jax.random.PRNGKey(seed), cfg))


def test_x3_inherits_all_but_upsampler():
    src = _params(Config(scale=2, **CFG_SMALL))
    fresh = _params(Config(scale=3, **CFG_SMALL), seed=1)
    out, copied, kept = warm_start_params({"params": src}, fresh)
    assert sorted(kept) == ["Up-PS/b", "Up-PS/w"]
    for path in copied:
        lname, k = path.split("/")
        np.testing.assert_array_equal(out[lname][k], src[lname][k])
    # fresh upsampler kept from the fresh init (9x channel conv)
    np.testing.assert_array_equal(out["Up-PS"]["w"], fresh["Up-PS"]["w"])
    assert out["Up-PS"]["w"].shape[-1] == 9 * src["Up-PS"]["w"].shape[2]


def test_x4_inherits_everything_including_both_ps_stages():
    src = _params(Config(scale=2, **CFG_SMALL))
    fresh = _params(Config(scale=4, **CFG_SMALL), seed=1)
    out, copied, kept = warm_start_params({"params": src}, fresh)
    assert kept == []
    # both x2 stages take the x2 model's single Up-PS
    np.testing.assert_array_equal(out["Up-PS"]["w"], src["Up-PS"]["w"])
    np.testing.assert_array_equal(out["Up-PS2"]["w"], src["Up-PS"]["w"])


def test_bn_state_shape_gated_on_width_change(tmp_path, monkeypatch):
    """bn running stats transfer only where shapes match the TARGET config;
    a width change must not carry source-sized mean/var into the warm ckpt."""
    import warm_start

    from dcscn_tpu.io import checkpoint as ckpt_io

    monkeypatch.chdir(tmp_path)
    os.makedirs("models")
    src_cfg = Config(scale=2, batch_norm=True, **CFG_SMALL)
    src = _params(src_cfg)
    src_bn = jax.device_get(dcscn.init_bn_state(src_cfg))
    ckpt_io.save_params("models/src.ckpt.npz", {"params": src, "bn_state": src_bn},
                        meta={"model_name": "src"})

    # target: narrower widths -> CNN layers change shape, bn must restart
    warm_start.main([
        "--scale=3", "--layers=3", "--filters=4", "--min_filters=4",
        "--nin_filters=8", "--nin_filters2=4", "--dropout_rate=1.0",
        "--batch_norm=True", "--src_name=src"])
    tgt_cfg = Config(scale=3, batch_norm=True, layers=3, filters=4,
                     min_filters=4, nin_filters=8, nin_filters2=4,
                     dropout_rate=1.0)
    out_path = "models/" + tgt_cfg.name() + "_warm.ckpt.npz"
    tree = ckpt_io.load_params(out_path)
    want = jax.device_get(dcscn.init_bn_state(tgt_cfg))
    for lname, leaves in want.items():
        for k, v in leaves.items():
            assert np.shape(tree["bn_state"][lname][k]) == np.shape(v), (
                lname, k)


def test_warm_started_model_runs():
    src = _params(Config(scale=2, **CFG_SMALL))
    cfg3 = Config(scale=3, **CFG_SMALL)
    fresh = _params(cfg3, seed=1)
    out, _, _ = warm_start_params({"params": src}, fresh)
    x = np.random.default_rng(0).uniform(0, 255, (1, 8, 8, 1)).astype(np.float32)
    x2 = np.random.default_rng(1).uniform(0, 255, (1, 24, 24, 1)).astype(np.float32)
    y, _ = dcscn.apply(jax.device_put(out), x, x2, cfg3, training=False)
    assert y.shape == (1, 24, 24, 1)
    assert np.isfinite(np.asarray(y)).all()
