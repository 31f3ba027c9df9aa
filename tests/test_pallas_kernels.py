"""Pallas kernel tests (interpret mode on CPU) vs the XLA fallback."""

import numpy as np

import jax.numpy as jnp

from dcscn_tpu.ops import pallas_kernels as pk


def test_gather_windows_xla_correct():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (40, 50, 1)).astype(np.float32)
    rows = np.array([0, 8, 24], np.int32)
    cols = np.array([0, 16, 34], np.int32)
    out = np.asarray(pk.gather_windows_xla(jnp.asarray(img), jnp.asarray(rows),
                                           jnp.asarray(cols), 16, 16))
    for i, (r, c) in enumerate(zip(rows, cols)):
        np.testing.assert_array_equal(out[i], img[r:r + 16, c:c + 16, :])


def test_gather_windows_pallas_interpret_matches_xla():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (64, 48, 1)).astype(np.float32)
    rows = np.array([0, 16, 32, 40], np.int32)
    cols = np.array([0, 8, 16, 24], np.int32)
    want = np.asarray(pk.gather_windows_xla(jnp.asarray(img), jnp.asarray(rows),
                                            jnp.asarray(cols), 24, 24))
    got = np.asarray(pk.gather_windows(jnp.asarray(img), jnp.asarray(rows),
                                       jnp.asarray(cols), 24, 24, True))
    np.testing.assert_array_equal(got, want)


def test_engine_tiled_uses_device_gather():
    """Tiled engine path still equals whole-image (now with device gather)."""
    import jax

    from dcscn_tpu.config import Config
    from dcscn_tpu.engine import InferenceEngine
    from dcscn_tpu.models import dcscn
    from dcscn_tpu.ops import resize as resize_ops

    cfg = Config(layers=2, filters=6, min_filters=4, nin_filters=6, nin_filters2=4,
                 dropout_rate=1.0, self_ensemble=1)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (50, 70, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)

    whole = InferenceEngine(params, cfg).run(x, x2)
    tiled = InferenceEngine(params, cfg.replace(tile_size=16)).run(x, x2)
    np.testing.assert_allclose(tiled, whole, rtol=1e-5, atol=5e-4)
