"""Resumable-training tests: full state (params+optimizer+schedule)
round-trips; interrupted runs continue identically."""

import numpy as np
import pytest

from dcscn_tpu import api
from dcscn_tpu.config import Config
from dcscn_tpu.train.trainer import Batch

TINY = dict(layers=2, filters=4, min_filters=4, use_nin=False, reconstruct_filters=4,
            self_ensemble=1, dropout_rate=1.0, save_weights=False, enable_log=False,
            batch_num=2, batch_image_size=8)


@pytest.fixture
def env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _fixed_batch(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 255, (2, 8, 8, 1)).astype(np.float32)
    x2 = rng.uniform(0, 255, (2, 16, 16, 1)).astype(np.float32)
    y = x2.copy()
    return x, x2, y

def _steps(model, n, seed=0):
    x, x2, y = _fixed_batch(seed)
    model.batch_input = list(x)
    model.batch_input_bicubic = list(x2)
    model.batch_true = list(y)
    for _ in range(n):
        model.train_batch()


def test_train_state_roundtrip(env):
    m = api.SuperResolution(Config(**TINY))
    m.build_graph()
    m.init_all_variables()
    m.build_optimizer()
    m.init_epoch_index = lambda: None
    _steps(m, 3)
    m.lr = 0.001
    m.epochs_completed = 5
    m.epochs_completed_in_stage = 2
    m.save_train_state()

    m2 = api.SuperResolution(Config(**TINY))
    m2.build_graph()
    m2.init_all_variables()
    m2.build_optimizer()
    assert m2.load_train_state()
    assert m2.step == 3
    assert m2.epochs_completed == 5
    assert m2.epochs_completed_in_stage == 2
    assert m2.lr == pytest.approx(0.001)
    for k in m.params:
        for leaf in m.params[k]:
            np.testing.assert_allclose(np.asarray(m2.params[k][leaf]),
                                       np.asarray(m.params[k][leaf]))


def test_resume_continues_identically(env):
    """6 straight steps == 3 steps + save/restore + 3 steps."""
    ma = api.SuperResolution(Config(**TINY))
    ma.build_graph(); ma.init_all_variables(); ma.build_optimizer()
    _steps(ma, 6)

    mb = api.SuperResolution(Config(**TINY))
    mb.build_graph(); mb.init_all_variables(); mb.build_optimizer()
    _steps(mb, 3)
    mb.save_train_state()

    mc = api.SuperResolution(Config(**TINY))
    mc.build_graph(); mc.init_all_variables(); mc.build_optimizer()
    assert mc.load_train_state()
    _steps(mc, 3)

    for k in ma.params:
        for leaf in ma.params[k]:
            np.testing.assert_allclose(np.asarray(mc.params[k][leaf]),
                                       np.asarray(ma.params[k][leaf]),
                                       rtol=1e-5, atol=1e-6)


def test_load_train_state_missing(env):
    m = api.SuperResolution(Config(**TINY))
    m.build_graph(); m.init_all_variables(); m.build_optimizer()
    assert not m.load_train_state()


def test_train_state_meta_atomic_with_npz(env):
    """The schedule meta rides inside the npz: losing the json sidecar (or
    crashing between the two file replaces) must not skew the resumed
    step/epoch/lr."""
    import os

    m = api.SuperResolution(Config(**TINY))
    m.build_graph(); m.init_all_variables(); m.build_optimizer()
    m.init_epoch_index = lambda: None
    _steps(m, 2)
    m.lr = 0.0004
    m.epochs_completed = 7
    m.save_train_state()
    base = m._ckpt_base("", 0) + ".train.npz"
    os.remove(base + ".json")  # simulate the sidecar never landing

    m2 = api.SuperResolution(Config(**TINY))
    m2.build_graph(); m2.init_all_variables(); m2.build_optimizer()
    assert m2.load_train_state()
    assert m2.step == 2 and m2.epochs_completed == 7
    assert m2.lr == pytest.approx(0.0004)


def test_set_learning_rate_keeps_aval_stable(env):
    """LR decay must not change the opt_state leaf's aval (a Python float
    is weak-typed and would force a full retrace of the train step)."""
    from dcscn_tpu.train import optimizers

    m = api.SuperResolution(Config(**TINY))
    m.build_graph(); m.init_all_variables(); m.build_optimizer()
    st = m._ensure_trainer() and m.opt_state
    before = m.opt_state.hyperparams["learning_rate"]
    after = optimizers.set_learning_rate(m.opt_state, 0.0005).hyperparams[
        "learning_rate"]
    assert after.dtype == before.dtype
    assert after.weak_type == before.weak_type == False  # noqa: E712


def test_checkpoint_list_leaves_roundtrip(env):
    """_flatten's '#%d' sequence encoding must invert on load."""
    from dcscn_tpu.io import checkpoint as ckpt_io

    tree = {"layer": {"w": [np.ones((2, 2)), np.zeros((3,))]}}
    ckpt_io.save_params("seq.npz", tree)
    back = ckpt_io.load_params("seq.npz")
    assert isinstance(back["layer"]["w"], list) and len(back["layer"]["w"]) == 2
    np.testing.assert_array_equal(back["layer"]["w"][0], np.ones((2, 2)))
    np.testing.assert_array_equal(back["layer"]["w"][1], np.zeros((3,)))


def test_clean_dir_never_follows_symlinks(tmp_path):
    import os

    from dcscn_tpu.utils import files

    target = tmp_path / "precious"
    target.mkdir()
    (target / "keep.txt").write_text("data")
    work = tmp_path / "tf_log"
    work.mkdir()
    (work / "scratch.txt").write_text("x")
    os.symlink(str(target), str(work / "link"))

    files.clean_dir(str(work))
    assert (target / "keep.txt").exists()  # symlink target untouched
    assert not (work / "scratch.txt").exists()
    assert not (work / "link").exists()  # link itself removed
