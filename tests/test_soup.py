"""tools/soup_ckpt.py: uniform/weighted checkpoint averaging ("model soup").

Additive capability over the reference (which keeps one checkpoint per
model name, helper/tf_graph.py:282-296); used in round 4 to combine the
canonical flagship with its patch-64 fine-tune sibling."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import soup_ckpt  # noqa: E402

from dcscn_tpu.io import checkpoint


def _write(tmp_path, name, scale=1.0, extra_key=False, shape=(3, 3, 1, 4)):
    params = {"CNN1": {"w": np.full(shape, scale, np.float32),
                       "b": np.full((4,), 2 * scale, np.float32)}}
    if extra_key:
        params["CNN2"] = {"w": np.ones((1, 1, 4, 4), np.float32)}
    path = os.path.join(str(tmp_path), name + ".ckpt.npz")
    checkpoint.save_params(path, params, meta={"model_name": name})
    return path


def test_uniform_soup_is_mean(tmp_path):
    a = _write(tmp_path, "a", scale=1.0)
    b = _write(tmp_path, "b", scale=3.0)
    flat = soup_ckpt.soup([a, b])
    np.testing.assert_allclose(flat["CNN1/w"], 2.0)
    np.testing.assert_allclose(flat["CNN1/b"], 4.0)
    assert flat["CNN1/w"].dtype == np.float32


def test_weighted_soup_normalizes(tmp_path):
    a = _write(tmp_path, "a", scale=1.0)
    b = _write(tmp_path, "b", scale=3.0)
    # weights 3:1 (auto-normalized) -> 0.75*1 + 0.25*3 = 1.5
    flat = soup_ckpt.soup([a, b], weights=[3.0, 1.0])
    np.testing.assert_allclose(flat["CNN1/w"], 1.5)


def test_mismatched_architectures_refused(tmp_path):
    a = _write(tmp_path, "a")
    b = _write(tmp_path, "b", extra_key=True)
    with pytest.raises(ValueError, match="key set"):
        soup_ckpt.soup([a, b])
    c = _write(tmp_path, "c", shape=(3, 3, 2, 4))
    with pytest.raises(ValueError, match="shape"):
        soup_ckpt.soup([a, c])


def test_cli_writes_loadable_ckpt_and_meta(tmp_path):
    _write(tmp_path, "a", scale=1.0)
    _write(tmp_path, "b", scale=3.0)
    soup_ckpt.main(["--srcs=a,b", "--dst=ab_soup",
                    "--models_dir=%s" % tmp_path])
    dst = os.path.join(str(tmp_path), "ab_soup.ckpt.npz")
    tree = checkpoint.load_params(dst)
    np.testing.assert_allclose(tree["CNN1"]["w"], 2.0)
    with open(dst + ".json") as f:
        meta = json.load(f)
    assert meta["model_name"] == "ab_soup"
    assert meta["soup_of"] == ["a", "b"]
