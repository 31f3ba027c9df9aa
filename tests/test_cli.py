"""CLI smoke tests on tiny data (CPU): evaluate / sr / convert_y /
augmentation / train drive end-to-end with reference flag surfaces."""

import os

import numpy as np
import pytest

from dcscn_tpu.utils import imaging

TINY_FLAGS = ["--layers=2", "--filters=4", "--min_filters=4", "--use_nin=False",
              "--reconstruct_filters=4", "--self_ensemble=1", "--dropout_rate=1.0",
              "--save_weights=False", "--enable_log=False"]


@pytest.fixture
def env(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    os.makedirs("data/tinyset", exist_ok=True)
    for i in range(2):
        img = rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        imaging.save_image("data/tinyset/img%d.png" % i, img, print_console=False)
    return tmp_path


def _make_ckpt(name_flags):
    """Init + save a model so evaluate/sr can load it."""
    from dcscn_tpu import api
    from dcscn_tpu.config import parse_args

    cfg, _ = parse_args(name_flags)
    m = api.SuperResolution(cfg)
    m.init_all_variables()
    m.save_model()
    return m.name


def test_evaluate_cli(env, capsys):
    _make_ckpt(TINY_FLAGS)
    from dcscn_tpu.cli import evaluate

    evaluate.main(TINY_FLAGS + ["--test_dataset=tinyset", "--save_results=False",
                                "--compute_bicubic=True", "--initialize_tf_log=False"])


def test_evaluate_cli_batch_eval(env, capsys):
    """--batch_eval routes through engine.run_many and logs the same
    Average line format."""
    _make_ckpt(TINY_FLAGS)
    from dcscn_tpu.cli import evaluate

    evaluate.main(TINY_FLAGS + ["--test_dataset=tinyset", "--save_results=False",
                                "--batch_eval=True", "--tile_size=16",
                                "--initialize_tf_log=False"])


def test_sr_cli(env):
    name = _make_ckpt(TINY_FLAGS)
    from dcscn_tpu.cli import sr

    sr.main(TINY_FLAGS + ["--file=data/tinyset/img0.png", "--initialize_tf_log=False"])
    assert os.path.isfile("output/%s/img0_result.png" % name)


def test_convert_y_cli(env):
    from dcscn_tpu.cli import convert_y

    convert_y.main(["--dataset=tinyset"])
    assert os.path.isfile("data/tinyset_y/img0.bmp")


def test_augmentation_cli(env):
    from dcscn_tpu.cli import augmentation

    augmentation.main(["--dataset=tinyset", "--augment_level=4"])
    files = os.listdir("data/tinyset_4")
    assert len(files) == 2 * 4  # original + 3 variants per image


def test_train_cli_dynamic_fast_path(env):
    """Dynamic dataset: prefetch threads + device transform + train step."""
    from dcscn_tpu.cli import train

    train.main(TINY_FLAGS + [
        "--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=False",
        "--batch_image_size=16", "--batch_num=2", "--training_images=4",
        "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=1",
        "--initialize_tf_log=False",
    ])
    assert any(n.endswith(".ckpt.npz") for n in os.listdir("models"))


def test_train_cli_one_stage(env):
    """Full train CLI on a tiny schedule (2 epochs) with prebuilt batches."""
    from dcscn_tpu.cli import train

    train.main(TINY_FLAGS + [
        "--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=True",
        "--batch_image_size=16", "--batch_num=2", "--training_images=4",
        "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=2",
        "--initialize_tf_log=False",
    ])
    # trained checkpoint + resumable state + output artifacts exist
    names = os.listdir("models")
    assert any(n.endswith(".ckpt.npz") for n in names)
    assert any(n.endswith(".train.npz") for n in names)
    assert os.path.isdir("output")


def test_train_cli_multi_trial(env):
    """--tests=2 runs two trials with trial-suffixed checkpoints
    (reference: train.py:44-51, tf_graph.py:267-270)."""
    from dcscn_tpu.cli import train

    train.main(TINY_FLAGS + [
        "--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=True",
        "--batch_image_size=16", "--batch_num=2", "--training_images=2",
        "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=1",
        "--tests=2", "--initialize_tf_log=False",
    ])
    names = os.listdir("models")
    assert any(n.endswith("_1.ckpt.npz") for n in names)  # trial 1 suffix


def test_evaluate_cli_frozen(env):
    """--frozenInference loads an exported artifact without a ckpt dir."""
    from dcscn_tpu import api
    from dcscn_tpu.cli import evaluate
    from dcscn_tpu.config import parse_args
    from dcscn_tpu.io import export

    cfg, _ = parse_args(TINY_FLAGS)
    m = api.SuperResolution(cfg)
    m.init_all_variables()
    export.export_model("frozen/m.npz", m.params, m.cfg, m.bn_state)

    evaluate.main(TINY_FLAGS + [
        "--test_dataset=tinyset", "--save_results=False",
        "--frozenInference=True", "--frozen_graph_path=frozen/m.npz",
        "--initialize_tf_log=False",
    ])


def test_evaluate_cli_empty_dataset(env, capsys):
    """All-unreadable/empty dataset: warn and return 0 instead of dividing
    by zero (ADVICE r3) — both the per-image and batch paths. (set_logging
    owns the root handlers, so assert on the emitted stream, not caplog.)"""
    from dcscn_tpu.cli import evaluate

    os.makedirs("data/emptyset", exist_ok=True)
    _make_ckpt(TINY_FLAGS)
    evaluate.main(TINY_FLAGS + ["--test_dataset=emptyset",
                                "--save_results=False",
                                "--initialize_tf_log=False"])
    evaluate.main(TINY_FLAGS + ["--test_dataset=emptyset",
                                "--save_results=False", "--batch_eval=True",
                                "--tile_size=16",
                                "--initialize_tf_log=False"])
    out = capsys.readouterr()
    assert "no evaluable images" in out.out + out.err


def test_evaluate_cli_bicubic_skips_unsupported(env, capsys):
    """--compute_bicubic must skip images evaluate_bicubic can't prepare
    (returns (None, None), e.g. gray+alpha PNGs) instead of crashing on
    None arithmetic (VERDICT r4 weak #3)."""
    import imageio.v2 as imageio

    la = np.random.default_rng(1).integers(0, 255, (32, 32, 2), dtype=np.uint8)
    imageio.imwrite("data/tinyset/img_la.png", la)
    _make_ckpt(TINY_FLAGS)
    from dcscn_tpu.cli import evaluate

    evaluate.main(TINY_FLAGS + ["--test_dataset=tinyset", "--save_results=False",
                                "--compute_bicubic=True", "--initialize_tf_log=False"])
    out = capsys.readouterr()
    assert "Bicubic Average" in out.out + out.err


def test_evaluate_cli_batch_eval_requires_no_save(env, capsys):
    """--batch_eval with save_results=True logs the incompatibility notice
    and falls back to the per-image path (ADVICE r3)."""
    _make_ckpt(TINY_FLAGS)
    from dcscn_tpu.cli import evaluate

    evaluate.main(TINY_FLAGS + ["--test_dataset=tinyset",
                                "--batch_eval=True", "--tile_size=16",
                                "--initialize_tf_log=False"])
    out = capsys.readouterr()
    assert "requires --save_results=False" in out.out + out.err


def test_train_cli_scan_chunk(env):
    """--scan_chunk splits the fused epoch into multiple dispatches with
    identical semantics (guards the TPU-worker-crash mitigation path)."""
    from dcscn_tpu.cli import train

    train.main(TINY_FLAGS + [
        "--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=True",
        "--batch_image_size=16", "--batch_num=2", "--training_images=8",
        "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=2",
        "--scan_chunk=2", "--initialize_tf_log=False",
    ])
    names = os.listdir("models")
    assert any(n.endswith(".ckpt.npz") for n in names)


def test_train_cli_train_seed(env):
    """--train_seed yields an independent same-recipe run (different data
    shuffle -> different weights), while repeating a seed reproduces it —
    the knob behind second-seed soup members."""
    import numpy as np
    from dcscn_tpu.cli import train
    from dcscn_tpu.io import checkpoint as ckpt_io

    base = ["--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=True",
            "--batch_image_size=16", "--batch_num=2", "--training_images=8",
            "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=2",
            "--initialize_tf_log=False"]

    def run(name, seed):
        train.main(TINY_FLAGS + base + ["--model_name=" + name,
                                        "--train_seed=%d" % seed])
        return ckpt_io.load_params("models/dcscn_%s.ckpt.npz" % name)["params"]

    p0 = run("seed0", 0)
    p0b = run("seed0b", 0)
    p1 = run("seed1", 7)
    import jax.tree_util as jtu

    flat0 = np.concatenate([np.ravel(x) for x in jtu.tree_leaves(p0)])
    flat0b = np.concatenate([np.ravel(x) for x in jtu.tree_leaves(p0b)])
    flat1 = np.concatenate([np.ravel(x) for x in jtu.tree_leaves(p1)])
    np.testing.assert_array_equal(flat0, flat0b)
    assert np.abs(flat0 - flat1).max() > 0


def test_train_cli_scan_with_weight_summaries(env):
    """Fused-scan loop with --save_weights: the per-epoch gradient/tensor
    summary probe runs against the gathered first-step minibatch."""
    from dcscn_tpu.cli import train

    flags = [f for f in TINY_FLAGS
             if not f.startswith(("--save_weights", "--enable_log"))]
    train.main(flags + [
        "--save_weights=True", "--enable_log=True",
        "--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=True",
        "--batch_image_size=16", "--batch_num=2", "--training_images=4",
        "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=2",
        "--initialize_tf_log=False",
    ])
    # gradient + X/Y_ tags reached the train event stream
    train_dir = os.path.join("tf_log", "train")
    blobs = b""
    for fname in os.listdir(train_dir):
        with open(os.path.join(train_dir, fname), "rb") as f:
            blobs += f.read()
    assert b"gradients" in blobs and b"Y_/output" in blobs


def test_train_cli_snapshot_tail(env):
    """--snapshot_tail_epochs keeps per-epoch checkpoint copies over the
    schedule tail, and they soup cleanly (SWA-style same-basin average)."""
    import importlib.util

    from dcscn_tpu.cli import train

    train.main(TINY_FLAGS + [
        "--dataset=tinyset", "--test_dataset=tinyset", "--build_batch=True",
        "--batch_image_size=16", "--batch_num=2", "--training_images=4",
        "--initial_lr=0.002", "--end_lr=0.0015", "--lr_decay_epoch=2",
        "--snapshot_tail_epochs=2", "--initialize_tf_log=False",
    ])
    names = os.listdir("models")
    snaps = sorted(n for n in names if "_snapE" in n and n.endswith(".ckpt.npz"))
    assert len(snaps) == 2  # 2-epoch schedule, tail covers both epochs

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "soup_ckpt", os.path.join(repo, "tools", "soup_ckpt.py"))
    soup_ckpt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soup_ckpt)
    srcs = ",".join(n[: -len(".ckpt.npz")] for n in snaps)
    soup_ckpt.main(["--srcs", srcs, "--dst", "tail_soup"])
    assert os.path.isfile("models/tail_soup.ckpt.npz")


def test_augmentation_cli_scale_levels(env):
    """--scale_levels adds PIL-bicubic downscaled bases, each dihedral-
    augmented like the originals (multi-scale augmentation)."""
    from PIL import Image

    from dcscn_tpu.cli import augmentation

    augmentation.main(["--dataset=tinyset", "--augment_level=4",
                       "--scale_levels=0.9,0.7"])
    names = os.listdir("data/tinyset_4")
    # 2 images x 3 bases (1.0, 0.9, 0.7) x 4 dihedral variants
    assert len(names) == 2 * 3 * 4
    # downscale uses the int(dim*scale) PIL convention on 48x48 sources
    assert Image.open("data/tinyset_4/img0_s90.png").size == (43, 43)
    assert Image.open("data/tinyset_4/img0_s70.png").size == (33, 33)
