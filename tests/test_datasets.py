"""Data pipeline tests: patch store build/load (npz + reference bmp layout),
dynamic sampling, device transform parity."""

import os

import numpy as np
import pytest

from dcscn_tpu.data import builders, datasets
from dcscn_tpu.ops import color
from dcscn_tpu.ops import resize as resize_ops
from dcscn_tpu.utils import imaging


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        imaging.save_image(str(d / ("img%d.png" % i)), img, print_console=False)
    return str(d)


def test_build_input_image_pipeline(image_dir):
    img = imaging.load_image(os.path.join(image_dir, "img0.png"), print_console=False)
    y = builders.build_input_image(img, channels=1, scale=2, alignment=2, convert_ycbcr=True)
    assert y.shape == (48, 64, 1)
    # matches doing the steps by hand
    expected = resize_ops.resize_image(color.convert_rgb_to_y(img), 0.5)
    np.testing.assert_allclose(y, expected, atol=1e-5)


def test_patch_dataset_build_and_reload_npz(image_dir, tmp_path):
    bd = str(tmp_path / "batch")
    ds = datasets.PatchDataset(2, bd, 16, 8)
    ds.build_batch(image_dir)
    assert ds.count > 0
    assert ds.input_images.shape[1:] == (16, 16, 1)
    assert ds.true_images.shape[1:] == (32, 32, 1)

    ds2 = datasets.PatchDataset(2, bd, 16, 8)
    assert ds2.is_batch_exist()
    ds2.load_batch_counts()
    assert ds2.count == ds.count
    ds2.load_all_batch_images()
    np.testing.assert_array_equal(ds2.input_images, ds.input_images)


def test_patch_dataset_manifest_mismatch(image_dir, tmp_path):
    bd = str(tmp_path / "batch")
    ds = datasets.PatchDataset(2, bd, 16, 8)
    ds.build_batch(image_dir)
    # different stride -> store invalid (reference: helper/loader.py:196-220)
    ds3 = datasets.PatchDataset(2, bd, 16, 4)
    assert not ds3.is_batch_exist()


def test_patch_dataset_bmp_store_roundtrip(image_dir, tmp_path):
    bd = str(tmp_path / "batch_bmp")
    ds = datasets.PatchDataset(2, bd, 16, 8, store_format="bmp")
    ds.build_batch(image_dir)
    assert os.path.isfile(os.path.join(bd, "input", "%06d.bmp" % 0))
    assert os.path.isfile(os.path.join(bd, "batch_images.ini"))

    ds2 = datasets.PatchDataset(2, bd, 16, 8)
    assert ds2.is_batch_exist()
    ds2.load_all_batch_images()
    np.testing.assert_array_equal(ds2.input_images, ds.input_images)
    np.testing.assert_array_equal(ds2.true_images, ds.true_images)


def test_patch_dataset_sampling_epoch(image_dir, tmp_path):
    ds = datasets.PatchDataset(2, str(tmp_path / "b"), 16, 8)
    ds.build_batch(image_dir)
    seen = set()
    ds.init_batch_index()
    for _ in range(ds.count):
        seen.add(ds.get_next_image_no())
    assert seen == set(range(ds.count))  # permutation covers all

    idx = ds.epoch_indices(steps=3, batch=4, rng=np.random.default_rng(0))
    assert idx.shape == (3, 4)
    assert idx.max() < ds.count


def test_dynamic_dataset_sample(image_dir):
    ds = datasets.DynamicDataset(2, 16, batch_num=2)
    ds.set_data_dir(image_dir)
    x, x2, y = ds.load_batch_image(255.0)
    assert x.shape == (16, 16, 1)
    assert x2.shape == (32, 32, 1)
    assert y.shape == (32, 32, 1)


def test_dynamic_dataset_all_images_too_small(image_dir):
    """The reference-loop sampler must raise (not spin forever) when no
    training image can fit a batch_image_size*scale crop."""
    ds = datasets.DynamicDataset(4, 512, batch_num=2)  # needs 2048px images
    ds.set_data_dir(image_dir)
    with pytest.raises(RuntimeError, match="cannot sample"):
        ds.load_batch_image(255.0)


def test_dynamic_dataset_prefetch(image_dir):
    ds = datasets.DynamicDataset(2, 16, batch_num=3, prefetch_threads=2)
    ds.set_data_dir(image_dir)
    batch = ds.next_crop_batch()
    assert batch.shape == (3, 32, 32, 1)
    ds.stop_prefetch()


def test_device_transform_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    true = rng.uniform(16, 235, (2, 32, 32, 1)).astype(np.float32)
    fn = datasets.device_transform_fn(16, 2)
    x, x2, y = fn(jnp.asarray(true))
    host_x = np.stack([resize_ops.resize_image(true[i], 0.5) for i in range(2)])
    host_x2 = np.stack([resize_ops.resize_image(host_x[i], 2.0) for i in range(2)])
    np.testing.assert_allclose(np.asarray(x), host_x, atol=1e-3)
    np.testing.assert_allclose(np.asarray(x2), host_x2, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(y), true)


def test_dynamic_prefetch_restart_across_trials(image_dir):
    """stop/start cycles (multi-trial training) must not leak stale workers
    or deadlock (regression for the prefetch lifecycle races)."""
    ds = datasets.DynamicDataset(2, 16, batch_num=2, prefetch_threads=2)
    ds.set_data_dir(image_dir)
    for trial in range(3):
        ds.start_prefetch(seed=trial)
        b = ds.next_crop_batch()
        assert b.shape == (2, 32, 32, 1)
        ds.stop_prefetch()
    assert not any(t.is_alive() for t in ds._workers)


def test_dynamic_undersized_images_error(tmp_path):
    """All-too-small images must raise, not hang (regression)."""
    import pytest as _pytest

    from dcscn_tpu.utils import imaging as _imaging

    d = tmp_path / "small"
    d.mkdir()
    _imaging.save_image(str(d / "tiny.png"),
                        np.zeros((8, 8, 3), np.uint8), print_console=False)
    ds = datasets.DynamicDataset(2, 16, batch_num=1)
    ds.set_data_dir(str(d))
    ds.start_prefetch()
    with _pytest.raises(RuntimeError):
        ds.next_crop_batch()


def test_patch_dataset_empty_store_raises(tmp_path):
    ds = datasets.PatchDataset(2, str(tmp_path / "b"), 16, 8)
    ds.count = 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ds.epoch_indices(2, 4, np.random.default_rng(0))
