"""PSNR/SSIM protocol tests (reference: helper/utilty.py:501-536)."""

import numpy as np

from dcscn_tpu.ops import metrics


def test_psnr_identical_images_inf():
    img = np.full((32, 32, 1), 128.0)
    psnr, ssim = metrics.compute_psnr_and_ssim(img, img, border_size=2)
    assert psnr == float("inf")
    assert abs(ssim - 1.0) < 1e-9


def test_psnr_known_value():
    a = np.zeros((16, 16, 1))
    b = np.full((16, 16, 1), 10.0)
    psnr, _ = metrics.compute_psnr_and_ssim(a, b)
    expected = 10 * np.log10(255.0**2 / 100.0)
    assert abs(psnr - expected) < 1e-9


def test_rounding_and_border_shave():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, size=(20, 20, 1))
    b = a + rng.normal(0, 3, size=a.shape)
    # manual protocol
    ar = np.clip(np.rint(a), 0, 255)[2:-2, 2:-2]
    br = np.clip(np.rint(b), 0, 255)[2:-2, 2:-2]
    mse = np.mean((ar - br) ** 2)
    expected = 10 * np.log10(255.0**2 / mse)
    psnr, _ = metrics.compute_psnr_and_ssim(a, b, border_size=2)
    assert abs(psnr - expected) < 1e-6


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, size=(64, 64, 1))
    small = a + rng.normal(0, 2, size=a.shape)
    big = a + rng.normal(0, 25, size=a.shape)
    _, s_small = metrics.compute_psnr_and_ssim(a, small)
    _, s_big = metrics.compute_psnr_and_ssim(a, big)
    assert 0 < s_big < s_small < 1.0


def test_ssim_matches_torch_reference():
    """Cross-check our gaussian SSIM against an independent implementation
    built on torch conv2d (same window, same constants)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    a = np.clip(np.rint(rng.uniform(0, 255, size=(48, 48))), 0, 255)
    b = np.clip(np.rint(a + rng.normal(0, 10, size=a.shape)), 0, 255)

    w1d = metrics._gaussian_window_1d()
    w2d = np.outer(w1d, w1d)
    win = torch.tensor(w2d, dtype=torch.float64).reshape(1, 1, 11, 11)

    def filt(x):
        t = torch.tensor(x, dtype=torch.float64).reshape(1, 1, *x.shape)
        return F.conv2d(t, win).numpy()[0, 0]

    ux, uy = filt(a), filt(b)
    uxx, uyy, uxy = filt(a * a), filt(b * b), filt(a * b)
    vx, vy, vxy = uxx - ux**2, uyy - uy**2, uxy - ux * uy
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    expected = s.mean()  # valid conv == crop-by-pad of same conv

    ours = metrics._ssim_2d(a, b)
    assert abs(ours - expected) < 1e-6


def test_jnp_psnr_matches_host():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 255, size=(24, 24, 1))
    b = a + rng.normal(0, 5, size=a.shape)
    host, _ = metrics.compute_psnr_and_ssim(a, b, border_size=2)
    dev = float(metrics.psnr_jnp(a, b, border_size=2))
    assert abs(host - dev) < 1e-3


def test_loss_image():
    a = np.zeros((8, 8, 1))
    b = np.full((8, 8, 1), 4.0)
    loss = metrics.get_loss_image(a, b, border_size=1)
    assert loss.shape == (6, 6, 1)
    np.testing.assert_allclose(loss, 16.0)
