"""End-to-end guard on the shipped converted checkpoints: loading the L7
c-DCSCN weights and super-resolving a real set5 image must beat bicubic."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models", "dcscn_L7_F32to8_G1.20_NIN_A24_B8_PS_R1F32.ckpt.npz")
IMAGE = os.path.join(REPO, "data", "set5", "img_003_SRF_2_HR.png")


def _any_set5_image():
    d = os.path.join(REPO, "data", "set5")
    if not os.path.isdir(d):
        return None
    files = [os.path.join(d, f) for f in sorted(os.listdir(d))]
    return files[0] if files else None


@pytest.mark.skipif(not os.path.isfile(CKPT), reason="converted ckpt not present")
def test_l7_checkpoint_beats_bicubic_on_set5():
    image_path = IMAGE if os.path.isfile(IMAGE) else _any_set5_image()
    if image_path is None:
        pytest.skip("set5 not present")

    from dcscn_tpu.config import Config
    from dcscn_tpu.data import builders
    from dcscn_tpu.engine import InferenceEngine
    from dcscn_tpu.io import checkpoint as ckpt_io
    from dcscn_tpu.ops import color, metrics, patches
    from dcscn_tpu.ops import resize as resize_ops
    from dcscn_tpu.utils import imaging

    cfg = Config(layers=7, filters=32, min_filters=8, filters_decay_gamma=1.2,
                 nin_filters=24, nin_filters2=8, pixel_shuffler_filters=1,
                 self_ensemble=1, dropout_rate=0.8)
    tree = ckpt_io.load_params(CKPT)
    engine = InferenceEngine(tree["params"], cfg)

    true_image = patches.set_image_alignment(
        imaging.load_image(image_path, print_console=False), 2)
    input_y = builders.build_input_image(true_image, channels=1, scale=2,
                                         alignment=2, convert_ycbcr=True)
    true_y = color.convert_rgb_to_y(true_image)
    bicubic_y = resize_ops.resize_image(input_y, 2)

    output = engine.run(input_y, bicubic_y)
    psnr_model, _ = metrics.compute_psnr_and_ssim(true_y, output, border_size=2)
    psnr_bicubic, _ = metrics.compute_psnr_and_ssim(true_y, bicubic_y, border_size=2)

    assert psnr_model > psnr_bicubic + 1.0, (
        "converted ckpt should beat bicubic by >1 dB, got %.2f vs %.2f"
        % (psnr_model, psnr_bicubic))
