"""End-to-end guards on the shipped converted checkpoints: every loadable
reference model (converted by tools/convert_tf_checkpoint.py) must hit a
measured single-image PSNR floor, so converter or model regressions are
caught in CI rather than at full-eval time."""

import dataclasses
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models", "dcscn_L7_F32to8_G1.20_NIN_A24_B8_PS_R1F32.ckpt.npz")
IMAGE = os.path.join(REPO, "data", "set5", "img_003_SRF_2_HR.png")

# measured on data/set5/img_001.png, whole-image, ensemble=1, CPU backend
# (floors are measurement - 0.25 dB headroom); the L2 models are the
# reference's 4-filter smoke models and legitimately trail bicubic
_CKPT_FLOORS = {
    "dcscn_L7_F32to8_G1.20_NIN_A24_B8_PS_R1F32": 38.39,       # meas 38.644
    "dcscn_L7_F32to8_G1.20_Sc3_NIN_A24_B8_PS_R1F32": 35.15,   # meas 35.401
    "dcscn_L7_F32to8_G1.20_Sc4_NIN_A24_B8_PS_R1F32": 33.18,   # meas 33.429
    "dcscn_L7_F32to8_G1.20_Sc4_NIN_A24_B8_PS_DS_R1F32": 32.65,  # meas 32.901
    "dcscn_L2_F4to4_PS_R1F4": 31.22,                          # meas 31.472
    "dcscn_L2_F4to4_Sc4_PS_R1F4": 30.97,                      # meas 31.219
    # flagship L12 models trained in-framework: floors gate checkpoint
    # promotion — a half-trained overwrite of a canonical name must fail CI
    "dcscn_L12_F196to48_NIN_A64_PS_R1F32": 38.58,             # meas 38.835 (r4 L1 ft)
    "dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32": 35.29,         # meas 35.544 (r5 multi-scale ft)
    "dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32": 33.39,         # meas 33.638 (r5 full-staircase ms SWA soup)
}


def _run_single_image(ckpt_name):
    from dcscn_tpu.config import Config
    from dcscn_tpu.data import builders
    from dcscn_tpu.engine import InferenceEngine
    from dcscn_tpu.io import checkpoint as ckpt_io
    from dcscn_tpu.ops import color, metrics, patches
    from dcscn_tpu.ops import resize as resize_ops
    from dcscn_tpu.utils import imaging

    path = os.path.join(REPO, "models", ckpt_name + ".ckpt.npz")
    meta = ckpt_io.load_meta(path)
    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in meta["config"].items() if k in fields})
    cfg = cfg.replace(self_ensemble=1, tile_size=0, mesh_spatial=1)
    s = cfg.scale

    tree = ckpt_io.load_params(path)
    engine = InferenceEngine(tree.get("params", tree), cfg,
                             bn_state=tree.get("bn_state"))
    img = patches.set_image_alignment(
        imaging.load_image(os.path.join(REPO, "data", "set5", "img_001.png"),
                           print_console=False), s)
    input_y = builders.build_input_image(img, channels=1, scale=s,
                                         alignment=s, convert_ycbcr=True)
    true_y = color.convert_rgb_to_y(img)
    bicubic_y = resize_ops.resize_image(input_y, s)
    output = engine.run(input_y, bicubic_y)
    psnr, _ = metrics.compute_psnr_and_ssim(true_y, output, border_size=s)
    return psnr


@pytest.mark.parametrize("ckpt_name", sorted(_CKPT_FLOORS))
def test_converted_checkpoint_psnr_floor(ckpt_name):
    path = os.path.join(REPO, "models", ckpt_name + ".ckpt.npz")
    if not os.path.isfile(path):
        pytest.skip("converted ckpt %s not present" % ckpt_name)
    if not os.path.isfile(os.path.join(REPO, "data", "set5", "img_001.png")):
        pytest.skip("set5 not present")
    psnr = _run_single_image(ckpt_name)
    floor = _CKPT_FLOORS[ckpt_name]
    assert psnr >= floor, (
        "%s regressed: img_001 PSNR %.3f < floor %.2f" % (ckpt_name, psnr, floor))


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
