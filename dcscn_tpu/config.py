"""Configuration for the dcscn_tpu framework.

Drop-in flag surface: every flag name, default and meaning matches the
reference CLI (reference: helper/args.py:17-107) so a user of the reference
can pass the same command lines. Derived values reproduce the reference's
rules:

- ``stride_size == 0``  -> ``batch_image_size // 2``   (DCSCN.py:59-62)
- ``psnr_calc_border_size < 0`` -> ``scale``           (DCSCN.py:80-82)
- ``min_filters = min(filters, min_filters)``          (DCSCN.py:37)
- ``reconstruct_layers = max(reconstruct_layers, 1)``  (DCSCN.py:42)
- ``training_images`` rounded up to a batch multiple   (DCSCN.py:72)
- total epochs derived from the staircase LR schedule  (DCSCN.py:90-93)

The config-derived model name doubles as the checkpoint identity, exactly as
in the reference (DCSCN.py:108-144), so converted reference checkpoints are
found under the same names.
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import os
from typing import List, Optional, Sequence, Tuple


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "t", "1", "yes", "y"):
        return True
    if v.lower() in ("false", "f", "0", "no", "n"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected, got %r" % v)


@dataclasses.dataclass(frozen=True)
class Config:
    """All framework options; field names match the reference flags.

    Frozen (hashable) so a Config can be a jit static argument; use
    ``cfg.replace(...)`` to derive variants.
    """

    # Model (network) parameters (helper/args.py:16-36)
    scale: int = 2
    layers: int = 12
    filters: int = 196
    min_filters: int = 48
    filters_decay_gamma: float = 1.5
    use_nin: bool = True
    nin_filters: int = 64
    nin_filters2: int = 32
    cnn_size: int = 3
    reconstruct_layers: int = 1
    reconstruct_filters: int = 32
    dropout_rate: float = 0.8
    activator: str = "prelu"
    pixel_shuffler: bool = True
    pixel_shuffler_filters: int = 0
    self_ensemble: int = 8
    batch_norm: bool = False
    depthwise_separable: bool = False

    # Training parameters (helper/args.py:38-53)
    bicubic_init: bool = True
    clipping_norm: float = 5.0
    initializer: str = "he"
    weight_dev: float = 0.01
    l2_decay: float = 0.0001
    optimizer: str = "adam"
    beta1: float = 0.9
    beta2: float = 0.999
    epsilon: float = 1e-8
    momentum: float = 0.9
    batch_num: int = 20
    batch_image_size: int = 48
    stride_size: int = 0
    training_images: int = 24000
    use_l1_loss: bool = False

    # Learning-rate control (helper/args.py:55-60)
    initial_lr: float = 0.002
    lr_decay: float = 0.5
    lr_decay_epoch: int = 9
    end_lr: float = 2e-5

    # Dataset or others (helper/args.py:62-66)
    dataset: str = "bsd200"
    test_dataset: str = "set5"
    tests: int = 1
    do_benchmark: bool = False
    train_seed: int = 0

    # Image processing (helper/args.py:68-74)
    max_value: float = 255.0
    channels: int = 1
    psnr_calc_border_size: int = -1
    build_batch: bool = False
    reference_ssim: bool = False

    # Environment (helper/args.py:76-85)
    checkpoint_dir: str = "models"
    graph_dir: str = "graphs"
    data_dir: str = "data"
    batch_dir: str = "batch_data"
    output_dir: str = "output"
    tf_log_dir: str = "tf_log"
    log_filename: str = "log.txt"
    model_name: str = ""
    load_model_name: str = ""

    # Debugging or logging (helper/args.py:87-94)
    initialize_tf_log: bool = True
    enable_log: bool = True
    save_weights: bool = True
    save_images: bool = False
    save_images_num: int = 20
    save_meta_data: bool = False
    gpu_device_id: int = 0  # kept for CLI compatibility; selects jax device

    # Frozen-model options (helper/args.py:96-98). In this framework a
    # "frozen" model is an exported inference-only artifact (see io.export).
    frozenInference: bool = False
    frozen_graph_path: str = "./model_to_freeze/frozen_model_optimized.pb"

    # --- TPU-native additions (not present in the reference) ---
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    batch_format: str = "npz"  # patch store on disk: npz (fast) | bmp (reference-compatible)
    fused_nin: bool = False  # compute the 1x1 reconstruction convs as
    # accumulated per-tap matmuls instead of materializing the skip-concat
    # tensor (bit-equal up to f32 summation order; dense convs only).
    # Measured on v5e: XLA's concat pipeline wins at L12 shapes (33.7 vs
    # 28.1 MP/s), so this stays opt-in for bandwidth-bound configs.
    fuse_a1b1: bool = True  # evaluate the A1 and B1 NIN branches as one 1x1
    # conv over the skip concat (single HBM read of the concat tensor);
    # output-exact vs the unfused graph. Flag exists for A/B benchmarking.
    legacy_skip_c: bool = False  # ver1-style graphs: no 1x1 "C" layer when
    # use_nin=False (matches the shipped dcscn_L2_* checkpoints, whose Up-PS
    # consumes the skip-concat directly; inferred by the ckpt converter)
    mesh_data: int = 0  # data-parallel mesh size; 0 = all visible devices
    mesh_spatial: int = 1  # spatial-parallel inference mesh (rows / tile batch)
    tile_size: int = -1  # LR tile size for tiled inference; 0 = whole image,
    # -1 = auto: 48 on a TPU backend (one compiled program for any image
    # size — the reference gets this from its dynamic placeholder,
    # DCSCN.py:224-228; whole-image mode would recompile per shape at
    # 2-10 min/remote compile), 0 on CPU where compiles are cheap.
    # Resolved by resolve_backend_defaults().
    remat: bool = False  # jax.checkpoint the forward in training: recompute
    # activations in backward instead of storing them (trade FLOPs for HBM;
    # enables much larger batch/patch sizes)
    jit_cache_dir: str = "auto"  # persistent XLA compilation cache dir;
    # "auto" = .jax_cache on a TPU backend, off on CPU; "off"/"none"/"" = off
    platform: str = ""  # jax backend override ("cpu" to bypass the TPU
    # plugin the machine's sitecustomize forces); "" = leave default
    platform_devices: int = 0  # with --platform=cpu: number of virtual CPU
    # devices (0 = 1), for exercising mesh paths without real chips

    # ------------------------------------------------------------------
    # Derived values (reference semantics)
    # ------------------------------------------------------------------
    @property
    def effective_min_filters(self) -> int:
        # DCSCN.py:37
        return min(self.filters, self.min_filters)

    @property
    def effective_reconstruct_layers(self) -> int:
        # DCSCN.py:42
        return max(self.reconstruct_layers, 1)

    @property
    def effective_stride_size(self) -> int:
        # DCSCN.py:59-62
        return self.batch_image_size // 2 if self.stride_size == 0 else self.stride_size

    @property
    def effective_psnr_border(self) -> int:
        # DCSCN.py:80-82 (the code uses `scale`, not the flag help's "2+scale")
        return self.scale if self.psnr_calc_border_size < 0 else self.psnr_calc_border_size

    @property
    def effective_training_images(self) -> int:
        # DCSCN.py:72
        return int(math.ceil(self.training_images / self.batch_num) * self.batch_num)

    @property
    def output_channels(self) -> int:
        return 1

    @property
    def total_epochs(self) -> int:
        # DCSCN.py:90-93: epochs until staircase LR drops below end_lr.
        total = 0
        lr = self.initial_lr
        while lr > self.end_lr:
            total += self.lr_decay_epoch
            lr *= self.lr_decay
        return total

    # ------------------------------------------------------------------
    # Model-name derivation (checkpoint identity) — DCSCN.py:108-144
    # ------------------------------------------------------------------
    def name(self, name_postfix: str = "") -> str:
        if self.model_name == "":
            name = "dcscn_L%d_F%d" % (self.layers, self.filters)
            if self.effective_min_filters != 0:
                name += "to%d" % self.effective_min_filters
            if self.filters_decay_gamma != 1.5:
                name += "_G%2.2f" % self.filters_decay_gamma
            if self.cnn_size != 3:
                name += "_C%d" % self.cnn_size
            if self.scale != 2:
                name += "_Sc%d" % self.scale
            if self.use_nin:
                name += "_NIN"
                if self.nin_filters != 0:
                    name += "_A%d" % self.nin_filters
                if self.nin_filters2 != self.nin_filters // 2:
                    name += "_B%d" % self.nin_filters2
            if self.pixel_shuffler:
                name += "_PS"
            if self.max_value != 255.0:
                name += "_M%2.1f" % self.max_value
            if self.activator != "prelu":
                name += "_%s" % self.activator
            if self.batch_norm:
                name += "_BN"
            if self.depthwise_separable:
                name += "_DS"
            if self.effective_reconstruct_layers >= 1:
                name += "_R%d" % self.effective_reconstruct_layers
                if self.reconstruct_filters != 1:
                    name += "F%d" % self.reconstruct_filters
            if name_postfix != "":
                name += "_" + name_postfix
        else:
            name = "dcscn_%s" % self.model_name
        return name

    # ------------------------------------------------------------------
    # Feature-extractor widths — DCSCN.py:240-244
    # ------------------------------------------------------------------
    def feature_widths(self) -> List[int]:
        widths = []
        out = self.filters
        fmin = self.effective_min_filters
        for i in range(self.layers):
            if fmin != 0 and i > 0:
                x1 = i / float(self.layers - 1)
                y1 = math.pow(x1, 1.0 / self.filters_decay_gamma)
                out = int((self.filters - fmin) * (1 - y1) + fmin)
            widths.append(out)
        return widths

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# ----------------------------------------------------------------------
# CLI parsing
# ----------------------------------------------------------------------

_HELP = {
    "scale": "Scale factor for Super Resolution (should be 2 or more)",
    "layers": "Number of layers of feature extraction CNNs",
    "filters": "Number of filters of first feature-extraction CNNs",
    "min_filters": "Number of filters of last feature-extraction CNNs",
    "filters_decay_gamma": "Number of CNN filters are decayed from [filters] to [min_filters] by this gamma",
    "use_nin": "Use Network In Network",
    "nin_filters": "Number of CNN filters in A1 at Reconstruction network",
    "nin_filters2": "Number of CNN filters in B1 and B2 at Reconstruction net.",
    "cnn_size": "Size of CNN filters",
    "reconstruct_layers": "Number of Reconstruct CNN Layers. (can be 0.)",
    "reconstruct_filters": "Number of Reconstruct CNN Filters",
    "dropout_rate": "Output nodes should be kept by this probability. If 1, don't use dropout.",
    "activator": "Activator can be [relu, leaky_relu, prelu, sigmoid, tanh, selu]",
    "pixel_shuffler": "Use Pixel Shuffler instead of transposed CNN",
    "pixel_shuffler_filters": "Num of Pixel Shuffler output channels. 0 means use same channels as input.",
    "self_ensemble": "Number of using self ensemble method. [1 - 8]",
    "batch_norm": "use batch normalization after each CNNs",
    "depthwise_separable": "use depthwise separable convolutions for each CNN layer instead",
    "bicubic_init": "make bicubic interpolation values as initial input for x2",
    "clipping_norm": "Norm for gradient clipping. If it's <= 0 we don't use gradient clipping.",
    "initializer": "Initializer for weights can be [uniform, stddev, xavier, he, identity, zero]",
    "weight_dev": "Initial weight stddev (won't be used when you use he or xavier initializer)",
    "l2_decay": "l2_decay",
    "optimizer": "Optimizer can be [gd, momentum, adadelta, adagrad, adam, rmsprop]",
    "beta1": "Beta1 for adam optimizer",
    "beta2": "Beta2 for adam optimizer",
    "epsilon": "epsilon for adam optimizer",
    "momentum": "Momentum for momentum optimizer and rmsprop optimizer",
    "batch_num": "Number of mini-batch images for training",
    "batch_image_size": "Image size for mini-batch",
    "stride_size": "Stride size for mini-batch. If it is 0, use half of batch_image_size",
    "training_images": "Number of training on each epoch",
    "use_l1_loss": "Use L1 Error as loss function instead of MSE Error.",
    "train_seed": "Offset for the init/shuffle PRNG seeds (additive with the trial "
                  "index). Use a different value to get an independent same-recipe "
                  "run, e.g. a second soup member (the reference has no seed control).",
    "initial_lr": "Initial learning rate",
    "lr_decay": "Learning rate decay rate",
    "lr_decay_epoch": "After this epochs are completed, learning rate will be decayed by lr_decay.",
    "end_lr": "Training end learning rate.",
    "dataset": "Training dataset dir. [yang91, general100, bsd200, other]",
    "test_dataset": "Directory for test dataset [set5, set14, bsd100, urban100, all]",
    "tests": "Number of training sets",
    "do_benchmark": "Evaluate the performance for set5, set14 and bsd100 after the training.",
    "max_value": "For normalize image pixel value",
    "channels": "Number of image channels used. Now it should be 1. using only Y from YCbCr.",
    "psnr_calc_border_size": "Cropping border size for calculating PSNR. if < 0, use scale for default.",
    "reference_ssim": "Report the reference's literal column-averaged SSIM (its "
                      "multichannel-on-2D skimage call, helper/utilty.py:529-535) instead "
                      "of the intended 2-D SSIM, for byte-compatible comparisons.",
    "build_batch": "Build pre-processed input batch.",
    "checkpoint_dir": "Directory for checkpoints",
    "graph_dir": "Directory for graphs",
    "data_dir": "Directory for original images",
    "batch_dir": "Directory for training batch images",
    "output_dir": "Directory for output test images",
    "tf_log_dir": "Directory for tensorboard log",
    "log_filename": "log filename",
    "model_name": "model name for save files and tensorboard log",
    "load_model_name": "Filename of model loading before start [filename or 'default']",
    "initialize_tf_log": "Clear all tensorboard log before start",
    "enable_log": "Enables tensorboard-log. Save loss.",
    "save_weights": "Save weights and biases/gradients",
    "save_images": "Save CNN weights as images",
    "save_images_num": "Number of CNN images saved",
    "save_meta_data": "Save profiler traces",
    "gpu_device_id": "Device ID which will be used to compute.",
    "frozenInference": "Flag for whether the model to evaluate is an exported inference artifact.",
    "frozen_graph_path": "the path to an exported model if performing inference from it",
    "dtype": "Compute dtype [float32, bfloat16]",
    "batch_format": "On-disk patch store format [npz, bmp]",
    "mesh_data": "Data-parallel mesh size (0 = all visible devices)",
    "mesh_spatial": "Spatial-parallel inference mesh size: whole-image rows "
    "shard with halo exchange; in tile mode the tile batch shards across "
    "the mesh",
    "tile_size": "LR tile size for tiled inference (0 = whole image, "
    "-1 = auto: 48 on TPU so any image size reuses one compiled program, "
    "0 on CPU)",
    "jit_cache_dir": "Persistent XLA compilation cache directory "
    "('auto' = .jax_cache on TPU, off on CPU; 'off'/'none' = disabled)",
    "platform": "JAX backend override (e.g. 'cpu'); empty = default",
    "platform_devices": "Virtual CPU device count with --platform=cpu "
    "(0 = 1); lets mesh paths run without real chips",
}


def resolve_backend_defaults(cfg: "Config"):
    """Resolve backend-sensitive sentinel fields against the ACTIVE jax
    backend; returns (resolved_cfg, notes) where notes are human-readable
    lines describing each auto-choice.

    TPU-safe defaults (VERDICT r3): on the TPU backend whole-image
    inference compiles one program per distinct image shape at 2-10 min per
    remote compile, so `tile_size` auto-resolves to 48 (bucketed tiled
    mode: a handful of programs cover any image size — the property the
    reference gets from a single dynamic placeholder, DCSCN.py:224-228)
    and the persistent XLA compilation cache defaults on. On CPU compiles
    are cheap and whole-image mode stays the default."""
    import jax

    backend = jax.default_backend()
    notes = []
    if cfg.tile_size < 0:
        tile = 48 if backend != "cpu" else 0
        notes.append("tile_size=auto resolved to %d (backend: %s)"
                     % (tile, backend))
        cfg = cfg.replace(tile_size=tile)
    jc = cfg.jit_cache_dir
    if jc == "auto":
        if backend != "cpu":
            # Absolute, cwd-independent: a checkout's warm cache if we're
            # inside one, else a stable per-user cache dir — a relative
            # ".jax_cache" would silently start a fresh (2-10 min/shape)
            # cache for every launch directory.
            local = os.path.abspath(".jax_cache")
            jc = local if os.path.isdir(local) else os.path.join(
                os.path.expanduser("~"), ".cache", "dcscn_tpu", "jax_cache")
        else:
            jc = ""
        if jc:
            notes.append("jit_cache_dir=auto resolved to %s (backend: %s)"
                         % (jc, backend))
        cfg = cfg.replace(jit_cache_dir=jc)
    elif jc.lower() in ("off", "none"):
        cfg = cfg.replace(jit_cache_dir="")
    return cfg, notes


def apply_platform(cfg: "Config") -> None:
    """Select the jax backend from --platform/--platform_devices.

    Must run before the first jax operation: XLA_FLAGS and
    jax_num_cpu_devices are only honored pre-initialization, and this
    machine's sitecustomize forces the TPU plugin so env vars alone cannot
    select CPU (see tests/conftest.py for the same bootstrap).
    """
    if not cfg.platform:
        return
    import os

    os.environ["JAX_PLATFORMS"] = cfg.platform
    if cfg.platform == "cpu" and cfg.platform_devices > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=%d"
                % cfg.platform_devices).strip()

    import jax

    jax.config.update("jax_platforms", cfg.platform)
    if cfg.platform == "cpu" and cfg.platform_devices > 1:
        try:
            jax.config.update("jax_num_cpu_devices", cfg.platform_devices)
        except Exception:  # already initialized: XLA_FLAGS had to do it
            pass
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:  # pragma: no cover - jax version fallback
        pass


def build_parser(extra_flags: Sequence[Tuple[str, type, object, str]] = ()) -> argparse.ArgumentParser:
    """Build an argparse parser over every Config field (+ per-CLI extras).

    ``extra_flags`` entries are (name, type, default, help), mirroring how
    the reference CLIs add their own flags (evaluate.py:38-39, sr.py:34,
    augmentation.py:20).
    """
    parser = argparse.ArgumentParser(
        description="dcscn_tpu — TPU-native DCSCN super resolution",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    for field in dataclasses.fields(Config):
        name = "--" + field.name
        default = field.default
        help_text = _HELP.get(field.name, "")
        if field.type in ("bool", bool):
            parser.add_argument(name, type=str2bool, default=default, nargs="?", const=True, help=help_text)
        elif field.type in ("int", int):
            parser.add_argument(name, type=int, default=default, help=help_text)
        elif field.type in ("float", float):
            parser.add_argument(name, type=float, default=default, help=help_text)
        else:
            parser.add_argument(name, type=str, default=default, help=help_text)
    for fname, ftype, fdefault, fhelp in extra_flags:
        if ftype is bool:
            parser.add_argument("--" + fname, type=str2bool, default=fdefault, nargs="?", const=True, help=fhelp)
        else:
            parser.add_argument("--" + fname, type=ftype, default=fdefault, help=fhelp)
    return parser


def parse_args(
    argv: Optional[Sequence[str]] = None,
    extra_flags: Sequence[Tuple[str, type, object, str]] = (),
):
    """Parse argv into (Config, extras-namespace)."""
    parser = build_parser(extra_flags)
    ns = parser.parse_args(argv)
    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in cfg_fields})
    apply_platform(cfg)
    # Backend-sensitive sentinels (tile_size=-1, jit_cache_dir=auto) are
    # NOT resolved here: resolving needs jax.default_backend(), which would
    # attach every CLI — including host-only tools like augmentation.py —
    # to the TPU at flag-parse time. SuperResolution.__init__ resolves (and
    # logs the choices) for every flow that actually runs the model.
    return cfg, ns
