#!/usr/bin/env python3
"""Offline converter: reference TF checkpoints -> native .npz checkpoints.

    python tools/convert_tf_checkpoint.py \
        --src /root/reference/models/dcscn_L7_...ckpt \
        --dst models/dcscn_L7_...ckpt.npz \
        --scale 2 --layers 7 --filters 32 --min_filters 8 \
        --filters_decay_gamma 1.2 --nin_filters 24 --nin_filters2 8

Config fields not encoded in the model name (pixel_shuffler_filters,
ver1 no-C graphs) are inferred from tensor shapes. Requires TensorFlow
(offline only; the runtime framework never imports TF).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dcscn_tpu.config import Config, build_parser  # noqa: E402


def main():
    parser = build_parser(extra_flags=[
        ("src", str, "", "source TF checkpoint prefix (path up to .ckpt)"),
        ("dst", str, "", "destination .npz path (default: models/<name>.ckpt.npz)"),
    ])
    ns = parser.parse_args()
    cfg_fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(ns).items() if k in cfg_fields})

    if not ns.src:
        parser.error("--src is required")

    from dcscn_tpu.io import checkpoint as ckpt_io
    from dcscn_tpu.io import tf_ckpt

    cfg = tf_ckpt.infer_config_overrides(ns.src, cfg)
    raw = tf_ckpt.convert_tf_checkpoint(ns.src, cfg)
    params, bn_state = tf_ckpt.split_bn(raw)

    dst = ns.dst or os.path.join(cfg.checkpoint_dir, cfg.name() + ".ckpt.npz")
    ckpt_io.save_params(dst, {"params": params, "bn_state": bn_state},
                        meta={"model_name": cfg.name(),
                              "config": dataclasses.asdict(cfg),
                              "source": ns.src})
    n = sum(v.size for layer in params.values() for v in layer.values())
    print("Converted %s -> %s (%s params)" % (ns.src, dst, "{:,}".format(n)))


if __name__ == "__main__":
    main()
