"""Inference-artifact export — the freeze/optimize pipeline equivalent.

The reference freezes a checkpoint into a constant GraphDef and strips
training ops for deployment (helper/custom_freeze_graph.py:14-61,
helper/optimize_for_inference.py:74-101), consumed via
`SuperResolution.load_graph` (DCSCN.py:192-220).

The TPU-native equivalent: an exported artifact is (a) the params pytree
with optimizer/BN-training baggage stripped and BN folded into conv
weights where possible, plus (b) the exact model config, in one .npz +
.json pair. `evaluate --frozenInference --frozen_graph_path=...` loads it
without needing the original checkpoint directory or training flags.

An actual reference frozen_model.pb also loads through the same flag:
api.load_graph routes *.pb to io/tf_ckpt.convert_frozen_graph, which
parses the GraphDef's Const weights directly (no TF session).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from dcscn_tpu.config import Config
from dcscn_tpu.io import checkpoint as ckpt_io
from dcscn_tpu.models import dcscn


def fold_batch_norm(params: Dict[str, Any], bn_state: Optional[Dict[str, Any]],
                    cfg: Config, eps: float = 1e-3) -> Dict[str, Any]:
    """Fold inference-mode BN into the preceding conv's weights/bias
    (the optimize_for_inference BN-fold equivalent)."""
    if not bn_state:
        return params
    folded = {k: dict(v) for k, v in params.items()}
    for name, bn in bn_state.items():
        layer = folded[name]
        gamma = np.asarray(layer.pop("bn_scale", 1.0))
        beta = np.asarray(layer.pop("bn_offset", 0.0))
        scale = gamma / np.sqrt(np.asarray(bn["var"]) + eps)
        shift = beta - np.asarray(bn["mean"]) * scale
        if "w" in layer:
            layer["w"] = np.asarray(layer["w"]) * scale  # broadcast over out-ch
        else:
            layer["pw"] = np.asarray(layer["pw"]) * scale
        bias = np.asarray(layer.get("b", 0.0))
        layer["b"] = bias * scale + shift
    return folded


def export_model(path: str, params: Dict[str, Any], cfg: Config,
                 bn_state: Optional[Dict[str, Any]] = None) -> None:
    cfg_dict = dataclasses.asdict(cfg)
    if cfg.batch_norm and not bn_state:
        # fail HERE, not per-request at inference time against an
        # artifact that can never run (apply() requires running stats)
        raise ValueError(
            "cfg.batch_norm=True but no bn_state was provided — cannot "
            "export a runnable artifact (the checkpoint has no BN running "
            "stats to fold)")
    if bn_state:
        params = fold_batch_norm(params, bn_state, cfg)
        cfg_dict["batch_norm"] = False  # folded away
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ckpt_io.save_params(path, {"params": params})
    with open(path + ".json", "w") as f:
        json.dump({"config": cfg_dict, "format": "dcscn_tpu.export.v1"}, f, indent=2)
    print("Exported inference artifact [%s]" % path)


def load_exported(path: str, fallback_cfg: Config) -> Tuple[Dict[str, Any], None, Config]:
    tree = ckpt_io.load_params(path)
    params = tree.get("params", tree)
    meta = ckpt_io.load_meta(path)
    cfg = fallback_cfg
    if meta and "config" in meta:
        known = {f.name for f in dataclasses.fields(Config)}
        cfg = Config(**{k: v for k, v in meta["config"].items() if k in known})
    return params, None, cfg
