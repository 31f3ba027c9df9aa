"""Offline converter: reference TensorFlow checkpoints -> native pytrees.

The reference ships TF1 checkpoints whose variable scopes encode the graph
structure (verified against the mounted ckpts; see SURVEY.md §2b):

  CNN<i>/conv_W [k,k,in,out], CNN<i>/conv_B [out],
  CNN<i>/prelu/CNN<i>_prelu [out]
  A1|B1|B2/..., Up-PS/Up-PS_CNN/..., Up-PS2/Up-PS2_CNN/...,
  Up-TCNN/Tconv_W, R-CNN<i>/conv_W, <name>/BN/{gamma,beta,moving_*}
  depthwise-separable: <name>/depthwise_W + <name>/pointwise_W, plus a
  dense <name>/conv_W that the forward pass never uses
  (tf_graph.py:183-187) — skipped here.

conv_W layout is HWIO, identical to ours, so tensors copy through without
transposition. Adam slots and beta power accumulators are dropped.

TensorFlow is only imported inside these functions (offline tool); the
runtime framework never depends on TF.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn


def _reader(ckpt_path: str):
    import tensorflow.compat.v1 as tf  # local import: offline tool only

    return tf.train.load_checkpoint(ckpt_path)


def list_variables(ckpt_path: str) -> Dict[str, tuple]:
    reader = _reader(ckpt_path)
    return dict(reader.get_variable_to_shape_map())


def infer_config_overrides(ckpt_path: str, cfg: Config) -> Config:
    """Fill in config fields that the model-name string does not encode.

    The reference requires eval args to match training args by hand
    (README.md:123); we recover what we can from tensor shapes:
    - pixel_shuffler_filters from Up-PS*/conv_W output channels
    - reconstruct_filters from R-CNN1/conv_W when reconstruct_layers > 1
    """
    return infer_overrides_from_shapes(list_variables(ckpt_path), cfg)


def infer_overrides_from_shapes(shapes: Dict[str, tuple], cfg: Config) -> Config:
    """Shape-based config recovery shared by the TF-checkpoint and
    frozen-GraphDef readers (see infer_config_overrides)."""
    overrides = {}
    if not cfg.use_nin and "C/conv_W" not in shapes:
        # ver1-style graph: no 1x1 "C" layer; upsampler consumes the concat
        overrides["legacy_skip_c"] = True
        cfg = cfg.replace(legacy_skip_c=True)
    ps2 = "Up-PS2/Up-PS2_CNN/conv_W"
    ps1 = "Up-PS/Up-PS_CNN/conv_W"
    if ps2 in shapes:
        out_ch = shapes[ps2][3] // 4
        nin_ch = shapes[ps2][2]
        overrides["pixel_shuffler_filters"] = 0 if out_ch == nin_ch else out_ch
    elif ps1 in shapes:
        s = cfg.scale
        out_ch = shapes[ps1][3] // (s * s)
        nin_ch = shapes[ps1][2]
        overrides["pixel_shuffler_filters"] = 0 if out_ch == nin_ch else out_ch
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg


def convert_tf_checkpoint(ckpt_path: str, cfg: Config, strict: bool = True) -> Dict[str, Any]:
    """Read a reference TF checkpoint into a params pytree for `cfg`."""
    reader = _reader(ckpt_path)
    shapes = reader.get_variable_to_shape_map()

    def get(name: str) -> np.ndarray:
        if name not in shapes:
            raise KeyError("variable %r not found in %s" % (name, ckpt_path))
        return np.asarray(reader.get_tensor(name), dtype=np.float32)

    return _convert_from_source(get, cfg, strict)


def read_frozen_graph(pb_path: str) -> Dict[str, np.ndarray]:
    """Extract Const tensors from a frozen GraphDef (.pb) by node name.

    The reference's freeze pipeline (helper/custom_freeze_graph.py:14-61,
    then optionally helper/optimize_for_inference.py:74-101) rewrites each
    variable into a Const node carrying the variable's op name (e.g.
    "CNN1/conv_W"), so the checkpoint name mapping applies unchanged.
    Only the GraphDef protobuf is parsed — no TF session or graph import.
    """
    from tensorflow.core.framework import graph_pb2  # offline tool only
    from tensorflow.python.framework import tensor_util

    graph_def = graph_pb2.GraphDef()
    with open(pb_path, "rb") as f:
        graph_def.ParseFromString(f.read())
    consts: Dict[str, np.ndarray] = {}
    for node in graph_def.node:
        if node.op == "Const" and "value" in node.attr:
            try:
                consts[node.name] = tensor_util.MakeNdarray(node.attr["value"].tensor)
            except Exception:  # non-tensor consts (shapes, strings) — skip
                continue
    if not consts:
        raise ValueError("no Const tensors found in %s — not a frozen "
                         "GraphDef produced by convert_variables_to_constants?"
                         % pb_path)
    return consts


def convert_frozen_graph(pb_path: str, cfg: Config, strict: bool = True):
    """Read a reference frozen_model.pb into (params, inferred cfg).

    Drop-in interop for artifacts from the reference deployment pipeline
    (DCSCN.py:192-220 loads them into a TF session; here the consts feed
    the same layer_plan mapping as checkpoint conversion).
    """
    consts = read_frozen_graph(pb_path)
    cfg = infer_overrides_from_shapes({k: tuple(v.shape) for k, v in consts.items()}, cfg)

    def get(name: str) -> np.ndarray:
        if name not in consts:
            raise KeyError("const %r not found in %s" % (name, pb_path))
        return np.asarray(consts[name], dtype=np.float32)

    return _convert_from_source(get, cfg, strict), cfg


def _convert_from_source(get, cfg: Config, strict: bool = True) -> Dict[str, Any]:
    """Map reference-scoped tensors (from a checkpoint reader or a frozen
    GraphDef) onto the layer_plan pytree."""
    params: Dict[str, Any] = {}
    for spec in dcscn.layer_plan(cfg):
        name = spec["name"]
        scope = name + "/" + name + "_CNN" if spec["kind"] == "ps" else name
        layer: Dict[str, np.ndarray] = {}
        if spec["kind"] == "tconv":
            layer["w"] = get(name + "/Tconv_W")
            params[name] = layer
            continue
        if spec["separable"]:
            layer["dw"] = get(scope + "/depthwise_W")
            layer["pw"] = get(scope + "/pointwise_W")
            # the dense conv_W the reference trains-but-never-uses is skipped
        else:
            layer["w"] = get(scope + "/conv_W")
        if spec["bias"]:
            layer["b"] = get(scope + "/conv_B")
        if spec["activator"] == "prelu":
            layer["prelu"] = get(scope + "/prelu/" + name + "_prelu")
        if spec.get("bn"):
            layer_bn_scope = name + "/BN"
            layer["bn_scale"] = get(layer_bn_scope + "/gamma")
            layer["bn_offset"] = get(layer_bn_scope + "/beta")
            layer["bn_mean"] = get(layer_bn_scope + "/moving_mean")
            layer["bn_var"] = get(layer_bn_scope + "/moving_variance")
        params[name] = layer

        if strict:
            _check_shapes(name, spec, layer)
    return params


def _check_shapes(name: str, spec: Dict[str, Any], layer: Dict[str, np.ndarray]) -> None:
    k, cin, cout = spec["k"], spec["cin"], spec["cout"]
    if "w" in layer:
        expect = (k, k, cin, cout)
        if tuple(layer["w"].shape) != expect:
            raise ValueError(
                "%s/conv_W shape %s != expected %s — config does not match "
                "checkpoint (check scale/layers/filters/nin/pixel_shuffler_filters)"
                % (name, layer["w"].shape, expect)
            )
    if "dw" in layer:
        if tuple(layer["dw"].shape)[:3] != (k, k, cin):
            raise ValueError("%s/depthwise_W shape %s mismatches (k=%d cin=%d)"
                             % (name, layer["dw"].shape, k, cin))
        if tuple(layer["pw"].shape) != (1, 1, cin * layer["dw"].shape[3], cout):
            raise ValueError("%s/pointwise_W shape %s mismatches (cin=%d cout=%d)"
                             % (name, layer["pw"].shape, cin, cout))


def split_bn(params: Dict[str, Any]) -> (Dict[str, Any], Optional[Dict[str, Any]]):
    """Split converted BN leaves: running mean/var -> bn_state; the
    trainable gamma/beta stay in params as bn_scale/bn_offset."""
    bn_state: Dict[str, Any] = {}
    clean: Dict[str, Any] = {}
    for name, layer in params.items():
        rest = {k: v for k, v in layer.items() if k not in ("bn_mean", "bn_var")}
        bn = {k[3:]: v for k, v in layer.items() if k in ("bn_mean", "bn_var")}
        clean[name] = rest
        if bn:
            bn_state[name] = bn
    return clean, (bn_state if bn_state else None)
