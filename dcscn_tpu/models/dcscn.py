"""DCSCN v2 as a pure function: params pytree + apply.

Architecture spec reproduced from the reference graph builder
(DCSCN.py:222-332, helper/tf_graph.py:77-249):

1. Feature extractor: `layers` SAME 3x3 convs whose widths decay from
   `filters` to `min_filters` as int((F-Fmin)*(1-(i/(L-1))^(1/gamma))+Fmin)
   (DCSCN.py:240-244); each is conv + bias + activator (+BN) (+dropout),
   with every layer's output retained.
2. Skip concatenation of all feature maps on channels (DCSCN.py:258-259).
3. NIN reconstruction: A1 = 1x1 conv -> nin_filters from the concat,
   B1 = 1x1 -> nin_filters2, B2 = 3x3 B1 -> nin_filters2, output
   concat([B2, A1]) (DCSCN.py:273-282) — or a single 1x1 -> filters when
   use_nin is off (DCSCN.py:288-290).
4. Upsampling: pixel shuffler (3x3 conv to scale^2*out_ch then
   depth_to_space, no activation; x4 = two chained x2 stages,
   DCSCN.py:293-309, tf_graph.py:238-249) or a stride-`scale` transposed
   conv with fixed bilinear-init kernel (tf_graph.py:219-236).
5. Reconstruction tail: reconstruct_layers-1 3x3 convs (bias+activator),
   then a final 3x3 conv to 1 channel with NO bias and NO activation
   (DCSCN.py:313-323).
6. Global residual: output = tail + bicubic-upscaled input (DCSCN.py:325).
7. Depthwise-separable variant: feature/NIN/pixel-shuffler/final convs
   become separable (depthwise [k,k,in,1] + pointwise [1,1,in,out]); the
   intermediate reconstruction-tail convs stay dense, matching the
   reference exactly (DCSCN.py:313-315 always calls build_conv).
   The reference also allocates a dense `conv_W` per separable layer that
   the forward pass never uses (tf_graph.py:183-187); we do not.

TPU-first notes: NHWC + HWIO layouts feed XLA's TPU conv emitter directly
(MXU); the pixel shuffler is a reshape/transpose (free layout op); PReLU and
bias adds fuse into the conv epilogue; dropout uses explicit PRNG keys.
Params default to float32 for checkpoint parity; pass compute_dtype=bfloat16
for speed (weights are cast at apply time).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcscn_tpu.config import Config

Params = Dict[str, Dict[str, jnp.ndarray]]
BnState = Dict[str, Dict[str, jnp.ndarray]]


# ----------------------------------------------------------------------
# Initializers (reference: helper/utilty.py:348-413)
# ----------------------------------------------------------------------


def _truncated_normal(rng, shape, stddev):
    # TF truncated_normal: resample outside 2 sigma
    return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype=jnp.float32)


def init_weight(rng, shape, initializer: str = "he", stddev: float = 0.01, uniform: bool = False):
    """Conv kernel init, HWIO [k, k, in, out]."""
    k0, k1, fan_in_c, fan_out_c = shape
    if initializer == "xavier":
        fan_in = k0 * k1 * fan_in_c
        fan_out = k0 * k1 * fan_out_c
        n = fan_in + fan_out
        if uniform:
            r = math.sqrt(6.0 / n)
            return jax.random.uniform(rng, shape, jnp.float32, -r, r)
        return _truncated_normal(rng, shape, math.sqrt(3.0 / n))
    if initializer == "he":
        n = k0 * k1 * fan_in_c
        return _truncated_normal(rng, shape, math.sqrt(2.0 / n))
    if initializer == "uniform":
        return jax.random.uniform(rng, shape, jnp.float32, -2.0 * stddev, 2.0 * stddev)
    if initializer == "stddev":
        return _truncated_normal(rng, shape, stddev)
    if initializer == "identity":
        init = np.array(_truncated_normal(rng, shape, math.sqrt(2.0 / (k0 * k1 * fan_in_c))))
        i, j = k0 // 2, k1 // 2
        for c in range(min(fan_in_c, fan_out_c)):
            init[i, j, c, c] = 1.0
        return jnp.asarray(init)
    return jnp.zeros(shape, jnp.float32)


def upsample_filter(size: int) -> np.ndarray:
    """Separable bilinear upsampling tap (reference: helper/utilty.py:366-374)."""
    factor = (size + 1) // 2
    center = factor - 1 if size % 2 == 1 else factor - 0.5
    og = np.ogrid[:size, :size]
    return (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)


def get_upscale_filter_size(scale: int) -> int:
    return 2 * scale - scale % 2


def upscale_weight(scale: int, channels: int) -> jnp.ndarray:
    """Fixed bilinear-init transposed-conv kernel [k, k, ch, ch]
    (reference: helper/utilty.py:381-390)."""
    k = get_upscale_filter_size(scale)
    init = np.zeros([k, k, channels, channels], dtype=np.float32)
    fm = upsample_filter(k)
    for i in range(channels):
        init[:, :, i, i] = fm
    return jnp.asarray(init)


# ----------------------------------------------------------------------
# Parameter construction
# ----------------------------------------------------------------------


def _conv_param(rng, cfg: Config, k: int, cin: int, cout: int, use_bias: bool, use_prelu: bool,
                separable: bool, use_bn: bool = False) -> Dict[str, jnp.ndarray]:
    p: Dict[str, jnp.ndarray] = {}
    r_w, r_dw, r_pw = jax.random.split(rng, 3)
    if separable:
        p["dw"] = init_weight(r_dw, (k, k, cin, 1), cfg.initializer, cfg.weight_dev)
        p["pw"] = init_weight(r_pw, (1, 1, cin, cout), cfg.initializer, cfg.weight_dev)
    else:
        p["w"] = init_weight(r_w, (k, k, cin, cout), cfg.initializer, cfg.weight_dev)
    if use_bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    if use_prelu:
        # per-channel alpha initialized to 0.1 (tf_graph.py:91)
        p["prelu"] = jnp.full((cout,), 0.1, jnp.float32)
    if use_bn:
        # trainable BN affine (gamma/beta) lives in params so it receives
        # gradients like tf.layers.batch_normalization's; running mean/var
        # live in bn_state (non-differentiated)
        p["bn_scale"] = jnp.ones((cout,), jnp.float32)
        p["bn_offset"] = jnp.zeros((cout,), jnp.float32)
    return p


def layer_plan(cfg: Config) -> List[Dict[str, Any]]:
    """Ordered layer descriptors: name, kind, kernel, cin, cout, flags.

    This single source of truth drives init, apply, the checkpoint
    converter, and the complexity report.
    """
    plan: List[Dict[str, Any]] = []
    act = cfg.activator
    widths = cfg.feature_widths()
    cin = cfg.channels
    for i, cout in enumerate(widths):
        plan.append(
            dict(name="CNN%d" % (i + 1), kind="conv", k=cfg.cnn_size, cin=cin, cout=cout,
                 bias=True, activator=act, bn=cfg.batch_norm, dropout=True,
                 separable=cfg.depthwise_separable, tap=True)
        )
        cin = cout
    total_features = sum(widths)

    if cfg.use_nin:
        plan.append(dict(name="A1", kind="conv", k=1, cin=total_features, cout=cfg.nin_filters,
                         bias=True, activator=act, bn=False, dropout=True,
                         separable=cfg.depthwise_separable, input="concat"))
        plan.append(dict(name="B1", kind="conv", k=1, cin=total_features, cout=cfg.nin_filters2,
                         bias=True, activator=act, bn=False, dropout=True,
                         separable=cfg.depthwise_separable, input="concat"))
        plan.append(dict(name="B2", kind="conv", k=3, cin=cfg.nin_filters2, cout=cfg.nin_filters2,
                         bias=True, activator=act, bn=False, dropout=True,
                         separable=cfg.depthwise_separable))
        up_in = cfg.nin_filters + cfg.nin_filters2
    elif cfg.legacy_skip_c:
        # ver1-style: upsampler consumes the skip-concat directly (matches
        # the shipped dcscn_L2_* checkpoints; no "C" variables exist there)
        up_in = total_features
    else:
        plan.append(dict(name="C", kind="conv", k=1, cin=total_features, cout=cfg.filters,
                         bias=True, activator=act, bn=False, dropout=True,
                         separable=cfg.depthwise_separable, input="concat"))
        up_in = cfg.filters

    if cfg.pixel_shuffler:
        out_ch = cfg.pixel_shuffler_filters if cfg.pixel_shuffler_filters != 0 else up_in
        if cfg.scale == 4:
            plan.append(dict(name="Up-PS", kind="ps", k=cfg.cnn_size, cin=up_in,
                             cout=4 * up_in, ps_scale=2, ps_out=up_in,
                             bias=True, activator=None, bn=False, dropout=False,
                             separable=cfg.depthwise_separable))
            plan.append(dict(name="Up-PS2", kind="ps", k=cfg.cnn_size, cin=up_in,
                             cout=4 * out_ch, ps_scale=2, ps_out=out_ch,
                             bias=True, activator=None, bn=False, dropout=False,
                             separable=cfg.depthwise_separable))
        else:
            s = cfg.scale
            plan.append(dict(name="Up-PS", kind="ps", k=cfg.cnn_size, cin=up_in,
                             cout=s * s * out_ch, ps_scale=s, ps_out=out_ch,
                             bias=True, activator=None, bn=False, dropout=False,
                             separable=cfg.depthwise_separable))
        rin = out_ch
    else:
        plan.append(dict(name="Up-TCNN", kind="tconv", k=get_upscale_filter_size(cfg.scale),
                         cin=up_in, cout=up_in, bias=False, activator=None, bn=False,
                         dropout=False, separable=False, tconv_scale=cfg.scale))
        rin = up_in

    n_rec = cfg.effective_reconstruct_layers
    for i in range(n_rec - 1):
        # intermediate tail layers are always dense (DCSCN.py:313-315)
        plan.append(dict(name="R-CNN%d" % (i + 1), kind="conv", k=cfg.cnn_size, cin=rin,
                         cout=cfg.reconstruct_filters, bias=True, activator=act, bn=False,
                         dropout=True, separable=False))
        rin = cfg.reconstruct_filters
    plan.append(dict(name="R-CNN%d" % n_rec, kind="conv", k=cfg.cnn_size, cin=rin,
                     cout=cfg.output_channels, bias=False, activator=None, bn=False,
                     dropout=False, separable=cfg.depthwise_separable))
    return plan


def init_params(rng, cfg: Config) -> Params:
    params: Params = {}
    plan = layer_plan(cfg)
    rngs = jax.random.split(rng, len(plan))
    for r, spec in zip(rngs, plan):
        if spec["kind"] == "tconv":
            params[spec["name"]] = {"w": upscale_weight(spec["tconv_scale"], spec["cin"])}
            continue
        params[spec["name"]] = _conv_param(
            r, cfg, spec["k"], spec["cin"], spec["cout"],
            use_bias=spec["bias"], use_prelu=(spec["activator"] == "prelu"),
            separable=spec["separable"], use_bn=bool(spec.get("bn")),
        )
    return params


def init_bn_state(cfg: Config) -> Optional[BnState]:
    """Running statistics only; the trainable gamma/beta are in params."""
    if not cfg.batch_norm:
        return None
    state: BnState = {}
    for spec in layer_plan(cfg):
        if spec.get("bn"):
            c = spec["cout"]
            state[spec["name"]] = {
                "mean": jnp.zeros((c,), jnp.float32),
                "var": jnp.ones((c,), jnp.float32),
            }
    return state


# ----------------------------------------------------------------------
# Forward pass
# ----------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, *, groups: int = 1):
    # f32 operands: request an explicit f32 accumulator. bf16 operands:
    # let the output stay bf16 — the MXU still accumulates f32 internally,
    # callers downcast to the compute dtype right after anyway, and a
    # f32-output conv over bf16 operands is NOT differentiable (the VJP's
    # transpose rule would pair the f32 cotangent with the bf16 weights,
    # which lax.conv_general_dilated rejects).
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=_DN, feature_group_count=groups,
        preferred_element_type=pet,
    )


def _separable_conv(x, dw, pw):
    """TF separable_conv2d (tf_graph.py:161-166): depthwise [k,k,in,mult]
    then pointwise [1,1,in*mult,out]."""
    k0, k1, cin, mult = dw.shape
    dw_lax = dw.reshape(k0, k1, 1, cin * mult)  # grouped-conv layout
    h = _conv(x, dw_lax, groups=cin)
    return _conv(h, pw)


def _activate(x, activator: Optional[str], prelu_alpha=None, leaky_alpha: float = 0.1):
    """tf_graph.py:77-98 semantics."""
    if activator is None or activator == "":
        return x
    if activator == "relu":
        return jax.nn.relu(x)
    if activator == "sigmoid":
        return jax.nn.sigmoid(x)
    if activator == "tanh":
        return jnp.tanh(x)
    if activator == "leaky_relu":
        return jnp.maximum(x, leaky_alpha * x)
    if activator == "prelu":
        # exact reference formula: relu(x) + alpha * (x - |x|) * 0.5
        return jax.nn.relu(x) + prelu_alpha * (x - jnp.abs(x)) * 0.5
    if activator == "selu":
        return jax.nn.selu(x)
    raise ValueError("Not implemented activator: %s" % activator)


def _batch_norm(x, bn, scale, offset, training: bool, momentum: float = 0.99,
                eps: float = 1e-3):
    """tf.layers.batch_normalization defaults (tf_graph.py:113). `bn` holds
    running mean/var; `scale`/`offset` are the trainable affine params."""
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_bn = {
            "mean": momentum * bn["mean"] + (1 - momentum) * mean,
            "var": momentum * bn["var"] + (1 - momentum) * var,
        }
    else:
        mean, var = bn["mean"], bn["var"]
        new_bn = bn
    y = (x - mean) * jax.lax.rsqrt(var + eps) * scale + offset
    return y, new_bn


def _depth_to_space(x, block: int):
    """TF depth_to_space NHWC semantics (tf_graph.py:248):
    out[b, h*B+i, w*B+j, c] = in[b, h, w, (i*B+j)*C + c]."""
    n, h, w, c = x.shape
    cout = c // (block * block)
    x = x.reshape(n, h, w, block, block, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, cout)


def _conv_transpose(x, w, scale: int):
    """TF conv2d_transpose(strides=scale, SAME, output=in*scale)
    (tf_graph.py:227-228): the gradient/transpose of a SAME strided conv,
    expressed as an input-dilated conv for XLA."""
    return jax.lax.conv_transpose(
        x, w, strides=(scale, scale), padding="SAME",
        dimension_numbers=_DN, transpose_kernel=True,
    )


def apply(
    params: Params,
    x: jnp.ndarray,
    x2: jnp.ndarray,
    cfg: Config,
    *,
    training: bool = False,
    keep_prob: Optional[float] = None,
    dropout_rng=None,
    bn_state: Optional[BnState] = None,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, Optional[BnState]]:
    """Forward pass.

    x:  [N, h, w, channels] LR luminance input
    x2: [N, h*scale, w*scale, 1] bicubic-upscaled input (global skip)
    Returns (y, new_bn_state). Inference: training=False (dropout off,
    matching the reference feeding dropout_keep_rate=1.0, DCSCN.py:575-579).
    """
    plan = layer_plan(cfg)
    keep = cfg.dropout_rate if keep_prob is None else keep_prob
    use_dropout = training and keep < 1.0
    if use_dropout and dropout_rng is None:
        raise ValueError("dropout_rng required when training with dropout_rate < 1")
    if cfg.batch_norm and bn_state is None:
        raise ValueError(
            "cfg.batch_norm=True but bn_state is None — pass the running "
            "mean/var state (silently skipping BN would corrupt outputs)")

    x = x.astype(compute_dtype)
    new_bn: BnState = {} if bn_state is not None else None

    taps: List[jnp.ndarray] = []  # feature-extractor outputs (skip concat)
    h = x
    concat = None
    a1 = None
    drop_i = 0
    # fused-NIN path: 1x1 convs over the skip concat evaluated as
    # accumulated per-tap matmuls — the [N,H,W,sum(widths)] concat tensor is
    # never materialized (it is pure HBM traffic: written once, read by both
    # A1 and B1). Only for dense 1x1 consumers.
    fuse_concat = cfg.fused_nin and not cfg.depthwise_separable and not cfg.legacy_skip_c
    # A1+B1 single-read path (default): both NIN branches read the same
    # huge skip-concat tensor; evaluating them as ONE 1x1 conv with
    # [nin_filters + nin_filters2] output channels halves the concat's HBM
    # read traffic (per-output-channel math is unchanged — each column of
    # the fused weight is a column of A1's or B1's weight). Bias/PReLU/
    # dropout still run per-branch when the loop reaches each spec.
    fuse_a1b1 = (cfg.fuse_a1b1 and cfg.use_nin
                 and not cfg.depthwise_separable and not fuse_concat)
    pending_b1 = None

    def maybe_dropout(t):
        nonlocal drop_i
        if not use_dropout:
            return t
        rng = jax.random.fold_in(dropout_rng, drop_i)
        drop_i += 1
        mask = jax.random.bernoulli(rng, keep, t.shape)
        return jnp.where(mask, t / keep, jnp.zeros_like(t))

    for spec in plan:
        name = spec["name"]
        p = params[name]
        if spec["kind"] == "tconv":
            h = _conv_transpose(h, p["w"].astype(compute_dtype), spec["tconv_scale"])
            continue

        if name == "B1" and pending_b1 is not None:
            out = pending_b1
            pending_b1 = None
        elif name == "A1" and fuse_a1b1:
            w_ab = jnp.concatenate(
                [params["A1"]["w"], params["B1"]["w"]], axis=-1
            ).astype(compute_dtype)
            both = _conv(concat, w_ab)
            n_a = params["A1"]["w"].shape[-1]
            out = both[..., :n_a]
            pending_b1 = both[..., n_a:].astype(compute_dtype)
        elif spec.get("input") == "concat" and fuse_concat:
            # sum_i tap_i @ W[offset_i : offset_i + c_i]  (1x1 conv == matmul)
            w = p["w"].astype(compute_dtype)[0, 0]  # [total_ch, out]
            out = None
            off = 0
            for tap in taps:
                ci = tap.shape[-1]
                part = jax.lax.dot_general(
                    tap, w[off : off + ci],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    # same differentiability constraint as _conv: an f32
                    # accumulator output over bf16 operands breaks the VJP
                    preferred_element_type=(jnp.float32 if tap.dtype == jnp.float32
                                            else None),
                )
                out = part if out is None else out + part
                off += ci
        else:
            inp = concat if spec.get("input") == "concat" else h
            if spec["separable"]:
                out = _separable_conv(inp, p["dw"].astype(compute_dtype), p["pw"].astype(compute_dtype))
            else:
                out = _conv(inp, p["w"].astype(compute_dtype))
        out = out.astype(compute_dtype)  # convs accumulate f32; keep
        # activations in the compute dtype (bf16 halves HBM traffic)
        if spec["bias"]:
            out = out + p["b"].astype(compute_dtype)
        if spec["bn"] and bn_state is not None:
            out, nb = _batch_norm(out, bn_state[name], p["bn_scale"].astype(compute_dtype),
                                  p["bn_offset"].astype(compute_dtype), training)
            new_bn[name] = nb
        if spec["activator"]:
            alpha = p.get("prelu")
            if alpha is not None:
                alpha = alpha.astype(compute_dtype)
            out = _activate(out, spec["activator"], alpha)
        if spec["dropout"]:
            out = maybe_dropout(out)

        if spec["kind"] == "ps":
            out = _depth_to_space(out, spec["ps_scale"])

        if spec.get("tap"):
            taps.append(out)
            if len(taps) == cfg.layers:
                if not fuse_concat:
                    concat = jnp.concatenate(taps, axis=-1)
                    h = concat
                continue
        if name == "A1":
            a1 = out
            continue  # parallel branch; do not advance h
        if name == "B2":
            # reference concat order: [B2, A1] (DCSCN.py:281)
            h = jnp.concatenate([out, a1], axis=-1)
            continue
        h = out

    y = h.astype(jnp.float32) + x2.astype(jnp.float32)
    return y, (new_bn if bn_state is not None else None)


# ----------------------------------------------------------------------
# Reporting: parameter count, complexity, receptive field
# ----------------------------------------------------------------------


def param_count(params: Params) -> int:
    return sum(int(np.prod(v.shape)) for layer in params.values() for v in layer.values())


def complexity_report(cfg: Config) -> Dict[str, Any]:
    """Features/complexity/receptive-field with the reference's accounting
    (tf_graph.py:100-110, :143-146, :230-233; DCSCN.py:258-331)."""
    complexity = 0
    receptive = 0
    pix_per_input = 1
    features = []
    for spec in layer_plan(cfg):
        k, cin, cout = spec["k"], spec["cin"], spec["cout"]
        if spec["kind"] == "tconv":
            pix_per_input *= spec["tconv_scale"] ** 2
            complexity += pix_per_input * k * k * cin * cout
            receptive += 1
            continue
        if spec["separable"]:
            complexity += pix_per_input * (k * k * cin * 1) + pix_per_input * (cin * cout)
        else:
            complexity += pix_per_input * k * k * cin * cout
        if spec["bias"]:
            complexity += pix_per_input * cout
        if spec["activator"]:
            complexity += pix_per_input * cout
        receptive = k if receptive == 0 else receptive + (k - 1)
        if spec["name"] == "A1":
            receptive -= cfg.cnn_size - 1  # DCSCN.py:267/:275
        if spec.get("tap"):
            features.append(cout)
    return {
        "features": "%s Total: (%d)" % (" ".join(str(f) for f in features) + " ", sum(features)),
        "complexity": complexity,
        "receptive_fields": receptive,
    }


def receptive_field_lr(cfg: Config) -> int:
    """One-sided receptive radius in LR pixels for exact tiled inference.

    Counts every pre-upsampling conv's (k-1)/2 plus post-upsampling convs'
    reach divided by scale (ceil). Used to size halos so tiled outputs are
    bit-identical to whole-image outputs.
    """
    pre = 0
    post = 0
    upsampled = False
    for spec in layer_plan(cfg):
        if spec["kind"] in ("ps", "tconv"):
            pre += (spec.get("k", 1) - 1) // 2 if spec["kind"] == "ps" else spec["k"]
            upsampled = True
            continue
        if spec.get("input") == "concat":
            # parallel branch from the concat: resets to concat's depth
            continue
        if upsampled:
            post += (spec["k"] - 1) // 2
        else:
            pre += (spec["k"] - 1) // 2
    return pre + int(math.ceil(post / cfg.scale)) + 1  # +1 safety margin
