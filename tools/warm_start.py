"""Build a warm-start checkpoint for a new scale from a trained model.

The DCSCN paper's transfer trick: the feature extractor (CNN*) and NIN
reconstruction (A1/B1/B2) operate on the LR grid and are scale-independent,
so an x3/x4 model can inherit them from a trained x2 model. Only the
upsampling stage depends on scale: x2's Up-PS conv is [3,3,C,4C]; x4 uses
two chained x2 stages (Up-PS, Up-PS2) with the SAME shape, so both inherit
x2's Up-PS; x3's Up-PS is [3,3,C,9C] and stays freshly initialized.
(Reference architecture: /root/reference/DCSCN.py:294-304.)

Every leaf whose (layer, tensor) path exists in the source with an equal
shape is copied; everything else keeps its fresh initialization. The result
is saved as `<target_model_name>_warm.ckpt.npz` so training can start with
`--load_model_name=<target_model_name>_warm`.

Usage:
    python tools/warm_start.py --src_name=dcscn_L12_F196to48_NIN_A64_PS_R1F32_v2 \
        --scale=3 [any model flags]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import numpy as np

from dcscn_tpu.config import parse_args
from dcscn_tpu.io import checkpoint as ckpt_io
from dcscn_tpu.models import dcscn

EXTRA_FLAGS = [
    ("src_name", str, "", "source checkpoint model name (without .ckpt.npz)"),
    ("out_suffix", str, "_warm", "suffix appended to the target model name"),
]


def warm_start_params(src_tree, fresh_params):
    """Copy shape-matching leaves from src into fresh; returns (params, copied, kept)."""
    src = src_tree.get("params", src_tree)
    copied, kept = [], []
    out = {}
    for lname, layer in fresh_params.items():
        out[lname] = {}
        for k, v in layer.items():
            src_layer = lname
            if lname == "Up-PS2" and lname not in src and "Up-PS" in src:
                # x4's second x2 stage inherits the x2 model's (only) x2 stage
                src_layer = "Up-PS"
            sv = src.get(src_layer, {}).get(k)
            if sv is not None and np.shape(sv) == np.shape(v):
                out[lname][k] = np.asarray(sv)
                copied.append("%s/%s" % (lname, k))
            else:
                out[lname][k] = v
                kept.append("%s/%s" % (lname, k))
    return out, copied, kept


def main(argv=None):
    cfg, ns = parse_args(argv, extra_flags=EXTRA_FLAGS)
    if not ns.src_name:
        raise SystemExit("--src_name is required")
    if cfg.jit_cache_dir:
        from dcscn_tpu.engine import init_compilation_cache

        init_compilation_cache(cfg.jit_cache_dir)
    src_path = os.path.join(cfg.checkpoint_dir, ns.src_name + ".ckpt.npz")
    src_tree = ckpt_io.load_params(src_path)

    fresh = jax.device_get(dcscn.init_params(jax.random.PRNGKey(0), cfg))
    params, copied, kept = warm_start_params(src_tree, fresh)

    # bn running stats transfer only where shapes match the TARGET
    # architecture (params get the same shape gate in warm_start_params);
    # mismatched layers restart from fresh init stats
    bn_state = src_tree.get("bn_state")
    if bn_state and cfg.batch_norm:
        fresh_bn = jax.device_get(dcscn.init_bn_state(cfg))
        for lname, leaves in fresh_bn.items():
            src_l = bn_state.get(lname, {})
            for k, v in leaves.items():
                s = src_l.get(k)
                if s is not None and np.shape(s) == np.shape(v):
                    fresh_bn[lname][k] = s
                else:
                    print("  fresh bn: %s/%s" % (lname, k))
        bn_state = fresh_bn
    elif not cfg.batch_norm:
        bn_state = None

    out_name = cfg.name() + ns.out_suffix
    out_path = os.path.join(cfg.checkpoint_dir, out_name + ".ckpt.npz")
    ckpt_io.save_params(
        out_path,
        {"params": params, "bn_state": bn_state},
        meta={"model_name": out_name, "config": dataclasses.asdict(cfg),
              "warm_start_src": ns.src_name},
    )
    print("warm start: copied %d leaves, fresh %d leaves" % (len(copied), len(kept)))
    for k in kept:
        print("  fresh: %s" % k)
    print("saved [%s]" % out_path)


if __name__ == "__main__":
    main(sys.argv[1:])
