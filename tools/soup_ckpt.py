"""Average ("model soup") N checkpoints of the same architecture.

Fine-tunes that share a common warm start live in one loss basin, so the
uniform parameter average is a valid — and often slightly better — model
(Wortsman et al., "Model soups", arXiv:2203.05482). Round 4 uses this to
combine the canonical flagship with its patch-64 fine-tune sibling.

The reference has no such tool (it keeps exactly one checkpoint per model
name, helper/tf_graph.py:282-296); this is additive capability. Promotion
of a soup stays gated on measured PSNR like any other candidate
(tools/promote_ckpt.py).

Usage:
  python tools/soup_ckpt.py --srcs name_a,name_b[,name_c...] --dst name_soup
Names are model names under models/ (without .ckpt.npz).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcscn_tpu.io import checkpoint  # noqa: E402


def soup(src_paths, weights=None):
    """Load each .ckpt.npz and return the weighted average param tree.

    All checkpoints must have identical key sets and shapes (same
    architecture); raises ValueError otherwise.
    """
    if weights is None:
        weights = [1.0 / len(src_paths)] * len(src_paths)
    if len(weights) != len(src_paths):
        raise ValueError("need one weight per source")
    total = float(sum(weights))
    weights = [w / total for w in weights]

    flats = []
    for p in src_paths:
        if not os.path.isfile(p):
            raise FileNotFoundError("Error. [%s] is not exist!" % p)
        with np.load(p) as data:
            flats.append({k: data[k] for k in data.files})

    keys = set(flats[0])
    for p, f in zip(src_paths[1:], flats[1:]):
        if set(f) != keys:
            raise ValueError(
                "checkpoint %s has a different key set (not the same "
                "architecture): only-in-first=%s only-in-this=%s"
                % (p, sorted(keys - set(f))[:3], sorted(set(f) - keys)[:3]))
    out = {}
    for k in keys:
        shapes = {f[k].shape for f in flats}
        if len(shapes) != 1:
            raise ValueError("key %s has mismatched shapes %s" % (k, shapes))
        acc = np.zeros(flats[0][k].shape, np.float64)
        for w, f in zip(weights, flats):
            acc += w * f[k].astype(np.float64)
        out[k] = acc.astype(flats[0][k].dtype)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--srcs", required=True,
                    help="comma-separated model names under --models_dir")
    ap.add_argument("--dst", required=True, help="output model name")
    ap.add_argument("--weights", default="",
                    help="optional comma-separated weights (default uniform)")
    ap.add_argument("--models_dir", default="models")
    args = ap.parse_args(argv)

    names = [s.strip() for s in args.srcs.split(",") if s.strip()]
    if len(names) < 2:
        ap.error("--srcs needs at least two checkpoints")
    paths = [os.path.join(args.models_dir, n + ".ckpt.npz") for n in names]
    weights = ([float(w) for w in args.weights.split(",")]
               if args.weights else None)

    flat = soup(paths, weights)
    dst = os.path.join(args.models_dir, args.dst + ".ckpt.npz")
    checkpoint._atomic_savez(dst, flat)

    meta = checkpoint.load_meta(paths[0]) or {}
    meta["model_name"] = args.dst
    meta["soup_of"] = names
    meta["soup_weights"] = weights or [1.0 / len(names)] * len(names)
    with open(dst + ".json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    print("soup saved [%s] <- %s" % (dst, names))


if __name__ == "__main__":
    main()
