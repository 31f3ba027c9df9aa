"""TPU exactness canary: assert on the REAL chip that the optimized
inference paths agree with the plain whole-image forward at tight
tolerance, so device-side numerical drift (e.g. a fusion changing f32
summation order) is caught per round instead of surfacing as an
unexplained PSNR delta in a full eval.

Checks, on one set5 image with the converted L7 x2 checkpoint:
  1. tiled (tile_size=48) ens=1  == whole ens=1
  2. tiled (tile_size=48) ens=8  == whole ens=8      (fused tiled ensemble)
  3. whole ens=1, fuse_a1b1 off  == whole ens=1, on  (A1+B1 single-read)
  4. spatial tile-batch sharding  == whole (skipped with 1 device)

Prints one JSON line and writes it to --out (default results/<round>/canary.json).
Exit code 1 if any max-abs diff exceeds --tol (0..255 pixel units).

Reference behavior being guarded: the reference's single dynamic-placeholder
forward is trivially self-consistent (DCSCN.py:224-228, 547-586); every one
of our specialized paths must reproduce it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="dcscn_L7_F32to8_G1.20_NIN_A24_B8_PS_R1F32")
    ap.add_argument("--image", default=os.path.join(REPO, "data/set5/img_001.png"))
    ap.add_argument("--tile_size", type=int, default=48)
    # Measured on v5e (round 3): tiled-vs-whole is 0.0 on CPU but up to
    # ~0.018 on TPU — XLA tiles the convs differently for window-shaped
    # programs, changing f32 accumulation order and internal bf16 packing,
    # a ~7e-5 relative shape-dependent rounding (~0.01 dB PSNR; this is
    # what round 2 logged as the 37.211 -> 37.198 "drift"). The A1+B1
    # fusion measures exactly 0.0 on both backends. 0.05 passes that
    # rounding while any real bug (e.g. an unwritten tile band: err ~377)
    # fails by orders of magnitude.
    ap.add_argument("--tol", type=float, default=5e-2)
    ap.add_argument("--out", default="")
    ap.add_argument("--jit_cache_dir", default="/root/repo/.jax_cache")
    args = ap.parse_args(argv)

    import dataclasses

    from dcscn_tpu.config import Config
    from dcscn_tpu.data import builders
    from dcscn_tpu.engine import InferenceEngine, init_compilation_cache
    from dcscn_tpu.io import checkpoint as ckpt_io
    from dcscn_tpu.ops import patches
    from dcscn_tpu.ops import resize as resize_ops
    from dcscn_tpu.utils import imaging

    if args.jit_cache_dir:
        init_compilation_cache(args.jit_cache_dir)

    path = os.path.join(REPO, "models", args.ckpt + ".ckpt.npz")
    meta = ckpt_io.load_meta(path)
    if meta is None or "config" not in meta:
        raise SystemExit(
            "missing config sidecar [%s.json] — the canary needs the "
            "checkpoint's architecture config" % path)
    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in meta["config"].items() if k in fields})
    cfg = cfg.replace(self_ensemble=1, tile_size=0, mesh_spatial=1)
    s = cfg.scale
    tree = ckpt_io.load_params(path)
    params = tree.get("params", tree)
    bn = tree.get("bn_state")

    img = patches.set_image_alignment(
        imaging.load_image(args.image, print_console=False), s)
    x = builders.build_input_image(img, channels=1, scale=s, alignment=s,
                                   convert_ycbcr=True)
    x2 = resize_ops.resize_image(x, s)

    def eng(**kw):
        c = cfg.replace(**kw)
        return InferenceEngine(params, c, bn_state=bn)

    whole1 = eng().run(x, x2)
    whole8 = eng(self_ensemble=8).run(x, x2)

    diffs = {}
    diffs["tiled_vs_whole_ens1"] = float(np.abs(
        eng(tile_size=args.tile_size).run(x, x2) - whole1).max())
    diffs["tiled_vs_whole_ens8"] = float(np.abs(
        eng(tile_size=args.tile_size, self_ensemble=8).run(x, x2) - whole8).max())
    diffs["fuse_a1b1_off_vs_on"] = float(np.abs(
        eng(fuse_a1b1=False).run(x, x2) - whole1).max())

    import jax

    if len(jax.devices()) > 1:
        n = min(len(jax.devices()), 8)
        diffs["spatial_vs_whole_ens1"] = float(np.abs(
            eng(mesh_spatial=n).run(x, x2) - whole1).max())
        diffs["spatial_vs_whole_ens8"] = float(np.abs(
            eng(mesh_spatial=n, self_ensemble=8).run(x, x2) - whole8).max())

    ok = all(v <= args.tol for v in diffs.values())
    result = {
        "canary": "inference_exactness",
        "platform": jax.devices()[0].platform,
        "ckpt": args.ckpt,
        "image": os.path.basename(args.image),
        "tol": args.tol,
        "max_abs_diffs_0_255": {k: round(v, 6) for k, v in diffs.items()},
        "ok": ok,
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        out_dir = os.path.dirname(args.out)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
