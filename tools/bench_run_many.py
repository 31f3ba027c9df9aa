"""A/B benchmark for dataset inference modes on the real chip.

Times three ways of evaluating a whole dataset with one engine:
  per_image — sequential engine.run() per image (sync materialization)
  pipeline  — engine.run_many(strategy="pipeline"): all dispatches issued
              async before any readback (round-4 default)
  group     — engine.run_many(strategy="group"): canvas + shared chunked
              dispatches per tile layout

Protocol: one full warmup pass per mode (compiles + program loads), then
`--reps` timed passes; best pass is reported. Outputs ONE JSON line with
per-mode seconds, per-image averages, speedups vs per_image, and the max
abs output difference of each mode vs per_image (exactness check).

    python tools/bench_run_many.py --scale=4 --dataset=bsd100 \
        --out results/r4/bench_run_many_x4.json

Reference behavior being beaten: per-image sess.run loops (the reference
has no dataset batching at all; evaluate.py:44-107 + DCSCN.py:547-586).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIPS = {
    2: "dcscn_L12_F196to48_NIN_A64_PS_R1F32",
    3: "dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32",
    4: "dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32",
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--dataset", default="bsd100")
    ap.add_argument("--ckpt", default="", help="model name (default: flagship for --scale)")
    ap.add_argument("--ensemble", type=int, default=8)
    ap.add_argument("--tile_size", type=int, default=48)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--limit", type=int, default=0, help="cap image count (0 = all)")
    ap.add_argument("--platform", default="", help="'cpu' to run off-chip")
    ap.add_argument("--jit_cache_dir", default=os.path.join(REPO, ".jax_cache"))
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import dataclasses

    from dcscn_tpu.config import Config
    from dcscn_tpu.data import builders
    from dcscn_tpu.engine import InferenceEngine, init_compilation_cache
    from dcscn_tpu.io import checkpoint as ckpt_io
    from dcscn_tpu.ops import patches
    from dcscn_tpu.ops import resize as resize_ops
    from dcscn_tpu.utils import files, imaging

    if args.jit_cache_dir:
        init_compilation_cache(args.jit_cache_dir)

    name = args.ckpt or FLAGSHIPS[args.scale]
    path = os.path.join(REPO, "models", name + ".ckpt.npz")
    meta = ckpt_io.load_meta(path)
    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in meta["config"].items() if k in fields})
    cfg = cfg.replace(self_ensemble=args.ensemble, tile_size=args.tile_size,
                      mesh_spatial=1)
    s = cfg.scale
    tree = ckpt_io.load_params(path)
    eng = InferenceEngine(tree.get("params", tree), cfg,
                          bn_state=tree.get("bn_state"))

    names = files.get_files_in_directory(os.path.join(REPO, "data", args.dataset))
    if args.limit:
        names = names[: args.limit]
    xs, x2s = [], []
    for p in names:
        img = patches.set_image_alignment(
            imaging.load_image(p, print_console=False), s)
        if img.shape[2] != 3:
            continue
        x = builders.build_input_image(img, channels=1, scale=s, alignment=s,
                                       convert_ycbcr=True)
        xs.append(x)
        x2s.append(resize_ops.resize_image(x, s))

    def per_image():
        return [eng.run(x, x2) for x, x2 in zip(xs, x2s)]

    modes = {
        "per_image": per_image,
        "pipeline": lambda: eng.run_many(xs, x2s, strategy="pipeline"),
        "group": lambda: eng.run_many(xs, x2s, strategy="group"),
    }

    results = {}
    outputs = {}
    for mode, fn in modes.items():
        outputs[mode] = fn()  # warmup: compiles + program loads
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        results[mode] = best

    ref = outputs["per_image"]
    diffs = {m: float(max(np.abs(a - b).max() for a, b in zip(outs, ref)))
             for m, outs in outputs.items() if m != "per_image"}

    import jax

    record = {
        "bench": "run_many_modes",
        "platform": jax.devices()[0].platform,
        "ckpt": name,
        "dataset": args.dataset,
        "images": len(xs),
        "ensemble": args.ensemble,
        "tile": args.tile_size,
        "seconds": {m: round(v, 3) for m, v in results.items()},
        "s_per_image": {m: round(v / len(xs), 4) for m, v in results.items()},
        "speedup_vs_per_image": {
            m: round(results["per_image"] / v, 3)
            for m, v in results.items() if m != "per_image"},
        "max_abs_diff_vs_per_image_0_255": {m: round(v, 6) for m, v in diffs.items()},
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        d = os.path.dirname(args.out)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
