"""Measure the single-dispatch tiled ensemble against the round-1 behavior.

Round 1 ran `--tile_size=48 --self_ensemble=8` as 8 sequential tiled passes
(flip whole image on host, tile, un-flip). Round 2 fuses the 8 dihedral
variants per-window into ONE compiled call. This script times both on the
same image/params (the old behavior is reproduced exactly: host flips +
8x ensemble-off tiled runs) and checks the outputs agree.

    python tools/bench_tiled_ensemble.py [--reps 5] [--hw 321,481]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--hw", default="321,481", help="LR image size h,w")
    ap.add_argument("--tile_size", type=int, default=48)
    ap.add_argument("--jit_cache_dir", default="/root/repo/.jax_cache")
    args = ap.parse_args()

    import jax
    import numpy as np

    from dcscn_tpu.config import Config
    from dcscn_tpu.engine import InferenceEngine, init_compilation_cache
    from dcscn_tpu.io import checkpoint as ckpt_io
    from dcscn_tpu.ops import flips
    from dcscn_tpu.ops import resize as resize_ops

    init_compilation_cache(args.jit_cache_dir)
    h, w = (int(v) for v in args.hw.split(","))

    cfg = Config(dropout_rate=1.0, tile_size=args.tile_size, self_ensemble=8)
    ckpt = os.path.join("models", cfg.name() + ".ckpt.npz")
    tree = ckpt_io.load_params(ckpt)
    eng = InferenceEngine(tree.get("params", tree), cfg)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (h, w, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, cfg.scale)

    def run_new():
        return eng.run(x, x2, self_ensemble=8)

    def run_old():  # round-1 behavior: 8 sequential tiled passes
        acc = None
        for i in range(8):
            xi = np.ascontiguousarray(flips.flip(x, i))
            x2i = np.ascontiguousarray(flips.flip(x2, i))
            yi = eng._run_tiled(xi, x2i, 1)
            yi = flips.flip(yi, i, invert=True)
            acc = yi if acc is None else acc + yi
        return acc / 8.0

    def timeit(fn):
        out = fn()  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        return (time.perf_counter() - t0) / args.reps, out

    t_new, out_new = timeit(run_new)
    t_old, out_old = timeit(run_old)
    err = float(np.max(np.abs(out_new - out_old)))

    print(json.dumps({
        "lr_hw": [h, w], "tile_size": args.tile_size,
        "new_s": round(t_new, 4), "old_s": round(t_old, 4),
        "speedup": round(t_old / t_new, 2), "max_abs_err": err,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
