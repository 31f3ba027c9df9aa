"""Offline dataset augmentation (reference: augmentation.py:25-70).

Writes flipped/rotated copies into data/<dataset>_<level>/:
level>=2 +flipud(_v), >=3 +fliplr(_h), >=4 +both(_hv), >=5 +rot90(_r1),
>=6 +rot270(_r2), >=7 +rot90+flipud(_r1_v), >=8 +rot270+flipud(_r2_v).

    python augmentation.py --dataset=yang91 --augment_level=4

Additive capability beyond the reference (which augments only by the
dihedral group): `--scale_levels=0.9,0.8,0.7` ALSO emits PIL-exact
bicubic-downscaled copies (_s90 etc.) of every image BEFORE the dihedral
variants are applied to each, the standard multi-scale augmentation of
the VDSR/EDSR training recipes — more distinct content per patch budget
when the corpus (bsd200+yang91 here) is smaller than the DIV2K-class
data the published numbers used.

    python augmentation.py --dataset=combined --augment_level=8 \
        --scale_levels=0.9,0.8,0.7
"""

from __future__ import annotations

import os
import sys

import numpy as np

from dcscn_tpu.config import parse_args
from dcscn_tpu.utils import files, imaging

EXTRA_FLAGS = [
    ("augment_level", int, 4, "Augmentation level. 4:+LR/UD/LR-UD flipped, 7:+rotated"),
    ("scale_levels", str, "",
     "Comma-separated downscale factors in (0,1), e.g. 0.9,0.8,0.7: also "
     "emit PIL-bicubic downscaled copies of each image (then dihedral-"
     "augment those too). Multi-scale augmentation beyond the reference."),
]

_VARIANTS = [
    (2, "_v", lambda im: np.flipud(im)),
    (3, "_h", lambda im: np.fliplr(im)),
    (4, "_hv", lambda im: np.flipud(np.fliplr(im))),
    (5, "_r1", lambda im: np.rot90(im)),
    (6, "_r2", lambda im: np.rot90(im, -1)),
    (7, "_r1_v", lambda im: np.flipud(np.rot90(im))),
    (8, "_r2_v", lambda im: np.flipud(np.rot90(im, -1))),
]


def main(argv=None):
    cfg, ns = parse_args(argv, extra_flags=EXTRA_FLAGS)
    print("Building x%d augmented data." % ns.augment_level)

    scale_levels = []
    if ns.scale_levels:
        from dcscn_tpu.ops import resize as resize_ops

        scale_levels = [float(s) for s in ns.scale_levels.split(",")]
        for s in scale_levels:
            if not 0.0 < s < 1.0:
                raise SystemExit("--scale_levels entries must be in (0,1), got %g" % s)

    training_filenames = files.get_files_in_directory(cfg.data_dir + "/" + cfg.dataset + "/")
    target_dir = cfg.data_dir + "/" + cfg.dataset + ("_%d/" % ns.augment_level)
    files.make_dir(target_dir)

    for file_path in training_filenames:
        org_image = imaging.load_image(file_path)
        filename, extension = os.path.splitext(os.path.basename(file_path))
        bases = [(filename, org_image)]
        for s in scale_levels:
            suffix = "_s%02d" % round(s * 100)
            bases.append((filename + suffix, resize_ops.resize_image(org_image, s)))
        for base_name, base_image in bases:
            new_filename = target_dir + base_name
            imaging.save_image(new_filename + extension, base_image)
            for level, suffix, fn in _VARIANTS:
                if ns.augment_level >= level:
                    imaging.save_image(new_filename + suffix + extension, fn(base_image))


if __name__ == "__main__":
    main(sys.argv[1:])
