"""Offline dataset augmentation (reference: augmentation.py:25-70).

Writes flipped/rotated copies into data/<dataset>_<level>/:
level>=2 +flipud(_v), >=3 +fliplr(_h), >=4 +both(_hv), >=5 +rot90(_r1),
>=6 +rot270(_r2), >=7 +rot90+flipud(_r1_v), >=8 +rot270+flipud(_r2_v).

    python augmentation.py --dataset=yang91 --augment_level=4
"""

from __future__ import annotations

import os
import sys

import numpy as np

from dcscn_tpu.config import parse_args
from dcscn_tpu.utils import files, imaging

EXTRA_FLAGS = [
    ("augment_level", int, 4, "Augmentation level. 4:+LR/UD/LR-UD flipped, 7:+rotated"),
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

    training_filenames = files.get_files_in_directory(cfg.data_dir + "/" + cfg.dataset + "/")
    target_dir = cfg.data_dir + "/" + cfg.dataset + ("_%d/" % ns.augment_level)
    files.make_dir(target_dir)

    for file_path in training_filenames:
        org_image = imaging.load_image(file_path)
        filename, extension = os.path.splitext(os.path.basename(file_path))
        new_filename = target_dir + filename
        imaging.save_image(new_filename + extension, org_image)
        for level, suffix, fn in _VARIANTS:
            if ns.augment_level >= level:
                imaging.save_image(new_filename + suffix + extension, fn(org_image))


if __name__ == "__main__":
    main(sys.argv[1:])
