"""Convert RGB(A) images to Y-channel BMPs (reference: convert_y.py:21-42).

Writes data/<dataset>_y/<name>.bmp — pre-extracted luminance speeds up
training dataset loading.

    python convert_y.py --dataset=yang91
"""

from __future__ import annotations

import os
import sys

from dcscn_tpu.config import parse_args
from dcscn_tpu.ops import color
from dcscn_tpu.utils import files, imaging


def main(argv=None):
    cfg, _ = parse_args(argv)
    print("Building Y channel data...")

    training_filenames = files.get_files_in_directory(cfg.data_dir + "/" + cfg.dataset + "/")
    target_dir = cfg.data_dir + "/" + cfg.dataset + "_y/"
    files.make_dir(target_dir)

    for file_path in training_filenames:
        org_image = imaging.load_image(file_path)
        if org_image.shape[2] == 3:
            org_image = color.convert_rgb_to_y(org_image)
        filename, _ext = os.path.splitext(os.path.basename(file_path))
        imaging.save_image(target_dir + filename + ".bmp", org_image)


if __name__ == "__main__":
    main(sys.argv[1:])
