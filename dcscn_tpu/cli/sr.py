"""Apply super resolution to one image file (reference: sr.py:34-48).

    python sr.py --file=your_image.png --scale=2 [model flags...]

Writes output/<model>/<file>{,_bicubic,_bicubic_y,_result_y,_result}.
"""

from __future__ import annotations

import sys

from dcscn_tpu import api
from dcscn_tpu.config import parse_args

EXTRA_FLAGS = [("file", str, "image.jpg", "Target filename")]


def main(argv=None):
    cfg, ns = parse_args(argv, extra_flags=EXTRA_FLAGS)
    model = api.SuperResolution(cfg, model_name=cfg.model_name)
    model.build_graph()
    model.build_summary_saver()
    model.init_all_variables()
    model.load_model()
    model.do_for_file(ns.file, cfg.output_dir)


if __name__ == "__main__":
    main(sys.argv[1:])
