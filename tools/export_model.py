#!/usr/bin/env python3
"""Export a trained checkpoint as a self-contained inference artifact.

The reference's deployment path is freeze_graph + optimize_for_inference
(helper/custom_freeze_graph.py, helper/optimize_for_inference.py) producing
frozen_model_optimized.pb consumed via --frozenInference. The TPU-native
equivalent strips training state, folds BatchNorm into conv weights, and
writes params+config as one .npz/.json pair:

    python tools/export_model.py [model flags] \
        --frozen_graph_path=model_to_freeze/frozen_model_optimized.npz

    python evaluate.py --frozenInference=True \
        --frozen_graph_path=model_to_freeze/frozen_model_optimized.npz
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dcscn_tpu import api  # noqa: E402
from dcscn_tpu.config import parse_args  # noqa: E402
from dcscn_tpu.io import export  # noqa: E402


def main(argv=None):
    cfg, _ = parse_args(argv)
    model = api.SuperResolution(cfg, model_name=cfg.model_name)
    model.load_model(cfg.load_model_name)
    export.export_model(cfg.frozen_graph_path, model.params, model.cfg,
                        bn_state=model.bn_state)


if __name__ == "__main__":
    main(sys.argv[1:])
