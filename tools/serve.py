#!/usr/bin/env python3
"""Serve SR inference over HTTP (see dcscn_tpu/serve.py).

    python tools/serve.py --port 8080 [model flags]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dcscn_tpu import api  # noqa: E402
from dcscn_tpu.config import parse_args  # noqa: E402
from dcscn_tpu.serve import SRService, serve  # noqa: E402

EXTRA = [("port", int, 8080, "listen port"), ("host", str, "127.0.0.1", "bind host")]


def main(argv=None):
    cfg, ns = parse_args(argv, extra_flags=EXTRA)
    model = api.SuperResolution(cfg, model_name=cfg.model_name)
    if cfg.frozenInference:
        model.load_graph(cfg.frozen_graph_path)
    else:
        model.load_model(cfg.load_model_name)
    service = SRService(model.params, model.cfg, bn_state=model.bn_state)
    serve(service, host=ns.host, port=ns.port)


if __name__ == "__main__":
    main(sys.argv[1:])
