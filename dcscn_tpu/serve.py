"""Minimal production serving for SR inference.

The reference's deployment story ends at a frozen .pb consumed by a script
(helper/custom_freeze_graph.py; evaluate.py --frozenInference). This module
adds an actual serving runtime: a persistent compiled engine behind a
threaded HTTP endpoint.

    python tools/serve.py --port 8080 [model flags]
    curl -X POST --data-binary @in.png http://localhost:8080/sr > out.png

Design: one InferenceEngine (compiled programs cached across requests; the
exact tiled mode bounds program count for arbitrary request sizes), a lock
around device dispatch (single chip), RGB handling identical to
`do_for_file` (Y through the net, CbCr bicubic-upscaled, recombined —
DCSCN.py:588-614).
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dcscn_tpu.config import Config
from dcscn_tpu.engine import InferenceEngine
from dcscn_tpu.ops import color
from dcscn_tpu.ops import resize as resize_ops


class SRService:
    """Thread-safe SR on decoded uint8 images."""

    def __init__(self, params, cfg: Config, bn_state=None):
        import jax.numpy as jnp

        self.cfg = cfg
        # honor --dtype like api.SuperResolution does for its own engine
        cdt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.engine = InferenceEngine(params, cfg, bn_state=bn_state,
                                      compute_dtype=cdt)
        self._lock = threading.Lock()

    def upscale(self, image: np.ndarray) -> np.ndarray:
        """[H, W, 1|3] -> uint8 [H*s, W*s, same-ch]. Non-8-bit inputs
        (16-bit PNG, float TIFF) are normalized to the model's 0-255
        range instead of being fed raw and clipped to garbage."""
        scale = self.cfg.scale
        if image.dtype == np.uint16:
            image = (image.astype(np.float32) / 257.0)  # 65535 -> 255
        elif image.dtype.kind == "f":
            m = float(image.max()) if image.size else 0.0
            image = image.astype(np.float32) * (255.0 if m <= 1.0 else 1.0)
        if image.ndim == 2:
            image = image[:, :, None]
        if image.shape[2] >= 4:
            image = image[:, :, :3]
        elif image.shape[2] == 2:  # gray+alpha: keep luminance only
            image = image[:, :, 0:1]

        if image.shape[2] == 3:
            y = color.convert_rgb_to_y(image)
            with self._lock:
                out_y = self.engine.run(y)
            ycbcr = color.convert_rgb_to_ycbcr(resize_ops.resize_image(image, scale))
            rgb = color.convert_y_and_cbcr_to_rgb(out_y, ycbcr[:, :, 1:3])
            return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
        with self._lock:
            out = self.engine.run(image.astype(np.float64))
        return np.clip(np.rint(out[:, :, 0]), 0, 255).astype(np.uint8)[:, :, None]


def make_handler(service: SRService):
    import imageio.v2 as imageio

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({
                    "status": "ok",
                    "model": service.cfg.name(),
                    "scale": service.cfg.scale,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/sr":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(length)
                img = np.atleast_3d(imageio.imread(io.BytesIO(data)))
                out = service.upscale(img)
                buf = io.BytesIO()
                imageio.imwrite(buf, out[:, :, 0] if out.shape[2] == 1 else out,
                                format="png")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # pragma: no cover - error path
                msg = json.dumps({"error": str(e)}).encode()
                self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def serve(service: SRService, host: str = "127.0.0.1", port: int = 8080):
    server = ThreadingHTTPServer((host, port), make_handler(service))
    print("serving %s x%d on %s:%d" % (service.cfg.name(), service.cfg.scale, host, port))
    server.serve_forever()
