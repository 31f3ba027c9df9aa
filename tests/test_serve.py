"""Serving tests: SRService semantics + live HTTP round-trip."""

import http.client
import io
import threading

import imageio.v2 as imageio
import numpy as np
import pytest

import jax

from dcscn_tpu.config import Config
from dcscn_tpu.models import dcscn
from dcscn_tpu.serve import SRService, make_handler

CFG = Config(layers=2, filters=4, min_filters=4, use_nin=False, reconstruct_filters=4,
             self_ensemble=1, dropout_rate=1.0)


@pytest.fixture(scope="module")
def service():
    params = dcscn.init_params(jax.random.PRNGKey(0), CFG)
    return SRService(params, CFG)


def test_upscale_gray(service):
    img = np.random.default_rng(0).integers(0, 255, (16, 20, 1), np.uint8)
    out = service.upscale(img)
    assert out.shape == (32, 40, 1)
    assert out.dtype == np.uint8


def test_upscale_rgb(service):
    img = np.random.default_rng(1).integers(0, 255, (16, 16, 3), np.uint8)
    out = service.upscale(img)
    assert out.shape == (32, 32, 3)


def test_upscale_16bit_input_normalized(service):
    """16-bit inputs are normalized to the model's 0-255 range — the
    output must match the same image posted as 8-bit, not saturate."""
    rng = np.random.default_rng(2)
    img8 = rng.integers(0, 255, (16, 20, 1), np.uint8)
    img16 = (img8.astype(np.uint16) * 257)
    out8 = service.upscale(img8)
    out16 = service.upscale(img16)
    np.testing.assert_allclose(out16.astype(int), out8.astype(int), atol=1)


def test_http_round_trip(service):
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        assert b"ok" in resp.read()

        img = np.random.default_rng(2).integers(0, 255, (12, 12, 3), np.uint8)
        buf = io.BytesIO()
        imageio.imwrite(buf, img, format="png")
        conn.request("POST", "/sr", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        out = imageio.imread(io.BytesIO(resp.read()))
        assert out.shape[:2] == (24, 24)

        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404
    finally:
        server.shutdown()
