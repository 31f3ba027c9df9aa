"""Profiler trace smoke + engine/model edge cases."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcscn_tpu.config import Config
from dcscn_tpu.engine import InferenceEngine
from dcscn_tpu.models import dcscn
from dcscn_tpu.ops import resize as resize_ops


def test_profiler_trace_smoke(tmp_path):
    trace_dir = str(tmp_path / "prof")

    @jax.jit
    def f(x):
        return x * 2.0

    with jax.profiler.trace(trace_dir):
        jax.device_get(f(jnp.ones((8, 8))))
    # xplane files land under trace_dir/plugins/profile/...
    found = any("xplane" in fn or "trace" in fn
                for _, _, fns in os.walk(trace_dir) for fn in fns)
    assert found


def test_api_save_profile_trace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from dcscn_tpu import api
    from dcscn_tpu.utils import imaging

    rng = np.random.default_rng(0)
    os.makedirs("data/t", exist_ok=True)
    imaging.save_image("data/t/x.png", rng.integers(0, 255, (16, 16, 3), np.uint8),
                       print_console=False)
    cfg = Config(layers=2, filters=4, min_filters=4, use_nin=False,
                 reconstruct_filters=4, self_ensemble=1, dropout_rate=1.0,
                 enable_log=False)
    m = api.SuperResolution(cfg)
    m.init_all_variables()
    m.save_profile_trace("data/t/x.png")
    assert os.path.isdir(os.path.join(cfg.tf_log_dir, "profile"))


def test_spatial_sharded_x4_two_stage_ps():
    """x4 = two chained PS stages; halo math must still be exact."""
    from dcscn_tpu.parallel import mesh as mesh_mod
    from dcscn_tpu.parallel import spatial

    cfg = Config(layers=2, filters=6, min_filters=4, nin_filters=6, nin_filters2=4,
                 dropout_rate=1.0, scale=4)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    m = mesh_mod.make_mesh(1, 4)
    halo = dcscn.receptive_field_lr(cfg)
    h = 4 * max(2 * halo, 16)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (h, 24, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 4).astype(np.float32)

    whole, _ = dcscn.apply(params, jnp.asarray(x)[None], jnp.asarray(x2)[None], cfg)
    fn = spatial.spatial_forward_fn(cfg, m, halo=halo)
    sharded = np.asarray(fn(params, jnp.asarray(x), jnp.asarray(x2)))
    np.testing.assert_allclose(sharded, np.asarray(whole[0]), rtol=1e-5, atol=5e-4)


def test_tiled_engine_depthwise_variant():
    cfg = Config(layers=2, filters=6, min_filters=4, nin_filters=6, nin_filters2=4,
                 dropout_rate=1.0, depthwise_separable=True, self_ensemble=1)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 255, (40, 56, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 2)
    whole = InferenceEngine(params, cfg).run(x, x2)
    tiled = InferenceEngine(params, cfg.replace(tile_size=16)).run(x, x2)
    np.testing.assert_allclose(tiled, whole, rtol=1e-5, atol=5e-4)


def test_tiled_engine_transposed_conv_variant():
    cfg = Config(layers=2, filters=6, min_filters=4, nin_filters=6, nin_filters2=4,
                 dropout_rate=1.0, pixel_shuffler=False, self_ensemble=1, scale=3)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 255, (36, 45, 1)).astype(np.float32)
    x2 = resize_ops.resize_image(x, 3)
    whole = InferenceEngine(params, cfg).run(x, x2)
    tiled = InferenceEngine(params, cfg.replace(tile_size=16)).run(x, x2)
    np.testing.assert_allclose(tiled, whole, rtol=1e-5, atol=5e-4)


def test_engine_small_image_falls_back_to_single_window():
    cfg = Config(layers=2, filters=4, min_filters=4, use_nin=False,
                 reconstruct_filters=4, dropout_rate=1.0, self_ensemble=1,
                 tile_size=64)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    x = np.full((12, 14, 1), 90.0, np.float32)
    x2 = resize_ops.resize_image(x, 2)
    out = InferenceEngine(params, cfg).run(x, x2)
    assert out.shape == (24, 28, 1)


def test_load_image_strips_gray_alpha(tmp_path):
    """LA (gray+alpha) PNGs load as 1-channel — a 2-channel array would
    crash every downstream CLI path (save_image, engine input)."""
    from PIL import Image

    from dcscn_tpu.utils import imaging

    p = str(tmp_path / "la.png")
    Image.fromarray(
        np.dstack([np.full((6, 7), 120, np.uint8),
                   np.full((6, 7), 255, np.uint8)]), mode="LA").save(p)
    img = imaging.load_image(p, print_console=False)
    assert img.shape == (6, 7, 1)
    assert int(img[0, 0, 0]) == 120


def test_tpu_health_probe_cpu_path(monkeypatch):
    """The health probe's subprocess isolation + verdict logic, driven on
    the CPU backend (the TPU path is exercised operationally)."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import tpu_health

    monkeypatch.setattr(
        tpu_health, "_PROBE",
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        + tpu_health._PROBE)
    r = tpu_health.probe(120)
    assert r["ok"] is True and r["latency_s"] > 0

    # a probe that hangs must time out, not hang the caller
    monkeypatch.setattr(tpu_health, "_PROBE",
                        "import time; time.sleep(60)")
    r = tpu_health.probe(2)
    assert r == {"ok": False, "reason": "timeout", "timeout_s": 2}


def test_bench_health_gate(monkeypatch, capsys):
    """bench.py's fail-fast gate: wedged relay -> one JSON error line +
    exit 1 (never a hang); timeout=0 -> no probe."""
    import importlib.util
    import json as json_mod
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    sys.path.insert(0, os.path.join(repo, "tools"))
    import tpu_health

    # wedged relay (probe not ok) -> SystemExit(1) + structured JSON line
    monkeypatch.setattr(tpu_health, "probe",
                        lambda t: {"ok": False, "reason": "timeout",
                                   "timeout_s": t})
    with pytest.raises(SystemExit) as ei:
        bench._gate_on_chip_health(5.0)
    assert ei.value.code == 1
    rec = json_mod.loads(capsys.readouterr().out.strip())
    assert rec["metric"] == "bench_unavailable"
    assert rec["health"]["reason"] == "timeout"

    # healthy chip -> returns without printing
    monkeypatch.setattr(tpu_health, "probe",
                        lambda t: {"ok": True, "latency_s": 1.0})
    bench._gate_on_chip_health(5.0)
    assert capsys.readouterr().out == ""

    # timeout=0 -> probe never called
    def _boom(t):
        raise AssertionError("probe must not run")
    monkeypatch.setattr(tpu_health, "probe", _boom)
    bench._gate_on_chip_health(0)


def test_tpu_health_wait_mode(monkeypatch):
    """--wait polls until healthy (or deadline), without real sleeps."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    import tpu_health

    # becomes healthy on the 3rd probe
    results = iter([{"ok": False, "reason": "timeout", "timeout_s": 1},
                    {"ok": False, "reason": "timeout", "timeout_s": 1},
                    {"ok": True, "latency_s": 1.0}])
    monkeypatch.setattr(tpu_health, "probe", lambda t: dict(next(results)))
    slept = []
    r = tpu_health.wait_healthy(3600, timeout=1, interval_s=10,
                                sleep=slept.append)
    assert r["ok"] is True and slept == [10, 10]

    # never healthy -> returns the failure once the deadline is reached.
    # A wait shorter than the interval still polls to the deadline instead
    # of bailing after one probe (ADVICE r4): sleep the remaining budget,
    # probe once more, give up.
    monkeypatch.setattr(
        tpu_health, "probe",
        lambda t: {"ok": False, "reason": "timeout", "timeout_s": t})
    slept = []
    r = tpu_health.wait_healthy(5, timeout=1, interval_s=10,
                                sleep=slept.append)
    assert r["ok"] is False and len(slept) == 1 and abs(slept[0] - 5) < 0.1
    assert r["waited_s"] >= 4.9


def test_bench_protocol_variants(monkeypatch, capsys):
    """Every --protocol variant of bench.py's default timed loop runs the
    same jitted forward end-to-end and reports a positive MP/s with
    correct iteration accounting (threads2 rounds iters to even)."""
    import importlib.util
    import json as json_mod
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod2", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    for proto in ("rebind", "hold_all", "threads2"):
        monkeypatch.setattr(sys, "argv", [
            "bench.py", "--health_timeout=0", "--iters", "3", "--warmup", "1",
            "--batch", "1", "--lr_size", "16", "--jit_cache_dir=",
            "--protocol", proto])
        bench.main()
        rec = json_mod.loads(capsys.readouterr().out.strip())
        assert rec["metric"] == "dcscn_L12_x2_sr_throughput"
        assert rec["value"] > 0 and rec["device_mp_s"] > 0
        # rebind is the (current) default and omits the tag; others carry it
        assert rec.get("protocol") == (None if proto == "rebind" else proto)
