#!/usr/bin/env python3
"""Benchmark: flagship DCSCN v2 (L12 F196to48 NIN A64 PS R1F32) x2 SR
throughput on one chip, in HR megapixels/second.

Protocol: steady-state jitted forward on device-resident inputs (batch 4 of
256x256 LR -> 512x512 HR), 3 warmup + 10 timed iterations, float32 (the
checkpoint-parity dtype; pass --dtype=bfloat16 to measure the fast path).

vs_baseline: ratio to the CPU reference stand-in 0.0792 HR MP/s — measured
on this machine with an equivalent torch-CPU forward of the same L12 graph
(the TF1 reference itself cannot run here: its scipy.misc/skimage imports
no longer exist). BASELINE.json's north star is >=20x that CPU rate.

Prints exactly ONE JSON line.
"""

import argparse
import json
import os
import sys
import time

BASELINE_CPU_MP_S = 0.0792  # torch-CPU L12 x2 stand-in, measured here


def _gate_on_chip_health(timeout: float) -> None:
    """Fail fast (one JSON line, exit 1) when the TPU relay is wedged.

    A wedged axon relay hangs EVERY jax call in the issuing process —
    including jax.devices() — so without this gate a bench run during an
    outage blocks forever (seen down 6+ hours at the end of round 4).
    The probe runs a matmul in a SUBPROCESS with a hard timeout
    (tools/tpu_health.py). The subprocess inherits this environment, so
    it resolves the SAME backend this process would (sitecustomize forces
    the axon plugin regardless of JAX_PLATFORMS); on a CPU-only box the
    probe just succeeds in a few seconds.
    """
    if timeout <= 0:
        return
    # load by path instead of sys.path.insert(0, ...) so repeated gates
    # don't stack duplicates ahead of site-packages (ADVICE r4); reuse a
    # module someone else (tests, tools) already imported
    try:
        import tpu_health
    except ImportError:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "tpu_health",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "tpu_health.py"))
        tpu_health = importlib.util.module_from_spec(spec)
        sys.modules["tpu_health"] = tpu_health
        spec.loader.exec_module(tpu_health)

    result = tpu_health.probe(timeout)
    if not result.get("ok"):
        print(json.dumps({"metric": "bench_unavailable", "value": 0.0,
                          "unit": "error", "vs_baseline": 0.0,
                          "health": result}))
        sys.exit(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--fuse_a1b1", type=int, default=1,
                    help="A/B the single-read A1+B1 NIN fusion (1=on)")
    ap.add_argument("--fused_iters", action="store_true",
                    help="run the timed iterations as ONE dispatch "
                    "(lax.scan over the forward): measures device-side "
                    "throughput with the per-dispatch relay overhead "
                    "amortized away (xplane: ~71 ms/iter device vs ~120 ms "
                    "per individual dispatch through the remote tunnel)")
    ap.add_argument("--protocol", type=str, default="rebind",
                    choices=("rebind", "hold_all", "threads2"),
                    help="how the default (non-fused) timed loop issues and "
                    "materializes dispatches — identical per-iteration math, "
                    "different relay interaction: 'rebind' re-binds y each "
                    "iter (deleting the prior buffer) and gets the last; "
                    "'hold_all' keeps every result alive until the end (no "
                    "mid-loop deletion RPCs); 'threads2' splits the "
                    "iterations across two dispatcher threads to overlap "
                    "the relay's per-dispatch round-trip. Measured round 5 "
                    "(results/r5/bench_protocols.json): rebind 35.2 / "
                    "hold_all 34.5 / threads2 33.6 / fused 54.7 MP/s — the "
                    "relay serializes executions regardless, so rebind "
                    "stays the default and dispatch FUSION (engine "
                    "ensembles/tiling, --fused_iters) is the real lever")
    ap.add_argument("--jit_cache_dir", type=str, default="/root/repo/.jax_cache")
    ap.add_argument("--train", action="store_true",
                    help="measure TRAINING throughput instead: fused epoch "
                    "scan s/step + achieved TFLOP/s for the flagship L12 x2 "
                    "(and the host-fed per-step loop for contrast with "
                    "--train_host_fed)")
    def positive_int(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return n

    ap.add_argument("--train_steps", type=positive_int, default=200)
    ap.add_argument("--train_host_fed", action="store_true",
                    help="with --train: use the reference-style host-fed "
                    "per-step loop instead of the fused scan")
    ap.add_argument("--train_small", action="store_true",
                    help="with --train: tiny L3 model (CPU smoke only; "
                    "numbers are not the flagship benchmark)")
    ap.add_argument("--health_timeout", type=float, default=300.0,
                    help="probe chip health in a subprocess first and fail "
                    "fast (one JSON error line, exit 1) if a matmul can't "
                    "complete within this many seconds — a wedged axon "
                    "relay otherwise hangs every jax call forever; "
                    "0 disables the gate")
    args = ap.parse_args()

    _gate_on_chip_health(args.health_timeout)

    if args.train:
        return bench_train(args)

    import jax
    import jax.numpy as jnp

    from dcscn_tpu.config import Config
    from dcscn_tpu.models import dcscn

    if args.jit_cache_dir:
        from dcscn_tpu.engine import init_compilation_cache
        init_compilation_cache(args.jit_cache_dir)

    cfg = Config(dropout_rate=1.0, dtype=args.dtype,
                 fuse_a1b1=bool(args.fuse_a1b1))
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def forward(params, x, x2):
        y, _ = dcscn.apply(params, x, x2, cfg, training=False, compute_dtype=cdt)
        return y

    if args.fused_iters:
        import jax.lax as lax

        @jax.jit
        def forward_n(params, x, x2):
            def body(carry, _):
                # make the input depend on the carry (numerically a no-op)
                # so XLA cannot hoist the loop-invariant forward out of
                # the scan and run it once
                xi = x + carry * jnp.float32(1e-30)
                y, _ = dcscn.apply(params, xi, x2, cfg, training=False,
                                   compute_dtype=cdt)
                return carry + y[0, 0, 0, 0], None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=args.iters)
            return acc

    n, s, lr = args.batch, cfg.scale, args.lr_size
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (n, lr, lr, 1), jnp.float32, 0, 255)
    x2 = jax.random.uniform(key, (n, lr * s, lr * s, 1), jnp.float32, 0, 255)

    for _ in range(args.warmup):
        jax.device_get(forward(params, x, x2))

    # device_get (not block_until_ready) forces execution: the axon relay's
    # block_until_ready returns before the remote execution completes.
    # Best-of-3 repetitions: remote-tunnel runs have high variance.
    best_dt = float("inf")
    if args.fused_iters:
        jax.device_get(forward_n(params, x, x2))  # compile
        for _rep in range(3):
            t0 = time.perf_counter()
            jax.device_get(forward_n(params, x, x2))
            best_dt = min(best_dt, time.perf_counter() - t0)
    else:
        if args.protocol == "threads2":
            import threading

            # a second independent input so the two streams share no buffer
            xb = jax.random.uniform(jax.random.PRNGKey(2), x.shape,
                                    jnp.float32, 0, 255)
            jax.device_get(forward(params, xb, x2))  # warm the second stream
            half = max(1, args.iters // 2)
            timed_iters = 2 * half  # actual forwards issued (iters rounded even)

            def run_protocol():
                outs = [None, None]

                def work(slot, inp):
                    y = None
                    for _ in range(half):
                        y = forward(params, inp, x2)
                    outs[slot] = y

                ts = [threading.Thread(target=work, args=(0, x)),
                      threading.Thread(target=work, args=(1, xb))]
                for t in ts:
                    t.start()
                for t in ts:
                    t.join()
                jax.device_get(outs)
        elif args.protocol == "hold_all":
            def run_protocol():
                ys = [forward(params, x, x2) for _ in range(args.iters)]
                jax.device_get(ys[-1])
        else:  # rebind
            def run_protocol():
                y = None
                for _ in range(args.iters):
                    y = forward(params, x, x2)
                jax.device_get(y)

        for _rep in range(3):
            t0 = time.perf_counter()
            run_protocol()
            best_dt = min(best_dt, time.perf_counter() - t0)

    if args.fused_iters or args.protocol != "threads2":
        timed_iters = args.iters
    hr_megapixels = n * (lr * s) ** 2 / 1e6 * timed_iters
    mp_s = hr_megapixels / best_dt

    record = {
        "metric": "dcscn_L12_x2_sr_throughput"
                  + ("_device" if args.fused_iters else ""),
        "value": round(mp_s, 3),
        "unit": "HR_megapixels/sec",
        "vs_baseline": round(mp_s / BASELINE_CPU_MP_S, 2),
    }
    if not args.fused_iters and args.protocol != "rebind":
        record["protocol"] = args.protocol

    if not args.fused_iters:
        # also report the device-side number (all timed iterations fused
        # into ONE dispatch) so relay-overhead drift in the default
        # protocol is visible per round (VERDICT r3 weak #8): the delta
        # between value and device_mp_s is pure per-dispatch relay cost
        import jax.lax as lax

        @jax.jit
        def forward_n(params, x, x2):
            def body(carry, _):
                xi = x + carry * jnp.float32(1e-30)
                y, _ = dcscn.apply(params, xi, x2, cfg, training=False,
                                   compute_dtype=cdt)
                return carry + y[0, 0, 0, 0], None

            acc, _ = lax.scan(body, jnp.float32(0), None, length=args.iters)
            return acc

        jax.device_get(forward_n(params, x, x2))  # compile
        best_dev = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            jax.device_get(forward_n(params, x, x2))
            best_dev = min(best_dev, time.perf_counter() - t0)
        # forward_n always scans exactly args.iters (independent of any
        # threads2 rounding in the protocol loop above)
        record["device_mp_s"] = round(
            n * (lr * s) ** 2 / 1e6 * args.iters / best_dev, 3)

    print(json.dumps(record))


def bench_train(args):
    """Training throughput: S optimizer steps of the flagship L12 x2 on a
    synthetic on-device patch store.

    Fused mode (default) runs all S steps in ONE dispatch via the epoch
    scan (the production path, cli/train.py _train_loop_scan), so the
    measurement is device-side. TFLOP/s is derived from the reference's
    complexity accounting (MACs/LR-pixel) x 2 FLOPs/MAC x 3 (forward +
    backward ~ 3x forward) — an estimate that ignores optimizer/elementwise
    FLOPs, i.e. a lower bound on achieved compute.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcscn_tpu.config import Config
    from dcscn_tpu.models import dcscn
    from dcscn_tpu.train import trainer as trainer_mod

    if args.jit_cache_dir:
        from dcscn_tpu.engine import init_compilation_cache
        init_compilation_cache(args.jit_cache_dir)

    cfg = Config(dtype=args.dtype)  # flagship L12 x2, batch 20, 48px patches
    if args.train_small:
        cfg = cfg.replace(layers=3, filters=8, min_filters=4, nin_filters=8,
                          nin_filters2=4, batch_image_size=16)
    steps = args.train_steps
    tr = trainer_mod.Trainer(cfg)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = tr.init_opt_state(params)
    opt_state = tr.set_lr(opt_state, cfg.initial_lr)

    rng = np.random.default_rng(0)
    count = 4096
    b, s = cfg.batch_image_size, cfg.scale
    store_np = {
        "input": rng.integers(0, 255, (count, b, b, 1), np.uint8),
        "interp": rng.integers(0, 255, (count, b * s, b * s, 1), np.uint8),
        "true": rng.integers(0, 255, (count, b * s, b * s, 1), np.uint8),
    }
    store = tr.shard_store(store_np)
    idx = rng.integers(0, count, (steps, cfg.batch_num)).astype(np.int32)

    if args.train_host_fed:
        # reference-style loop: one jitted step per dispatch, numpy feed
        # (train.py:80-81 / DCSCN.py:415-425)
        step_fn = tr.train_step()

        def run(p, o, n):
            bn = None
            for k in range(n):
                bi = idx[k % len(idx)]
                batch = trainer_mod.Batch(
                    jnp.asarray(store_np["input"][bi].astype(np.float32)),
                    jnp.asarray(store_np["interp"][bi].astype(np.float32)),
                    jnp.asarray(store_np["true"][bi].astype(np.float32)))
                p, o, bn, m = step_fn(p, o, bn, batch, jax.random.PRNGKey(k))
            jax.device_get(m.loss)
            return p, o

        params, opt_state = run(params, opt_state, 3)  # warmup/compile
        t0 = time.perf_counter()
        params, opt_state = run(params, opt_state, steps)
        dt = time.perf_counter() - t0
        mode = "host_fed"
    else:
        scan_fn = tr.epoch_scan()
        idx_dev = tr.shard_indices(idx)

        def run(p, o):
            p, o, _, m = scan_fn(p, o, None, store, idx_dev, jax.random.PRNGKey(1))
            jax.device_get(m.loss)
            return p, o

        params, opt_state = run(params, opt_state)  # compile
        params, opt_state = run(params, opt_state)  # second compile variant
        # (donated-buffer layouts differ from fresh device_puts on call 1)
        t0 = time.perf_counter()
        params, opt_state = run(params, opt_state)
        dt = time.perf_counter() - t0
        mode = "fused_scan"

    s_per_step = dt / steps
    macs_per_px = dcscn.complexity_report(cfg)["complexity"]
    flops = steps * cfg.batch_num * b * b * macs_per_px * 2 * 3
    tflops = flops / dt / 1e12

    model_tag = "L3small" if args.train_small else "L12"
    print(json.dumps({
        "metric": "dcscn_%s_x2_train_%s" % (model_tag, mode),
        "value": round(s_per_step, 5),
        "unit": "sec/step",
        "vs_baseline": round(0.196 / s_per_step, 2),  # measured host-fed
        # reference-equivalent loop on this chip (PARITY.md round 3)
        "tflops_est": round(tflops, 2),
        "steps": steps,
        "batch": cfg.batch_num,
    }))


if __name__ == "__main__":
    main()
