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
import sys
import time

BASELINE_CPU_MP_S = 0.0792  # torch-CPU L12 x2 stand-in, measured here


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
    ap.add_argument("--jit_cache_dir", type=str, default="/root/repo/.jax_cache")
    args = ap.parse_args()

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
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = forward(params, x, x2)
            jax.device_get(y)
            best_dt = min(best_dt, time.perf_counter() - t0)

    hr_megapixels = n * (lr * s) ** 2 / 1e6 * args.iters
    mp_s = hr_megapixels / best_dt

    print(json.dumps({
        "metric": "dcscn_L12_x2_sr_throughput"
                  + ("_device" if args.fused_iters else ""),
        "value": round(mp_s, 3),
        "unit": "HR_megapixels/sec",
        "vs_baseline": round(mp_s / BASELINE_CPU_MP_S, 2),
    }))


if __name__ == "__main__":
    main()
