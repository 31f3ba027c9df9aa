"""Measure protocol variants for bench.py's default timed loop (VERDICT r4
weak #2: protocol 33.5 MP/s vs 54.7 device-side; the delta is ~50 ms of
axon-relay overhead per dispatch).

Each variant runs IDENTICAL per-iteration math (the same jitted flagship
forward, same shapes); they differ only in how dispatches are issued and
materialized:

  rebind      — the current bench.py loop: y = forward(...) each iter,
                device_get on the last result only
  hold_all    — keep every result alive in a list (no mid-loop deletion
                RPCs), device_get the last
  get_all     — device_get every result at the end (full D2H of all iters)
  interleave2 — two independent input buffers dispatched alternately
                (tests whether the relay overlaps independent executions)
  fused       — all iters in one lax.scan dispatch (device-side ceiling)

Prints one JSON line with MP/s per variant. Run only when the chip is
otherwise idle.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--jit_cache_dir", type=str, default="/root/repo/.jax_cache")
    ap.add_argument("--platform", type=str, default="",
                    help="force a jax backend (e.g. cpu) for smoke runs")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    from dcscn_tpu.config import Config
    from dcscn_tpu.engine import init_compilation_cache
    from dcscn_tpu.models import dcscn

    if args.jit_cache_dir:
        init_compilation_cache(args.jit_cache_dir)

    cfg = Config(dropout_rate=1.0)
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def forward(params, x, x2):
        y, _ = dcscn.apply(params, x, x2, cfg, training=False)
        return y

    @jax.jit
    def forward_n(params, x, x2):
        def body(carry, _):
            xi = x + carry * jnp.float32(1e-30)
            y, _ = dcscn.apply(params, xi, x2, cfg, training=False)
            return carry + y[0, 0, 0, 0], None

        acc, _ = lax.scan(body, jnp.float32(0), None, length=args.iters)
        return acc

    n, s, lr = args.batch, cfg.scale, args.lr_size
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (n, lr, lr, 1), jnp.float32, 0, 255)
    x2 = jax.random.uniform(key, (n, lr * s, lr * s, 1), jnp.float32, 0, 255)
    xb = jax.random.uniform(jax.random.PRNGKey(2), x.shape, jnp.float32, 0, 255)

    # warmup/compile every program shape first
    for _ in range(3):
        jax.device_get(forward(params, x, x2))
    jax.device_get(forward(params, xb, x2))
    jax.device_get(forward_n(params, x, x2))

    hr_mp = n * (lr * s) ** 2 / 1e6 * args.iters

    def timed(fn):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(hr_mp / best, 3)

    def rebind():
        y = None
        for _ in range(args.iters):
            y = forward(params, x, x2)
        jax.device_get(y)

    def hold_all():
        ys = [forward(params, x, x2) for _ in range(args.iters)]
        jax.device_get(ys[-1])

    def get_all():
        ys = [forward(params, x, x2) for _ in range(args.iters)]
        jax.device_get(ys)

    def interleave2():
        ys = [forward(params, (x if i % 2 == 0 else xb), x2)
              for i in range(args.iters)]
        jax.device_get(ys[-1])

    def fused():
        jax.device_get(forward_n(params, x, x2))

    def threads2():
        # two dispatcher threads, half the iterations each: if the relay's
        # execute call blocks the issuing thread on a synchronous RPC,
        # overlapping two issuers hides that round-trip
        import threading

        outs = [None, None]

        def work(slot, inp):
            y = None
            for _ in range(args.iters // 2):
                y = forward(params, inp, x2)
            outs[slot] = y

        ts = [threading.Thread(target=work, args=(0, x)),
              threading.Thread(target=work, args=(1, xb))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        jax.device_get(outs)

    out = {
        "bench": "protocol_variants",
        "batch": n, "lr_size": lr, "iters": args.iters,
        "mp_s": {
            "rebind": timed(rebind),
            "hold_all": timed(hold_all),
            "get_all": timed(get_all),
            "interleave2": timed(interleave2),
            "threads2": timed(threads2),
            "fused": timed(fused),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
