#!/usr/bin/env python3
"""Capture a jax.profiler trace of the flagship forward pass.

TPU-native replacement for the reference's RunMetadata/tfprof dumps
(DCSCN.py:453-468). View with TensorBoard's profile plugin:

    python tools/profile_forward.py --trace_dir tf_log/profile --iters 3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="tf_log/profile")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr_size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--jit_cache_dir", default="/root/repo/.jax_cache")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dcscn_tpu.config import Config
    from dcscn_tpu.models import dcscn

    if args.jit_cache_dir:
        from dcscn_tpu.engine import init_compilation_cache
        init_compilation_cache(args.jit_cache_dir)

    cfg = Config(dropout_rate=1.0)
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = dcscn.init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def forward(params, x, x2):
        y, _ = dcscn.apply(params, x, x2, cfg, training=False, compute_dtype=cdt)
        return y

    n, lr, s = args.batch, args.lr_size, cfg.scale
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, lr, lr, 1), jnp.float32, 0, 255)
    x2 = jax.random.uniform(jax.random.PRNGKey(2), (n, lr * s, lr * s, 1), jnp.float32, 0, 255)
    jax.device_get(forward(params, x, x2))  # compile outside the trace

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            y = forward(params, x, x2)
        jax.device_get(y)
    print("trace written under %s" % args.trace_dir)


if __name__ == "__main__":
    main()
