"""Hang-proof TPU health probe for the axon relay.

A wedged relay makes EVERY jax call hang (even jax.devices()), so the
probe runs in a subprocess with a hard timeout and reports one JSON line:

    python tools/tpu_health.py [--timeout 60]
    {"ok": true, "latency_s": 8.3}          # chip reachable, matmul ran
    {"ok": false, "reason": "timeout"}      # relay wedged (kill+retry later)
    {"ok": false, "reason": "error", ...}   # backend raised

Used by operators before queueing chip work (CLAUDE.md: only ONE real
chip; a wedged relay stays wedged for the issuing process — fresh
processes reconnect once the worker returns). Exit code 0 iff ok.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# the probe pays remote-compile latency on a cache miss; point it at the
# repo's persistent XLA cache so a healthy chip answers in seconds, not
# the 2-10 min a cold compile can take (ADVICE r4)
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
_PROBE = """
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", %r)
x = jnp.ones((256, 256))
print(float(jax.device_get((x @ x).sum())))
""" % _CACHE_DIR


def probe(timeout: float = 60.0) -> dict:
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "reason": "timeout", "timeout_s": timeout}
    dt = round(time.time() - t0, 1)
    if out.returncode != 0:
        return {"ok": False, "reason": "error", "latency_s": dt,
                "stderr": out.stderr.strip().splitlines()[-1:]}
    try:
        val = float(out.stdout.strip().splitlines()[-1])
    except (ValueError, IndexError):
        return {"ok": False, "reason": "bad-output", "latency_s": dt}
    # ones(256,256) @ ones(256,256) -> 256 per cell; sum = 256^3
    return {"ok": val == 256.0 ** 3, "latency_s": dt}


def wait_healthy(deadline_s: float, timeout: float = 60.0,
                 interval_s: float = 120.0, sleep=time.sleep) -> dict:
    """Poll until the chip is healthy or deadline_s elapses.

    Returns the last probe result plus {"waited_s": ...}. Used to park a
    queued chip job behind an outage (the round-4 relay outage lasted 6+
    hours; fresh processes reconnect once the worker returns).
    """
    t0 = time.time()
    slept_total = 0.0
    while True:
        result = probe(timeout)
        # track requested sleep time too, so an injected no-op sleep (tests)
        # still converges on the deadline
        elapsed = max(time.time() - t0, slept_total)
        result["waited_s"] = round(elapsed, 1)
        if result["ok"] or elapsed >= deadline_s - 1e-3:
            return result
        # sleep only what fits in the budget so a wait shorter than the
        # interval still polls until the deadline, as the help text
        # promises (ADVICE r4)
        step = min(interval_s, deadline_s - elapsed)
        sleep(step)
        slept_total += step


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--timeout", type=float, default=60.0)
    ap.add_argument("--wait", type=float, default=0.0, metavar="SECONDS",
                    help="keep polling (every --interval) until healthy or "
                    "this many seconds have passed; exit 0 iff healthy")
    ap.add_argument("--interval", type=float, default=120.0)
    args = ap.parse_args(argv)
    if args.wait > 0:
        result = wait_healthy(args.wait, args.timeout, args.interval)
    else:
        result = probe(args.timeout)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
