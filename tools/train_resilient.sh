#!/bin/bash
# Crash-resilient training driver for the known axon TPU-worker failure
# mode (CLAUDE.md: oversized epoch-scan programs can crash the worker;
# it self-restarts within ~a minute). Training state (params + optimizer
# + LR-schedule position) is checkpointed atomically every epoch
# (api.save_train_state), so a crashed run is relaunched with
# --load_model_name=resume and continues from the last completed epoch.
# The reference has no recovery story at all (a crashed sess.run loses
# the run; SURVEY.md §5 "failure detection: none").
#
# Usage: tools/train_resilient.sh <train.py flags...>
# Any user-passed --load_model_name applies to the FIRST attempt only
# (warm starts); retries override it with =resume (argparse keeps the
# last occurrence).
set -u
cd "$(dirname "$0")/.."
MAX_TRIES=${MAX_TRIES:-5}
tries=0
fastfails=0
while true; do
  extra=""
  [ $tries -gt 0 ] && extra="--load_model_name=resume"
  start=$(date +%s)
  python train.py "$@" $extra && exit 0
  rc=$?
  tries=$((tries + 1))
  # deterministic failures (bad flag, missing data) die in seconds and
  # would sail through the health probe; two consecutive sub-45s exits
  # can't be worker crashes (those happen minutes into a scan), so stop
  # burning the attempt budget on them (ADVICE r4)
  if [ $(( $(date +%s) - start )) -lt 45 ]; then
    fastfails=$((fastfails + 1))
  else
    fastfails=0
  fi
  if [ $fastfails -ge 2 ]; then
    echo "[train_resilient] two consecutive sub-45s failures — looks" \
         "deterministic (bad flags/data), not a chip crash; giving up" >&2
    exit $rc
  fi
  if [ $tries -ge "$MAX_TRIES" ]; then
    echo "[train_resilient] giving up after $tries failed attempts" >&2
    exit $rc
  fi
  echo "[train_resilient] train.py exited rc=$rc (attempt $tries/$MAX_TRIES);" \
       "waiting for the TPU worker to recover, then resuming" >&2
  sleep "${RECOVER_GRACE:-60}"  # worker self-restart takes ~a minute; don't probe a corpse
  # a retry against a still-wedged relay would burn the attempt budget in
  # minutes during a multi-hour outage — park until the chip answers
  if ! python tools/tpu_health.py --wait "${RECOVER_WAIT:-14400}" --interval 60; then
    echo "[train_resilient] chip still unreachable after RECOVER_WAIT;" \
         "giving up (resume later with --load_model_name=resume)" >&2
    exit $rc
  fi
done
