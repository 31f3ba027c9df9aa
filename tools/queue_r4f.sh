#!/bin/bash
# Round-4 part F: re-certify the x2 flagship grid at HEAD under the
# canonical name after the patch-64 promotion (same pattern as
# queue_r4b.sh), plus a fresh exactness canary at final round-4 code.
# Chains after queue_r4e.sh releases the chip.
set -u
cd /root/repo
R=results/r4
mkdir -p $R
echo $$ > /tmp/queue_r4f.pid

if [ -f /tmp/queue_r4e.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4e.pid)" 2>/dev/null; do sleep 30; done
fi

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4f] canary at final HEAD" >&2
timeout 3600 python tools/canary_tpu.py --out $R/canary_final.json \
  > $R/canary_final.out 2>&1

echo "[r4f] eval L12 x2 (promoted p64) at HEAD" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --log_filename=$R/eval_l12_x2_final.log > $R/eval_l12_x2_final.out 2>&1

echo "[r4f] done" >&2
