#!/bin/bash
# Round-5 final certification (run manually AFTER promotions): exactness
# canary, throughput + training benches (including the now-fixed bf16
# training A/B, VERDICT r4 #9), and HEAD re-evals of the promoted x3/x4
# canonicals so PARITY.md's grid is certified at HEAD (x2 unchanged this
# round — its round-4 certification stands).
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5final.pid

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5final] canary" >&2
timeout 3600 python tools/canary_tpu.py > $R/canary_head.json 2> $R/canary_head.err

echo "[r5final] bench (protocol + device-side)" >&2
timeout 3600 python bench.py > $R/bench_head.json 2> $R/bench_head.err

echo "[r5final] bench train f32 vs bf16 (A/B, fixed this round)" >&2
timeout 3600 python bench.py --train --train_steps=200 \
  > $R/bench_train_head.json 2> $R/bench_train_head.err
timeout 3600 python bench.py --train --train_steps=200 --dtype=bfloat16 \
  > $R/bench_train_bf16.json 2> $R/bench_train_bf16.err

echo "[r5final] HEAD re-eval: promoted x4 canonical" >&2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --log_filename=$R/eval_l12_x4_head.log > $R/eval_l12_x4_head.out 2>&1

echo "[r5final] HEAD re-eval: promoted x3 canonical" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --log_filename=$R/eval_l12_x3_head.log > $R/eval_l12_x3_head.out 2>&1

echo "[r5final] done" >&2
