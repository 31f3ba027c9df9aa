#!/bin/bash
# Round-4 end-of-round certification: re-record the flagship parity grid,
# the TPU exactness canary, and the three bench artifacts at HEAD, so every
# number cited in PARITY.md for round 4 has a committed log produced by the
# final round-4 code. Run AFTER queue_r4a.sh (and any promotion decision):
# the evals read the canonical checkpoints.
set -u
cd /root/repo
R=results/r4
mkdir -p $R
# register for the chip-serialization handshake (queue_r4d.sh waits on this)
echo $$ > /tmp/queue_r4b.pid

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4b] canary" >&2
timeout 3600 python tools/canary_tpu.py --out $R/canary_head.json \
  > $R/canary_head.out 2>&1

echo "[r4b] bench inference (default protocol + device-side)" >&2
timeout 3600 python bench.py > $R/bench_head.json 2> $R/bench_head.err

echo "[r4b] bench train (fused scan)" >&2
timeout 3600 python bench.py --train > $R/bench_train_head.json \
  2> $R/bench_train_head.err

echo "[r4b] eval L12 x2" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --log_filename=$R/eval_l12_x2_head.log > $R/eval_l12_x2_head.out 2>&1

echo "[r4b] eval L12 x3" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --log_filename=$R/eval_l12_x3_head.log > $R/eval_l12_x3_head.out 2>&1

echo "[r4b] eval L12 x4" >&2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --log_filename=$R/eval_l12_x4_head.log > $R/eval_l12_x4_head.out 2>&1

echo "[r4b] done" >&2
