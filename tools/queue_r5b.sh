#!/bin/bash
# Round-5 TPU queue, stage B (runs after r5a): same-basin soups of the
# deep-staircase continuations with their parents, relay-protocol
# dispatch experiments on the idle chip, and the bf16 training A/B
# (VERDICT r4 next #9). Promotion stays eval-gated and manual.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5b.pid

# wait for queue_r5a to finish (one chip, one job)
if [ -f /tmp/queue_r5a.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5a.pid)" 2>/dev/null; do sleep 60; done
fi

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5b] soup x4: canonical (r4l1) + r5d4" >&2
python tools/soup_ckpt.py \
  --srcs dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5d4 \
  --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5s4 > $R/soup_x4.out 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  timeout 7200 python evaluate.py $EVAL --scale=4 \
    --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5s4 \
    --log_filename=$R/eval_x4s.log > $R/eval_x4s.out 2>&1
else
  echo "[r5b] soup x4 build FAILED rc=$rc — eval skipped" >> $R/eval_x4s.out
fi

echo "[r5b] soup x3: canonical (r4l1) + r5d3" >&2
python tools/soup_ckpt.py \
  --srcs dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32,dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5d3 \
  --dst dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5s3 > $R/soup_x3.out 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  timeout 7200 python evaluate.py $EVAL --scale=3 \
    --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5s3 \
    --log_filename=$R/eval_x3s.log > $R/eval_x3s.out 2>&1
else
  echo "[r5b] soup x3 build FAILED rc=$rc — eval skipped" >> $R/eval_x3s.out
fi

echo "[r5b] relay-protocol dispatch variants (idle chip)" >&2
timeout 3600 python tools/bench_protocols.py > $R/bench_protocols.json 2> $R/bench_protocols.err

echo "[r5b] bf16 training A/B" >&2
timeout 3600 python bench.py --train --train_steps=200 \
  > $R/bench_train_f32.json 2> $R/bench_train_f32.err
timeout 3600 python bench.py --train --train_steps=200 --dtype=bfloat16 \
  > $R/bench_train_bf16.json 2> $R/bench_train_bf16.err

echo "[r5b] done" >&2
