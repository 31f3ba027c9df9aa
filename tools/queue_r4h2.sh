#!/bin/bash
# Round-4 part H2: resume of the r4h x2 L1 fine-tune after the trainer
# wedged at epoch 17 (last train-state write 04:49; fresh-process probe
# healthy 18.6s). Continues from the per-epoch atomic train state via
# --load_model_name=resume under tools/train_resilient.sh, then evals.
set -u
cd /root/repo
R=results/r4
echo $$ > /tmp/queue_r4h2.pid

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4h2] resume L1 fine-tune x2 from epoch-17 train state" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 10800 bash tools/train_resilient.sh \
  $COMMON --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --load_model_name=resume \
  --log_filename=$R/train_x2l1.log >> $R/train_x2l1.out 2>&1

echo "[r4h2] eval x2 _r4l1" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --log_filename=$R/eval_x2l1.log > $R/eval_x2l1.out 2>&1

echo "[r4h2] done" >&2
