#!/bin/bash
# Round-4 part H: redo of r4g's x2 leg after the TPU-worker outage killed
# it (results/r4/eval_x3s2.out FAILED_PRECONDITION, then a hung train).
# L1 fine-tune of the x2 flagship + eval. The soup2 step is intentionally
# dropped: r4g proved cross-loss soups collapse (eval_x4s2.out ~25 dB).
# Run when the chip is back; promotion manual (tools/promote_ckpt.py).
set -u
cd /root/repo
R=results/r4
mkdir -p $R
echo $$ > /tmp/queue_r4h.pid

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4h] L1 fine-tune x2 from canonical (p64 ft)" >&2
timeout 10800 python train.py $COMMON --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --load_model_name=dcscn_L12_F196to48_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x2l1.log > $R/train_x2l1.out 2>&1

echo "[r4h] eval x2 _r4l1" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --log_filename=$R/eval_x2l1.log > $R/eval_x2l1.out 2>&1

echo "[r4h] done" >&2
