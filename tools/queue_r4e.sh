#!/bin/bash
# Round-4 part E: beyond-parity recipe experiment against the residual
# x3/x4 gap — low-LR fine-tune of the (soup) canonical flagships with
# --use_l1_loss=True (the reference's own alternative loss flag,
# DCSCN.py:334-367; L1 fine-tuning is the standard post-hoc PSNR lever for
# SR nets). Standard 48px patch geometry so loss is the only variable.
# Chains after queue_r4d.sh releases the chip. Promotion stays manual and
# gated (tools/promote_ckpt.py).
set -u
cd /root/repo
R=results/r4
mkdir -p $R
echo $$ > /tmp/queue_r4e.pid

if [ -f /tmp/queue_r4d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4d.pid)" 2>/dev/null; do sleep 30; done
fi

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4e] L1 fine-tune x4 from canonical" >&2
timeout 10800 python train.py $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4l1 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x4l1.log > $R/train_x4l1.out 2>&1

echo "[r4e] eval x4 _r4l1" >&2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4l1 \
  --log_filename=$R/eval_x4l1.log > $R/eval_x4l1.out 2>&1

echo "[r4e] L1 fine-tune x3 from canonical" >&2
timeout 10800 python train.py $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4l1 \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x3l1.log > $R/train_x3l1.out 2>&1

echo "[r4e] eval x3 _r4l1" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4l1 \
  --log_filename=$R/eval_x3l1.log > $R/eval_x3l1.out 2>&1

echo "[r4e] done" >&2
