#!/bin/bash
# Round-4 part G: follow through on the L1 result (eval_x4l1 beat the x4
# incumbent on all three datasets). Second-generation soups (current
# canonical + L1 fine-tune, same basin) for x4/x3, and the same L1
# fine-tune applied to the x2 flagship. Chains after queue_r4f.sh.
# Promotions stay manual and gated (tools/promote_ckpt.py).
set -u
cd /root/repo
R=results/r4
mkdir -p $R
echo $$ > /tmp/queue_r4g.pid

if [ -f /tmp/queue_r4f.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4f.pid)" 2>/dev/null; do sleep 30; done
fi

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4g] build + eval x4 soup2 (canonical + L1)" >&2
python tools/soup_ckpt.py \
  --srcs=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4l1 \
  --dst=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4s2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4s2 \
  --log_filename=$R/eval_x4s2.log > $R/eval_x4s2.out 2>&1

echo "[r4g] build + eval x3 soup2 (canonical + L1)" >&2
python tools/soup_ckpt.py \
  --srcs=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32,dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4l1 \
  --dst=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4s2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4s2 \
  --log_filename=$R/eval_x3s2.log > $R/eval_x3s2.out 2>&1

echo "[r4g] L1 fine-tune x2 from canonical (p64 ft)" >&2
timeout 10800 python train.py $COMMON --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --load_model_name=dcscn_L12_F196to48_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x2l1.log > $R/train_x2l1.out 2>&1

echo "[r4g] eval x2 _r4l1" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --log_filename=$R/eval_x2l1.log > $R/eval_x2l1.out 2>&1

echo "[r4g] build + eval x2 soup2 (canonical + L1)" >&2
python tools/soup_ckpt.py \
  --srcs=dcscn_L12_F196to48_NIN_A64_PS_R1F32,dcscn_L12_F196to48_NIN_A64_PS_R1F32_r4l1 \
  --dst=dcscn_L12_F196to48_NIN_A64_PS_R1F32_r4s2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4s2 \
  --log_filename=$R/eval_x2s2.log > $R/eval_x2s2.out 2>&1

echo "[r4g] done" >&2
