#!/bin/bash
# Round-3 TPU queue, stage D': double-data x3/x4 pushes using the PROVEN
# 2400-step epoch scan (the 4800-step/96k scan crashes this sandbox's TPU
# worker — results/r3/train_{x2b,x3b}.out). Identical LR-vs-steps
# trajectory to a 96k run: 48k patches/epoch with lr_decay_epoch doubled
# to 18 (126 epochs) for x3 and 12 (84 epochs) for x4.
set -u
cd /root/repo
R=results/r3

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False --training_images=48000"
EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

echo "[r3e] train x3 (48k x 126 epochs, warm)" >&2
timeout 14400 python train.py $COMMON --scale=3 --lr_decay_epoch=18 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r3c \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_warm3b \
  --log_filename=$R/train_x3c.log > $R/train_x3c.out 2>&1

echo "[r3e] eval x3 _r3c" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=3 $EVAL \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r3c \
  --log_filename=$R/eval_x3_r3c.log > $R/eval_x3_r3c.out 2>&1

echo "[r3e] train x4 (48k x 84 epochs, warm)" >&2
timeout 14400 python train.py $COMMON --scale=4 --lr_decay_epoch=12 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3c \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_warm4b \
  --log_filename=$R/train_x4c.log > $R/train_x4c.out 2>&1

echo "[r3e] eval x4 _r3c" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=4 $EVAL \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3c \
  --log_filename=$R/eval_x4_r3c.log > $R/eval_x4_r3c.out 2>&1

echo "[r3e] done" >&2
