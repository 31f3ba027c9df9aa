#!/bin/bash
# Round-3 TPU queue, stage D: push x3/x4 toward the published line with
# double patches/epoch (96k / 72k) warm-started from the best x2. Args:
#   $1 = x2 source model name to warm-start from
# Promotion stays eval-gated (tools/promote_ckpt.py, run manually).
set -u
cd /root/repo
R=results/r3
SRC=${1:-dcscn_L12_F196to48_NIN_A64_PS_R1F32}

echo "[r3d] build warm ckpts from $SRC" >&2
python tools/warm_start.py --src_name=$SRC --scale=3 --out_suffix=_warm3b \
  --jit_cache_dir=/root/repo/.jax_cache \
  > $R/warm3b.out 2>&1
python tools/warm_start.py --src_name=$SRC --scale=4 --out_suffix=_warm4b \
  --jit_cache_dir=/root/repo/.jax_cache \
  > $R/warm4b.out 2>&1

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"
EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

echo "[r3d] train x3 (96k, warm from $SRC)" >&2
timeout 14400 python train.py $COMMON --scale=3 --training_images=96000 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r3b \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_warm3b \
  --log_filename=$R/train_x3b.log > $R/train_x3b.out 2>&1

echo "[r3d] eval x3 _r3b" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=3 $EVAL \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r3b \
  --log_filename=$R/eval_x3_r3b.log > $R/eval_x3_r3b.out 2>&1

echo "[r3d] train x4 (72k, warm from $SRC)" >&2
timeout 14400 python train.py $COMMON --scale=4 --training_images=72000 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3b \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_warm4b \
  --log_filename=$R/train_x4b.log > $R/train_x4b.out 2>&1

echo "[r3d] eval x4 _r3b" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=4 $EVAL \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3b \
  --log_filename=$R/eval_x4_r3b.log > $R/eval_x4_r3b.out 2>&1

echo "[r3d] done" >&2
