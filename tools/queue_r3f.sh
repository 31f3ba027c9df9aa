#!/bin/bash
# Round-3 stage F: low-LR fine-tune of the promoted x4 flagship
# (continue training from the canonical ckpt at 2.5e-4 with the standard
# halving schedule — 4 stages x 9 epochs). Eval-gated like every run.
set -u
cd /root/repo
R=results/r3

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False --training_images=48000"
EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

echo "[r3f] fine-tune x4 from canonical (lr 2.5e-4)" >&2
timeout 9000 python train.py $COMMON --scale=4 --initial_lr=0.00025 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3ft \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x4ft.log > $R/train_x4ft.out 2>&1

echo "[r3f] eval x4 _r3ft" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=4 $EVAL \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3ft \
  --log_filename=$R/eval_x4_r3ft.log > $R/eval_x4_r3ft.out 2>&1

echo "[r3f] done" >&2
