#!/bin/bash
# Round-4 recipe experiment (VERDICT r3 weak #5): the untried patch-geometry
# lever against the residual x3/x4 training gap. Fine-tune the canonical x3
# and x4 flagships at batch_image_size=64 / stride 32 (all prior runs and
# data-wall controls used 48/24 — the published DIV2K recipe) on combined_8,
# low-LR continue schedule (2.5e-4 halving, 4 stages x 9 epochs), then the
# full x8-ensemble eval. A separate --batch_dir keeps the bis-48 stores
# intact. Promotion stays gated on the eval (tools/promote_ckpt.py).
set -u
cd /root/repo
R=results/r4
mkdir -p $R
# register for the chip-serialization handshake (queue_r4c.sh waits on this)
echo $$ > /tmp/queue_r4a.pid

# --scan_chunk=1200: a single 2400-step dispatch of 64px patches crashed
# the TPU worker (same failure class as the known 4800-step/48px crash,
# results/r4/train_x3p64.out first attempt); half-epoch dispatches are the
# proven-safe program size.
COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --batch_image_size=64 --batch_dir=batch_data_bis64 --scan_chunk=1200 \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False --training_images=48000 --initial_lr=0.00025"
EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

echo "[r4a] fine-tune x3 at bis=64 from canonical" >&2
timeout 10800 python train.py $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4p64 \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x3p64.log > $R/train_x3p64.out 2>&1

echo "[r4a] eval x3 _r4p64" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=3 $EVAL \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4p64 \
  --log_filename=$R/eval_x3p64.log > $R/eval_x3p64.out 2>&1

echo "[r4a] fine-tune x4 at bis=64 from canonical" >&2
timeout 10800 python train.py $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4p64 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x4p64.log > $R/train_x4p64.out 2>&1

echo "[r4a] eval x4 _r4p64" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=4 $EVAL \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4p64 \
  --log_filename=$R/eval_x4p64.log > $R/eval_x4p64.out 2>&1

echo "[r4a] done" >&2
