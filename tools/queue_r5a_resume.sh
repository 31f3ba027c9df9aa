#!/bin/bash
# Round-5 stage-A RESUME: the machine restarted mid-leg-2 (x3 _r5d3 was
# killed at epoch 14/36 and the .ckpt.train.npz did not survive, so the
# leg restarts from the canonical checkpoint — it is only ~45 min).
# Leg 1 (x4 _r5d4) completed and was evaluated before the restart
# (results/r5/{train,eval}_x4d.*), so this script runs legs 2-4 only.
# Writes /tmp/queue_r5a.pid so queue_r5b.sh chains off it unchanged.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5a.pid

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5a] leg 2 (restarted): x3 deep-staircase L1 continuation" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 14400 bash tools/train_resilient.sh \
  $COMMON --scale=3 --initial_lr=0.0000625 --end_lr=0.000004 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5d3 \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x3d.log > $R/train_x3d.out 2>&1
echo "[r5a] eval x3 _r5d3" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5d3 \
  --log_filename=$R/eval_x3d.log > $R/eval_x3d.out 2>&1

echo "[r5a] build fresh warm ckpts from the x2 L1 flagship" >&2
python tools/warm_start.py \
  --src_name=dcscn_L12_F196to48_NIN_A64_PS_R1F32 --scale=4 \
  --out_suffix=_r5warm --jit_cache_dir=/root/repo/.jax_cache \
  > $R/warm4.out 2>&1
python tools/warm_start.py \
  --src_name=dcscn_L12_F196to48_NIN_A64_PS_R1F32 --scale=3 \
  --out_suffix=_r5warm --jit_cache_dir=/root/repo/.jax_cache \
  > $R/warm3.out 2>&1

echo "[r5a] leg 3: x4 full-schedule L1 train from r5warm" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 14400 bash tools/train_resilient.sh \
  $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5w4 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5warm \
  --log_filename=$R/train_x4w.log > $R/train_x4w.out 2>&1
echo "[r5a] eval x4 _r5w4" >&2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5w4 \
  --log_filename=$R/eval_x4w.log > $R/eval_x4w.out 2>&1

echo "[r5a] leg 4: x3 full-schedule L1 train from r5warm" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 14400 bash tools/train_resilient.sh \
  $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5w3 \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5warm \
  --log_filename=$R/train_x3w.log > $R/train_x3w.out 2>&1
echo "[r5a] eval x3 _r5w3" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5w3 \
  --log_filename=$R/eval_x3w.log > $R/eval_x3w.out 2>&1

echo "[r5a] done" >&2
