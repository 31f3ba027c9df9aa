#!/bin/bash
# Round-5 TPU queue, stage C (runs after r5b): second-seed L1 fine-tunes
# of the x3/x4 L2 soup parents (--train_seed=7 gives an independent data
# order), then multi-member same-basin soups with the existing L1
# members. All members per scale descend from the same L2 parent
# (_r4soup) under the same L1 loss, so uniform averaging is valid
# (PARITY.md round-4: cross-loss soups collapse; same-basin soups gain
# ~+0.01 dB). Promotion stays eval-gated and manual.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5c.pid

if [ -f /tmp/queue_r5d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5d.pid)" 2>/dev/null; do sleep 60; done
fi

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025 --train_seed=7 \
  --snapshot_tail_epochs=6"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5c] x4 second-seed L1 fine-tune from the L2 soup parent" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 10800 bash tools/train_resilient.sh \
  $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5l1b \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4soup \
  --log_filename=$R/train_x4l1b.log > $R/train_x4l1b.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5c] x4 seed-7 train FAILED rc=$rc" >> $R/train_x4l1b.out; fi


echo "[r5c] x4 SWA tail-soup of the seed-7 run's last 6 epochs" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5l1b_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS" \
    --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5swa4 > $R/soup_x4swa.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=4 \
    --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5swa4 \
    --log_filename=$R/eval_x4swa.log > $R/eval_x4swa.out 2>&1
fi

echo "[r5c] x4 seed-pair and 3-member soups + evals" >&2
python tools/soup_ckpt.py \
  --srcs dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4l1,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5l1b \
  --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5sb > $R/soup_x4b.out 2>&1 && \
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5sb \
  --log_filename=$R/eval_x4sb.log > $R/eval_x4sb.out 2>&1
python tools/soup_ckpt.py \
  --srcs dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5d4,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5l1b \
  --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5sc > $R/soup_x4c.out 2>&1 && \
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5sc \
  --log_filename=$R/eval_x4sc.log > $R/eval_x4sc.out 2>&1

echo "[r5c] x3 second-seed L1 fine-tune from the L2 soup parent" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 10800 bash tools/train_resilient.sh \
  $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5l1b \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4soup \
  --log_filename=$R/train_x3l1b.log > $R/train_x3l1b.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5c] x3 seed-7 train FAILED rc=$rc" >> $R/train_x3l1b.out; fi


echo "[r5c] x3 SWA tail-soup of the seed-7 run's last 6 epochs" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5l1b_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS" \
    --dst dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5swa3 > $R/soup_x3swa.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=3 \
    --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5swa3 \
    --log_filename=$R/eval_x3swa.log > $R/eval_x3swa.out 2>&1
fi

echo "[r5c] x3 seed-pair soup + evals" >&2
python tools/soup_ckpt.py \
  --srcs dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4l1,dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5l1b \
  --dst dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5sb > $R/soup_x3b.out 2>&1 && \
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5sb \
  --log_filename=$R/eval_x3sb.log > $R/eval_x3sb.out 2>&1
python tools/soup_ckpt.py \
  --srcs dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5d3,dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5l1b \
  --dst dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5sc > $R/soup_x3c.out 2>&1 && \
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5sc \
  --log_filename=$R/eval_x3sc.log > $R/eval_x3sc.out 2>&1

echo "[r5c] done" >&2
