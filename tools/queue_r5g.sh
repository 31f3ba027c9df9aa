#!/bin/bash
# Round-5 stage G (final training lever): full-schedule L1 x4 run on the
# multi-scale corpus combineds_8 from the fresh x2-L1 warm start.
# Rationale: the two best x4 recipes so far compose multiplicatively —
# full-schedule-from-warm on combined_8 gave 31.580 set5 (_r5w4) and a
# 36-epoch fine-tune on combineds_8 gave +0.06 on top (_r5ms4 31.642,
# still -0.078 vs the published 31.72) — but the multi-scale data has
# never been seen at HIGH learning rate. This run gives the 2.9x corpus
# the full 63-epoch staircase. Tail snapshots feed an SWA soup.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5g.pid

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5g] x4 full-schedule L1 on combineds_8 from r5warm" >&2
MAX_TRIES=4 RECOVER_WAIT=3600 timeout 9600 bash tools/train_resilient.sh \
  --dataset=combineds_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --snapshot_tail_epochs=6 \
  --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5f4 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5warm \
  --log_filename=$R/train_x4f.log > $R/train_x4f.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5g] x4 full-schedule train FAILED rc=$rc" >> $R/train_x4f.out; fi

echo "[r5g] eval _r5f4" >&2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5f4 \
  --log_filename=$R/eval_x4f.log > $R/eval_x4f.out 2>&1

echo "[r5g] SWA tail-soup of the f run" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5f4_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5f4" \
    --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5fw4 > $R/soup_x4fw.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=4 \
    --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5fw4 \
    --log_filename=$R/eval_x4fw.log > $R/eval_x4fw.out 2>&1
fi

echo "[r5g] done" >&2
