#!/bin/bash
# Round-5 stage I (chains after r5h): x3 full-schedule L1 staircase on the
# multi-scale corpus combineds_8 from the fresh x2-L1 warm start — the
# exact lever that produced the x4 win in stage G (_r5fw4 beat the
# 36-epoch fine-tune _r5ms4 on all three datasets and was promoted).
# The canonical x3 (_r5ms3, 34.025 set5) is already inside the ±0.05
# target, but the same composition (multi-scale data at HIGH learning
# rate + SWA tail soup) should buy the same ~+0.01 and potentially turn
# the remaining x3 set5 −0.035 positive.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5i.pid

if [ -f /tmp/queue_r5h.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5h.pid)" 2>/dev/null; do sleep 30; done
fi

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5i] x3 full-schedule L1 on combineds_8 from r5warm" >&2
MAX_TRIES=4 RECOVER_WAIT=3600 timeout 9600 bash tools/train_resilient.sh \
  --dataset=combineds_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --snapshot_tail_epochs=6 \
  --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5f3 \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5warm \
  --log_filename=$R/train_x3f.log > $R/train_x3f.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5i] x3 full-schedule train FAILED rc=$rc" >> $R/train_x3f.out; fi

echo "[r5i] eval _r5f3" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5f3 \
  --log_filename=$R/eval_x3f.log > $R/eval_x3f.out 2>&1

echo "[r5i] SWA tail-soup of the f run" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5f3_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS,dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5f3" \
    --dst dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5fw3 > $R/soup_x3fw.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=3 \
    --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5fw3 \
    --log_filename=$R/eval_x3fw.log > $R/eval_x3fw.out 2>&1
fi

echo "[r5i] done" >&2
