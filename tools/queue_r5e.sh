#!/bin/bash
# Round-5 stage E: short deep-staircase continuation of the x4
# multi-scale winner — one last push on the single remaining
# out-of-tolerance cell (x4 set5 -0.078 vs the published line). The
# d-recipe (extra low-LR staircase tail) gained +0.003..+0.010 on every
# cell it touched this round; 4 stages of 5 epochs (6.25e-5 halved to
# 7.8e-6) fits the remaining chip budget. Tail snapshots feed a SWA
# soup if wanted. Runs after r5d; r5c was cut for time.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5e.pid

if [ -f /tmp/queue_r5d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5d.pid)" 2>/dev/null; do sleep 30; done
fi

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5e] x4 deep-staircase continuation of _r5ms4 (20 epochs)" >&2
MAX_TRIES=3 RECOVER_WAIT=3600 timeout 7200 bash tools/train_resilient.sh \
  --dataset=combineds_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --snapshot_tail_epochs=6 \
  --scale=4 --initial_lr=0.0000625 --end_lr=0.000007 --lr_decay_epoch=5 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5e4 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5ms4 \
  --log_filename=$R/train_x4e.log > $R/train_x4e.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5e] x4 continuation FAILED rc=$rc" >> $R/train_x4e.out; fi
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5e4 \
  --log_filename=$R/eval_x4e.log > $R/eval_x4e.out 2>&1

echo "[r5e] done" >&2
