#!/bin/bash
# Round-5 stage H (chains after r5g): L1 fine-tunes on the DEEPER
# multi-scale corpus combinedd_8 (bsd200+yang91 originals +
# 0.9/0.8/0.7/0.6/0.5x PIL-bicubic downscales, all x8 dihedral —
# ~3.9x the distinct content of combined_8, one more octave below
# combineds_8's 0.7 floor). Round 5 established that DATA, not compute,
# moves the remaining x4 set5 gap (-0.078 vs the published DIV2K line):
# combineds_8 bought +0.10 with the same 36-epoch 2.5e-4 L1 recipe.
# This tests whether the next data increment keeps paying. Parent for
# x4 is passed via $X4PARENT at launch (the best of _r5f4/_r5fw4/_r5ms4
# per the r5g evals); x3 fine-tunes from the canonical _r5ms3.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5h.pid

X4PARENT="${X4PARENT:?pass X4PARENT=<ckpt name without models/ or .ckpt.npz>}"

if [ -f /tmp/queue_r5g.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5g.pid)" 2>/dev/null; do sleep 30; done
fi
# CPU-side patch stores for the new corpus (augmentation must be done)
while [ ! -f batch_data/combinedd_8/scale4/batch_images.npz ] || \
      [ ! -f batch_data/combinedd_8/scale3/batch_images.npz ]; do
  echo "[r5h] waiting for combinedd_8 patch stores..." >&2
  sleep 60
done

COMMON="--dataset=combinedd_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025 --snapshot_tail_epochs=6"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5h] x4 deeper-multi-scale L1 fine-tune of $X4PARENT" >&2
MAX_TRIES=4 RECOVER_WAIT=3600 timeout 9600 bash tools/train_resilient.sh \
  $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5h4 \
  --load_model_name="$X4PARENT" \
  --log_filename=$R/train_x4h.log > $R/train_x4h.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5h] x4 train FAILED rc=$rc" >> $R/train_x4h.out; fi
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5h4 \
  --log_filename=$R/eval_x4h.log > $R/eval_x4h.out 2>&1

echo "[r5h] x4 SWA tail-soup of the h run" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5h4_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5h4" \
    --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5hw4 > $R/soup_x4hw.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=4 \
    --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5hw4 \
    --log_filename=$R/eval_x4hw.log > $R/eval_x4hw.out 2>&1
fi

echo "[r5h] x3 deeper-multi-scale L1 fine-tune of _r5ms3" >&2
MAX_TRIES=4 RECOVER_WAIT=3600 timeout 9600 bash tools/train_resilient.sh \
  $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5h3 \
  --load_model_name=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5ms3 \
  --log_filename=$R/train_x3h.log > $R/train_x3h.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5h] x3 train FAILED rc=$rc" >> $R/train_x3h.out; fi
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5h3 \
  --log_filename=$R/eval_x3h.log > $R/eval_x3h.out 2>&1

echo "[r5h] done" >&2
