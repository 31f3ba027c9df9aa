#!/bin/bash
# Round-5 stage D (runs after r5b, before the re-chained r5c): L1
# fine-tunes of the canonical x4/x3 flagships on the multi-scale
# augmented corpus combineds_8 (bsd200+yang91 originals + 0.9/0.8/0.7x
# PIL-bicubic downscales, all x8 dihedral — ~2.9x the distinct content
# of combined_8). Targets the measured data wall behind the remaining
# out-of-tolerance cells (x4 set5 -0.19, x4 set14 -0.08, x3 set5 -0.12
# vs the published DIV2K line): same proven 36-epoch 2.5e-4 L1 recipe
# that won round 4, only the data changes. Tail snapshots feed SWA
# soups. Promotion stays eval-gated and manual.
set -u
cd /root/repo
R=results/r5
mkdir -p $R
echo $$ > /tmp/queue_r5d.pid

if [ -f /tmp/queue_r5b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r5b.pid)" 2>/dev/null; do sleep 60; done
fi
# the CPU-side store prebuild must be done too (cheap wait; it finishes
# hours before the TPU queue reaches this point in the normal case)
while [ ! -f batch_data/combineds_8/scale3/batch_images.npz ] || \
      [ ! -f batch_data/combineds_8/scale4/batch_images.npz ]; do
  echo "[r5d] waiting for combineds_8 patch stores..." >&2
  sleep 60
done

COMMON="--dataset=combineds_8 --test_dataset=set5 --build_batch=True \
  --use_l1_loss=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --training_images=48000 --initial_lr=0.00025 --snapshot_tail_epochs=6"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r5d] x4 multi-scale-data L1 fine-tune of _r5w4" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 10800 bash tools/train_resilient.sh \
  $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5ms4 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5w4 \
  --log_filename=$R/train_x4ms.log > $R/train_x4ms.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5d] x4 ms train FAILED rc=$rc" >> $R/train_x4ms.out; fi
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5ms4 \
  --log_filename=$R/eval_x4ms.log > $R/eval_x4ms.out 2>&1

echo "[r5d] x4 SWA tail-soup of the ms run" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5ms4_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS" \
    --dst dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5msw4 > $R/soup_x4msw.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=4 \
    --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r5msw4 \
    --log_filename=$R/eval_x4msw.log > $R/eval_x4msw.out 2>&1
fi


X3PARENT=$(python - << 'PEOF'
import re
def total(path):
    try:
        txt = open(path).read()
    except OSError:
        return 0.0
    vals = re.findall(r"Model Average \[(?:set5|set14|bsd100)\] PSNR:([0-9.]+)", txt)
    return sum(float(v) for v in vals[-3:]) if len(vals) >= 3 else 0.0
w3 = total("results/r5/eval_x3w.out")
d3 = total("results/r5/eval_x3d.out")
print("dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_" + ("r5w3" if w3 > d3 else "r5d3"))
PEOF
)
echo "[r5d] x3 ms parent: $X3PARENT" >&2

echo "[r5d] x3 multi-scale-data L1 fine-tune of $X3PARENT" >&2
MAX_TRIES=4 RECOVER_WAIT=7200 timeout 10800 bash tools/train_resilient.sh \
  $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5ms3 \
  --load_model_name=$X3PARENT \
  --log_filename=$R/train_x3ms.log > $R/train_x3ms.out 2>&1
rc=$?
if [ $rc -ne 0 ]; then echo "[r5d] x3 ms train FAILED rc=$rc" >> $R/train_x3ms.out; fi
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5ms3 \
  --log_filename=$R/eval_x3ms.log > $R/eval_x3ms.out 2>&1

echo "[r5d] x3 SWA tail-soup of the ms run" >&2
SNAPS=$(ls models/dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5ms3_snapE*.ckpt.npz 2>/dev/null \
  | sed 's|models/||; s|\.ckpt\.npz$||' | paste -sd,)
if [ -n "$SNAPS" ]; then
  python tools/soup_ckpt.py --srcs "$SNAPS" \
    --dst dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5msw3 > $R/soup_x3msw.out 2>&1 && \
  timeout 7200 python evaluate.py $EVAL --scale=3 \
    --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r5msw3 \
    --log_filename=$R/eval_x3msw.log > $R/eval_x3msw.out 2>&1
fi

echo "[r5d] done" >&2
