#!/bin/bash
# Round-2 TPU queue: after the x3 training frees the chip, measure the
# A1+B1 fusion on bench.py and the window-gather strategies, then train
# the x4 flagship (warm-started from x2, level-8 data, 48k patches/epoch).
set -u
cd /root/repo

while pgrep -f "train.py --dataset=combined_8 .*--scale=3" > /dev/null; do
  sleep 60
done
sleep 10

echo "[queue] bench.py (A1+B1 fusion)" >&2
timeout 2400 python bench.py > /tmp/bench_r2_a.out 2>/tmp/bench_r2_a.err

echo "[queue] bench_gather" >&2
timeout 2400 python tools/bench_gather.py > /tmp/bench_gather.out 2>/tmp/bench_gather.err

echo "[queue] training L12 x4" >&2
timeout 9000 python train.py --dataset=combined_8 --test_dataset=set5 \
  --build_batch=True --self_ensemble=1 --tile_size=0 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False \
  --scale=4 --training_images=48000 \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_warm \
  --log_filename=/tmp/train_l12_x4_r2.log > /tmp/train_l12_x4_r2.out 2>&1
echo "[queue] done" >&2
