#!/bin/bash
# Round-2 queue, part B (run after the x4 training finishes):
# full-protocol evals of the retrained x3/x4 flagships + refreshed x2 eval,
# the tiled-ensemble wall-time bench, and the dynamic-vs-batch training
# trajectory proof (VERDICT item 8).
set -u
cd /root/repo

COMMON="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

for s in 3 4 2; do
  echo "[queueB] eval x$s" >&2
  timeout 5400 python evaluate.py --test_dataset=all --scale=$s $COMMON \
    --log_filename=/tmp/eval_l12_x${s}_r2.log > /tmp/eval_l12_x${s}_r2.out 2>&1
done

echo "[queueB] tiled-ensemble bench" >&2
timeout 3600 python tools/bench_tiled_ensemble.py \
  > /tmp/bench_tiled_ens.out 2>/tmp/bench_tiled_ens.err

SMOKE="--layers=7 --filters=32 --min_filters=8 --filters_decay_gamma=1.2 \
  --nin_filters=24 --nin_filters2=8 --dataset=bsd200 --test_dataset=set5 \
  --training_images=24000 --batch_num=20 --end_lr=0.0015 --self_ensemble=1 \
  --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False --model_name=traj"

echo "[queueB] trajectory: batch path" >&2
timeout 3600 python train.py $SMOKE --build_batch=True --model_name=traj_batch \
  --log_filename=/tmp/traj_batch.log > /tmp/traj_batch.out 2>&1

echo "[queueB] trajectory: dynamic path" >&2
timeout 3600 python train.py $SMOKE --build_batch=False --model_name=traj_dynamic \
  --log_filename=/tmp/traj_dynamic.log > /tmp/traj_dynamic.out 2>&1

echo "[queueB] done" >&2
