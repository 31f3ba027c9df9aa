#!/bin/bash
# Sequential training queue: waits for any running train.py, then trains the
# L12 flagship at x3 and x4 on the combined augmented dataset and benchmarks
# each with the full x8-ensemble protocol.
set -u
cd /root/repo

wait_for_tpu() {
  while pgrep -f "python train.py" > /dev/null || pgrep -f "python evaluate.py" > /dev/null; do
    sleep 60
  done
}

COMMON="--dataset=combined_7 --test_dataset=set5 --build_batch=True \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

wait_for_tpu
echo "[queue] training L12 x3" >&2
python train.py $COMMON --scale=3 --log_filename=/tmp/train_l12_x3.log \
  > /tmp/train_l12_x3.out 2>&1

echo "[queue] training L12 x4" >&2
python train.py $COMMON --scale=4 --log_filename=/tmp/train_l12_x4.log \
  > /tmp/train_l12_x4.out 2>&1

echo "[queue] benchmarking x3/x4" >&2
for s in 3 4; do
  python evaluate.py --test_dataset=all --scale=$s --save_results=False \
    --self_ensemble=8 --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
    --initialize_tf_log=False --log_filename=/tmp/eval_l12_x$s.log \
    > /tmp/eval_l12_x$s.out 2>&1
done
echo "[queue] done" >&2
