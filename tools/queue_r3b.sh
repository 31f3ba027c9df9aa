#!/bin/bash
# Round-3 TPU queue, stage B (run after stage A): exactness canary,
# measurement benches (tiled ensemble, window gather), parity-grid
# re-evals at HEAD (L7 converted ckpt x2/x3/x4 + L12 x2 canonical), and
# the dynamic-vs-batch training-trajectory proof. Everything lands in
# results/r3/.
set -u
cd /root/repo
R=results/r3

echo "[r3b] canary" >&2
timeout 3600 python tools/canary_tpu.py --out $R/canary.json \
  > $R/canary.out 2>$R/canary.err

echo "[r3b] bench_tiled_ensemble" >&2
timeout 3600 python tools/bench_tiled_ensemble.py \
  > $R/bench_tiled_ens.json 2>$R/bench_tiled_ens.err

echo "[r3b] bench_gather" >&2
timeout 3600 python tools/bench_gather.py \
  > $R/bench_gather.json 2>$R/bench_gather.err

EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"
L7="--layers=7 --filters=32 --min_filters=8 --filters_decay_gamma=1.2 \
  --nin_filters=24 --nin_filters2=8"

echo "[r3b] eval L12 x2 canonical" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=2 $EVAL \
  --log_filename=$R/eval_l12_x2.log > $R/eval_l12_x2.out 2>&1

for s in 2 3 4; do
  echo "[r3b] eval L7 x$s" >&2
  timeout 7200 python evaluate.py --test_dataset=all --scale=$s $EVAL $L7 \
    --log_filename=$R/eval_l7_x${s}.log > $R/eval_l7_x${s}.out 2>&1
done

echo "[r3b] profile forward (bench shape)" >&2
timeout 3600 python tools/profile_forward.py --trace_dir $R/profile --iters 10 \
  > $R/profile.out 2>&1
python tools/parse_xplane.py $R/profile --json > $R/profile_summary.json 2>/dev/null
python tools/parse_xplane.py $R/profile --top 15 > $R/profile_summary.txt 2>/dev/null

SMOKE="--layers=7 --filters=32 --min_filters=8 --filters_decay_gamma=1.2 \
  --nin_filters=24 --nin_filters2=8 --dataset=bsd200 --test_dataset=set5 \
  --training_images=24000 --batch_num=20 --end_lr=0.0015 --self_ensemble=1 \
  --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r3b] trajectory: batch path" >&2
timeout 3600 python train.py $SMOKE --build_batch=True --model_name=traj_batch \
  --log_filename=$R/traj_batch.log > $R/traj_batch.out 2>&1

echo "[r3b] trajectory: dynamic path" >&2
timeout 3600 python train.py $SMOKE --build_batch=False --model_name=traj_dynamic \
  --log_filename=$R/traj_dynamic.log > $R/traj_dynamic.out 2>&1

echo "[r3b] done" >&2
