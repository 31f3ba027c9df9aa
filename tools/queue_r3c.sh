#!/bin/bash
# Round-3 TPU queue, stage C: device-limit bench (fused iterations),
# canary re-run at the measured tolerance, then the x2 flagship push:
# fresh train on full-dihedral combined_8 with double patches/epoch (96k)
# and a full-protocol eval. Promotion stays gated on beating the
# incumbent's eval.
set -u
cd /root/repo
R=results/r3

echo "[r3c] bench fused_iters (device-side throughput)" >&2
timeout 3600 python bench.py --fused_iters > $R/bench_fused_iters.json \
  2>$R/bench_fused_iters.err

echo "[r3c] bench default protocol (for BENCH_r03 comparability)" >&2
timeout 2400 python bench.py > $R/bench_default.json 2>$R/bench_default.err

echo "[r3c] canary (tolerance = measured TPU rounding bound)" >&2
timeout 1800 python tools/canary_tpu.py --out $R/canary.json \
  > $R/canary.out 2>$R/canary.err

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r3c] train x2 (96k patches/epoch, combined_8)" >&2
timeout 14400 python train.py $COMMON --scale=2 --training_images=96000 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r3b \
  --log_filename=$R/train_x2b.log > $R/train_x2b.out 2>&1

EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

echo "[r3c] eval x2 _r3b (full protocol)" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=2 $EVAL \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r3b \
  --log_filename=$R/eval_x2_r3b.log > $R/eval_x2_r3b.out 2>&1

echo "[r3c] done" >&2
