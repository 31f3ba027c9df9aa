#!/bin/bash
# Round-3 TPU queue, stage A: A1+B1 fusion A/B bench, then resume the x3
# warm-start training and run the x4 warm-start training under _r3run
# names (the canonical names keep the validated _v2 weights until the new
# runs BEAT them on the full eval protocol). All results land in
# results/r3/ so the round's evidence survives the snapshot.
set -u
cd /root/repo
R=results/r3

echo "[r3a] bench fuse_a1b1=1" >&2
timeout 2400 python bench.py --fuse_a1b1=1 > $R/bench_fuse_on.json 2>$R/bench_fuse_on.err
echo "[r3a] bench fuse_a1b1=0" >&2
timeout 2400 python bench.py --fuse_a1b1=0 > $R/bench_fuse_off.json 2>$R/bench_fuse_off.err

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False --training_images=48000"

echo "[r3a] resume x3 (_r3run, from epoch 28)" >&2
timeout 9000 python train.py $COMMON --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r3run \
  --load_model_name=resume \
  --log_filename=$R/train_x3.log > $R/train_x3.out 2>&1

echo "[r3a] train x4 (_r3run, warm-started from x2)" >&2
timeout 12000 python train.py $COMMON --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3run \
  --load_model_name=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_warm \
  --log_filename=$R/train_x4.log > $R/train_x4.out 2>&1

EVAL="--save_results=False --self_ensemble=8 --tile_size=48 \
  --jit_cache_dir=/root/repo/.jax_cache --initialize_tf_log=False"

echo "[r3a] eval x3 _r3run (full protocol)" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=3 $EVAL \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r3run \
  --log_filename=$R/eval_x3_r3run.log > $R/eval_x3_r3run.out 2>&1

echo "[r3a] eval x4 _r3run (full protocol)" >&2
timeout 7200 python evaluate.py --test_dataset=all --scale=4 $EVAL \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r3run \
  --log_filename=$R/eval_x4_r3run.log > $R/eval_x4_r3run.out 2>&1

echo "[r3a] done" >&2
