#!/bin/bash
# Round-4 part D: apply the recipe that edged out the x3/x4 flagships
# (patch-64 low-LR fine-tune + uniform 2-member soup, PARITY.md round-4
# recipe experiments) to the x2 flagship, which never got it. Chains after
# queue_r4b.sh releases the chip. Promotion stays manual and gated
# (tools/promote_ckpt.py); if promoted, re-certify with eval_l12_x2 only.
set -u
cd /root/repo
R=results/r4
mkdir -p $R

if [ -f /tmp/queue_r4b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4b.pid)" 2>/dev/null; do sleep 30; done
fi

COMMON="--dataset=combined_8 --test_dataset=set5 --build_batch=True \
  --batch_image_size=64 --batch_dir=batch_data_bis64 --scan_chunk=1200 \
  --self_ensemble=1 --tile_size=0 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False --training_images=48000 --initial_lr=0.00025"
EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4d] fine-tune x2 at bis=64 from canonical" >&2
timeout 10800 python train.py $COMMON --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4p64 \
  --load_model_name=dcscn_L12_F196to48_NIN_A64_PS_R1F32 \
  --log_filename=$R/train_x2p64.log > $R/train_x2p64.out 2>&1

echo "[r4d] build x2 soup (canonical + p64 fine-tune)" >&2
python tools/soup_ckpt.py \
  --srcs=dcscn_L12_F196to48_NIN_A64_PS_R1F32,dcscn_L12_F196to48_NIN_A64_PS_R1F32_r4p64 \
  --dst=dcscn_L12_F196to48_NIN_A64_PS_R1F32_r4soup

echo "[r4d] eval x2 _r4p64" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4p64 \
  --log_filename=$R/eval_x2p64.log > $R/eval_x2p64.out 2>&1

echo "[r4d] eval x2 soup" >&2
timeout 7200 python evaluate.py $EVAL --scale=2 \
  --model_name=L12_F196to48_NIN_A64_PS_R1F32_r4soup \
  --log_filename=$R/eval_x2soup.log > $R/eval_x2soup.out 2>&1

echo "[r4d] done" >&2
