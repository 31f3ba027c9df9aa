#!/bin/bash
# Round-4 soup evals: after queue_r4a.sh finishes (x4 p64 fine-tune + eval),
# build the uniform 2-member soups (canonical + patch-64 fine-tune, same
# basin) for x3 and x4 and run the full x8-ensemble grid on each. Promotion
# decisions happen manually afterwards (tools/promote_ckpt.py), then
# queue_r4b.sh re-certifies the grid at HEAD.
set -u
cd /root/repo
R=results/r4
mkdir -p $R
echo $$ > /tmp/queue_r4c.pid

# wait for the r4a queue to release the chip
if [ -f /tmp/queue_r4a.pid ]; then
  while kill -0 "$(cat /tmp/queue_r4a.pid)" 2>/dev/null; do sleep 30; done
fi

echo "[r4c] build x3 soup" >&2
python tools/soup_ckpt.py \
  --srcs=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32,dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4p64 \
  --dst=dcscn_L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4soup

EVAL="--test_dataset=all --save_results=False --self_ensemble=8 \
  --tile_size=48 --jit_cache_dir=/root/repo/.jax_cache \
  --initialize_tf_log=False"

echo "[r4c] build x4 soup" >&2
python tools/soup_ckpt.py \
  --srcs=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32,dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4p64 \
  --dst=dcscn_L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4soup

echo "[r4c] eval x3 soup" >&2
timeout 7200 python evaluate.py $EVAL --scale=3 \
  --model_name=L12_F196to48_Sc3_NIN_A64_PS_R1F32_r4soup \
  --log_filename=$R/eval_x3soup.log > $R/eval_x3soup.out 2>&1

echo "[r4c] eval x4 soup" >&2
timeout 7200 python evaluate.py $EVAL --scale=4 \
  --model_name=L12_F196to48_Sc4_NIN_A64_PS_R1F32_r4soup \
  --log_filename=$R/eval_x4soup.log > $R/eval_x4soup.out 2>&1

echo "[r4c] done" >&2
