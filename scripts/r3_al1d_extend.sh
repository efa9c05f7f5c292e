#!/bin/bash
# GP-AL-1D 60k -> 100k resume (VERDICT item 5), launched alongside the
# round-3 chain once the GP-AL-2D 50k job releases its slot.
set -u
cd /root/repo
while ! grep -q "al2d_r3 exit:" /tmp/al2d_r3.log 2>/dev/null; do sleep 60; done
timeout 16200 python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 \
  task.n_query_init=200 task.lengthscale_lower=0.1 task.lengthscale_upper=2.0 \
  task.design_scale=5 gamma=1 min_T=30 T=30 max_epoch=100000 \
  burning_epoch=20000 dtype=bfloat16 checkpoint=4000 verbose=1000 \
  load_checkpoint=true checkpoint_name=ckpt_al_1d.tar \
  file_name=aline_al_1d.pth output_dir=outputs/al1d_r3_bf16 \
  > /tmp/al1d_r3.log 2>&1
touch /tmp/r3_al1d_train_done
timeout 5400 python scripts/eval_al.py outputs/al1d_r3_bf16 \
  --file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 \
  --mask data --seeds 0,1,2 > /tmp/eval_al1d_r3_data.log 2>&1
timeout 5400 python scripts/eval_al.py outputs/al1d_r3_bf16 \
  --file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 \
  --mask theta --seeds 0,1,2 > /tmp/eval_al1d_r3_theta.log 2>&1
touch /tmp/r3_al1d_done
