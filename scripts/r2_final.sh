#!/bin/bash
# Final round-2 runs: strictly-matched f32 vs bf16 pair (same seed, same
# burning schedule) for direct convergence-parity evidence, then two
# extra bf16 seeds for training-seed error bars.
set -u
cd /root/repo
while [ ! -f /tmp/r2_post_done ]; do sleep 60; done

common="task=al_mix task.dim_x=1 task.n_target_theta=2
  task.n_query_init=200 task.lengthscale_lower=0.1
  task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 min_T=30 T=30
  max_epoch=8000 burning_epoch=2000 checkpoint=0 verbose=250
  file_name=aline.pth"

timeout 4200 python train.py $common seed=7 dtype=float32 \
  output_dir=outputs/al1d_pair_f32 > /tmp/pair_f32.log 2>&1
timeout 3600 python train.py $common seed=7 dtype=bfloat16 \
  output_dir=outputs/al1d_pair_bf16 > /tmp/pair_bf16.log 2>&1
timeout 2400 python train.py $common seed=8 dtype=bfloat16 max_epoch=5000 \
  output_dir=outputs/al1d_seed8 > /tmp/seed8.log 2>&1
timeout 2400 python train.py $common seed=9 dtype=bfloat16 max_epoch=5000 \
  output_dir=outputs/al1d_seed9 > /tmp/seed9.log 2>&1
touch /tmp/r2_final_done
