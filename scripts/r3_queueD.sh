#!/bin/bash
# Round-3 queue D: quiet-chip measurements once queues A, B and the al1d
# extension are all done — per-task bench table (item 7), rollout-knob A/B,
# and the training-seed variance protocol on final eval metrics (weak #6):
# a third 5k-epoch seed + split-mask eval of all three training seeds.
set -u
cd /root/repo

while [ ! -f /tmp/r3_qa_done ] || [ ! -f /tmp/r3_qb_done ] || [ ! -f /tmp/r3_al1d_done ]; do
  sleep 120
done

timeout 5400 python benchmarks/bench_tasks.py > /tmp/bench_tasks_r3.log 2>&1
touch /tmp/r3_bench_done

timeout 3600 python benchmarks/bench_rollout_knobs.py > /tmp/bench_knobs_r3.log 2>&1

# training-seed variance at the 5k operating point (seeds 8, 9, 10)
timeout 3600 python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 \
  task.n_query_init=200 task.lengthscale_lower=0.1 task.lengthscale_upper=2.0 \
  task.design_scale=5 gamma=1 min_T=30 T=30 max_epoch=5000 \
  burning_epoch=1000 seed=10 dtype=bfloat16 checkpoint=2500 verbose=1000 \
  file_name=aline.pth output_dir=outputs/al1d_seed10 > /tmp/al1d_seed10.log 2>&1
for s in 8 9 10; do
  timeout 3600 python scripts/eval_al.py outputs/al1d_seed$s \
    --file-name aline --batch-size 200 --T 30 --n-query 500 \
    --mask data --seeds 0 > /tmp/eval_al1d_seed$s.log 2>&1
done
touch /tmp/r3_qd_done
