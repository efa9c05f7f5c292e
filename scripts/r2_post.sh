#!/bin/bash
# Round-2 post-training evaluations + GP-AL-2D run. Waits on the marker
# files scripts/r2_chain.sh touches after each training completes.
set -u
cd /root/repo

wait_for() { while [ ! -f "$1" ]; do sleep 60; done; }

# Location finding: policy-vs-random bounds at L=1e6 (train.py already
# runs its own final eval at M_final; this adds the random baseline)
wait_for /tmp/r2_loc_done
timeout 2400 python scripts/eval_bed.py outputs/loc_r2_bf16 \
  --file-name aline_loc --L 1000000 --M 400 --batch-size 200 \
  --n-query 2000 --T 30 --with-random-baseline \
  > /tmp/eval_loc_r2.log 2>&1

# CES: policy-vs-random bounds at the headline L=1e7
wait_for /tmp/r2_ces_done
timeout 3600 python scripts/eval_bed.py outputs/ces_r2_bf16 \
  --file-name aline_ces --L 10000000 --M 40 --batch-size 20 \
  --n-query 2000 --T 15 --with-random-baseline \
  > /tmp/eval_ces_r2.log 2>&1

# Psychometric: per-predefined-mask curves
wait_for /tmp/r2_psych_done
timeout 2400 python scripts/eval_psychometric.py outputs/psych_r2_bf16 \
  --file-name aline_psych > /tmp/eval_psych_r2.log 2>&1

# HPO: fixed-BO-initialization test-set protocol
wait_for /tmp/r2_chain_done
timeout 2400 python scripts/eval_hpo.py outputs/hpo_r2_bf16 \
  --file-name aline_hpo --T 30 --n-query 100 --n-target 100 \
  > /tmp/eval_hpo_r2.log 2>&1

# GP-AL-2D at 12k epochs (round 1 stopped at 4k)
timeout 5400 python train.py task=al_mix task.dim_x=2 \
  task.n_target_theta=3 task.n_query_init=200 task.design_scale=5 \
  gamma=1 min_T=50 T=50 max_epoch=12000 burning_epoch=3000 \
  dtype=bfloat16 checkpoint=2000 verbose=1000 file_name=aline_al_2d.pth \
  output_dir=outputs/al2d_r2_bf16 > /tmp/al2d_r2.log 2>&1
timeout 1800 python scripts/eval_al.py outputs/al2d_r2_bf16 \
  --file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 \
  > /tmp/eval_al2d_r2.log 2>&1
touch /tmp/r2_post_done
