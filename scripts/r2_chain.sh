#!/bin/bash
# Round-2 training chain: waits for the GP-AL-1D 60k run, then trains the
# remaining canonical configs at scaled-up budgets (VERDICT round-1 item 3),
# all in bfloat16 (item 4). Logs under /tmp/*_r2.log.
set -u
cd /root/repo

while kill -0 "$(cat /tmp/al1d_r2.pid)" 2>/dev/null; do sleep 60; done

# Location finding 50k (reference README.md:45 recipe, 50% of budget)
timeout 13000 python train.py task=location_finding task.theta_dist=uniform \
  task.n_target_theta=2 task.K=1 lr=1e-3 T=30 task.n_query_init=200 \
  max_epoch=50000 burning_epoch=20000 eval=bed eval.batch_size=1000 \
  eval.L_final=1000000 eval.batch_size_final=200 eval.n_query_final=2000 \
  eval.T_final=35 dtype=bfloat16 checkpoint=2000 verbose=1000 \
  file_name=aline_loc.pth output_dir=outputs/loc_r2_bf16 \
  > /tmp/loc_r2.log 2>&1
touch /tmp/r2_loc_done

# CES 80k (reference README.md:50 recipe, 40% of budget)
timeout 6600 python train.py task=ces lr=1e-3 T=10 task.n_query_init=200 \
  max_epoch=80000 burning_epoch=20000 eval=bed eval.batch_size=500 \
  eval.L_final=10000000 eval.batch_size_final=20 eval.n_query_final=2000 \
  eval.T_final=15 dtype=bfloat16 checkpoint=4000 verbose=2000 \
  file_name=aline_ces.pth output_dir=outputs/ces_r2_bf16 \
  > /tmp/ces_r2.log 2>&1
touch /tmp/r2_ces_done

# Psychometric 40k (reference README.md:55 recipe, 40% of budget)
timeout 6600 python train.py task=psychometric "task.mask_type=[predefined]" \
  min_T=30 T=30 gamma=0.99 max_epoch=40000 burning_epoch=10000 \
  dtype=bfloat16 checkpoint=2000 verbose=1000 \
  file_name=aline_psych.pth output_dir=outputs/psych_r2_bf16 \
  > /tmp/psych_r2.log 2>&1
touch /tmp/r2_psych_done

# HPO-B (surrogate ranger slice) 15k
timeout 5400 python train.py task=hpo min_T=30 T=30 max_epoch=15000 \
  burning_epoch=3000 dtype=bfloat16 checkpoint=1000 verbose=500 \
  file_name=aline_hpo.pth output_dir=outputs/hpo_r2_bf16 \
  > /tmp/hpo_r2.log 2>&1
touch /tmp/r2_chain_done
