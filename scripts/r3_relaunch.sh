#!/bin/bash
# Relaunch the round-3 training chain after a session restart killed the
# background jobs (al2d_r3 at 28k/50k, psych_r3 at 36k/40k). All jobs are
# setsid-detached so they survive further restarts.
set -u
cd /root/repo

setsid bash -c 'timeout 21600 python train.py task=al_mix task.dim_x=2 \
  task.n_target_theta=3 task.n_query_init=200 task.design_scale=5 \
  gamma=1 min_T=50 T=50 max_epoch=50000 burning_epoch=3000 \
  dtype=bfloat16 checkpoint=2000 verbose=1000 load_checkpoint=true \
  file_name=aline_al_2d.pth output_dir=outputs/al2d_r3_bf16 \
  >> /tmp/al2d_r3.log 2>&1; echo "al2d_r3 exit: $?" >> /tmp/al2d_r3.log' \
  < /dev/null > /dev/null 2>&1 &
echo $! > /tmp/al2d_r3.pid

setsid bash -c 'timeout 10800 python train.py task=psychometric task.mask_type=[predefined] \
  "task.predefined_masks=[[false,false,true,true],[true,true,false,false],[true,true,true,true]]" \
  "task.predefined_mask_weights=[1,1,1]" min_T=30 T=30 gamma=0.99 \
  max_epoch=40000 burning_epoch=10000 dtype=bfloat16 checkpoint=2000 \
  verbose=1000 load_checkpoint=true file_name=aline_psych.pth \
  output_dir=outputs/psych_r3_3mask \
  >> /tmp/psych_r3.log 2>&1; echo "psych_r3 exit: $?" >> /tmp/psych_r3.log' \
  < /dev/null > /dev/null 2>&1 &
echo $! > /tmp/psych_r3.pid

setsid bash scripts/r3_chain.sh < /dev/null > /tmp/r3_chain_driver.log 2>&1 &
echo $! > /tmp/r3_chain.pid

setsid bash scripts/r3_al1d_extend.sh < /dev/null > /tmp/r3_al1d_driver.log 2>&1 &
echo $! > /tmp/r3_al1d.pid

sleep 2
for f in /tmp/al2d_r3.pid /tmp/psych_r3.pid /tmp/r3_chain.pid /tmp/r3_al1d.pid; do
  p=$(cat $f)
  if kill -0 $p 2>/dev/null; then echo "$f $p alive"; else echo "$f $p DEAD"; fi
done
