#!/bin/bash
# Round-3 queue A: GP-AL-2D evals then the CES 150k + M=2000 protocol.
# (Split out of r3_chain.sh so the small-model queue B runs in parallel.)
set -u
cd /root/repo

while ! grep -q "al2d_r3 exit:" /tmp/al2d_r3.log 2>/dev/null; do sleep 60; done

# GP-AL-2D eval: split-mask protocol, 200 problems, 3 eval seeds (item 1+9)
timeout 5400 python scripts/eval_al.py outputs/al2d_r3_bf16 \
  --file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 \
  --mask data --seeds 0,1,2 > /tmp/eval_al2d_r3_data.log 2>&1
timeout 5400 python scripts/eval_al.py outputs/al2d_r3_bf16 \
  --file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 \
  --mask theta --seeds 0,1,2 > /tmp/eval_al2d_r3_theta.log 2>&1
touch /tmp/r3_al2d_done

# CES: resume 80k -> 150k (item 5); built-in final eval at M=2000 x L=1e7
# runs inside train.py (item 3)
cp -rn outputs/ces_r2_bf16 outputs/ces_r3_bf16 2>/dev/null
timeout 21600 python train.py task=ces lr=1e-3 T=10 task.n_query_init=200 \
  max_epoch=150000 burning_epoch=20000 eval=bed eval.batch_size=500 \
  eval.L_final=10000000 eval.batch_size_final=20 eval.n_query_final=2000 \
  eval.T_final=15 dtype=bfloat16 checkpoint=4000 verbose=2000 \
  load_checkpoint=true file_name=aline_ces.pth \
  output_dir=outputs/ces_r3_bf16 > /tmp/ces_r3.log 2>&1
touch /tmp/r3_ces_done

# CES random baseline at the SAME M=2000 protocol (item 3: protocol parity)
timeout 14400 python scripts/eval_bed.py outputs/ces_r3_bf16 \
  --file-name aline_ces --L 10000000 --M 2000 --batch-size 20 \
  --n-query 2000 --T 15 --with-random-baseline --skip-policy \
  > /tmp/ces_random_m2000.log 2>&1
touch /tmp/r3_ces_random_done
touch /tmp/r3_qa_done
