#!/bin/bash
# Round-3 training + evaluation chain (VERDICT round-2 items 1,3,5,6,2,10).
# Runs after the GP-AL-2D 50k resume finishes; serial so each step gets a
# mostly-idle chip. Logs under /tmp/*_r3.log, markers /tmp/r3_*_done.
set -u
cd /root/repo

# ---- wait for the GP-AL-2D 50k resume (launched separately) ----------
while ! grep -q "al2d_r3 exit:" /tmp/al2d_r3.log 2>/dev/null; do sleep 60; done

# GP-AL-2D eval: split-mask protocol, 200 problems, 3 eval seeds (item 1+9)
timeout 5400 python scripts/eval_al.py outputs/al2d_r3_bf16 \
  --file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 \
  --mask data --seeds 0,1,2 > /tmp/eval_al2d_r3_data.log 2>&1
timeout 5400 python scripts/eval_al.py outputs/al2d_r3_bf16 \
  --file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 \
  --mask theta --seeds 0,1,2 > /tmp/eval_al2d_r3_theta.log 2>&1
touch /tmp/r3_al2d_done

# ---- CES: resume 80k -> 150k (item 5); built-in final eval at
# M_final=2000 x L=1e7 runs inside train.py (item 3) -------------------
cp -rn outputs/ces_r2_bf16 outputs/ces_r3_bf16 2>/dev/null
timeout 16200 python train.py task=ces lr=1e-3 T=10 task.n_query_init=200 \
  max_epoch=150000 burning_epoch=20000 eval=bed eval.batch_size=500 \
  eval.L_final=10000000 eval.batch_size_final=20 eval.n_query_final=2000 \
  eval.T_final=15 dtype=bfloat16 checkpoint=4000 verbose=2000 \
  load_checkpoint=true file_name=aline_ces.pth \
  output_dir=outputs/ces_r3_bf16 > /tmp/ces_r3.log 2>&1
touch /tmp/r3_ces_done

# CES random baseline at the SAME M=2000 protocol (item 3: protocol parity)
timeout 7200 python scripts/eval_bed.py outputs/ces_r3_bf16 \
  --file-name aline_ces --L 10000000 --M 2000 --batch-size 20 \
  --n-query 2000 --T 15 --with-random-baseline --skip-policy \
  > /tmp/ces_random_m2000.log 2>&1
touch /tmp/r3_ces_random_done

# ---- per-task throughput table on a quiet chip (item 7) --------------
timeout 3600 python benchmarks/bench_tasks.py > /tmp/bench_tasks_r3.log 2>&1
touch /tmp/r3_bench_done

# ---- psychometric 3-mask retrain eval (item 4) -----------------------
while ! grep -q "psych_r3 exit:" /tmp/psych_r3.log 2>/dev/null; do sleep 60; done
timeout 3600 python scripts/eval_psychometric.py outputs/psych_r3_3mask \
  --file-name aline_psych --seeds 0,1,2 > /tmp/eval_psych_r3.log 2>&1
# re-eval the round-2 2-mask run under the same 3-seed protocol (item 9)
timeout 3600 python scripts/eval_psychometric.py outputs/psych_r2_bf16 \
  --file-name aline_psych --seeds 0,1,2 > /tmp/eval_psych_r2_reeval.log 2>&1
touch /tmp/r3_psych_done

# ---- HPO-B: ranger retrain with the calibration fix (item 2) ---------
timeout 7200 python train.py task=hpo min_T=30 T=30 max_epoch=15000 \
  burning_epoch=3000 head.std_min=0.05 dtype=bfloat16 checkpoint=1000 \
  verbose=500 file_name=aline_hpo.pth output_dir=outputs/hpo_r3_calib \
  > /tmp/hpo_r3.log 2>&1
timeout 3600 python scripts/eval_hpo.py outputs/hpo_r3_calib \
  --file-name aline_hpo --T 30 --n-query 100 --n-target 100 \
  --seeds 0,1,2 > /tmp/eval_hpo_r3.log 2>&1
ALINE_PLATFORM= timeout 2400 python scripts/diag_hpo.py outputs/hpo_r3_calib \
  --file-name aline_hpo > /tmp/diag_hpo_r3.log 2>&1
touch /tmp/r3_hpo_ranger_done

# ---- HPO-B: second search space (svm surrogate, item 6) --------------
timeout 7200 python train.py task=hpo task.meta_dataset=svm min_T=30 T=30 \
  max_epoch=15000 burning_epoch=3000 head.std_min=0.05 dtype=bfloat16 \
  checkpoint=1000 verbose=500 file_name=aline_hpo_svm.pth \
  output_dir=outputs/hpo_r3_svm > /tmp/hpo_svm_r3.log 2>&1
timeout 3600 python scripts/eval_hpo.py outputs/hpo_r3_svm \
  --file-name aline_hpo_svm --T 30 --n-query 100 --n-target 100 \
  --seeds 0,1,2 > /tmp/eval_hpo_svm_r3.log 2>&1
touch /tmp/r3_hpo_done

# ---- continuous-design policy on location finding (item 10) ----------
timeout 5400 python scripts/train_continuous.py max_epoch=10000 \
  burning_epoch=2000 verbose=500 dtype=bfloat16 eval.EIG=true \
  eval.L_final=1000000 eval.M_final=400 eval.batch_size_final=200 \
  eval.T_final=30 output_dir=outputs/loc_continuous_r3 \
  > /tmp/cont_r3.log 2>&1
touch /tmp/r3_chain_done
