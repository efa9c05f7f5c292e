#!/bin/bash
# Round-3 queue B: small-model work (psychometric evals, HPO-B calibration
# retrain + second search space, continuous-design run). Runs in parallel
# with queue A on the time-shared chip.
set -u
cd /root/repo

while ! grep -q "psych_r3 exit:" /tmp/psych_r3.log 2>/dev/null; do sleep 60; done

# psychometric 3-mask retrain eval (item 4) + r2 re-eval at same protocol
timeout 3600 python scripts/eval_psychometric.py outputs/psych_r3_3mask \
  --file-name aline_psych --seeds 0,1,2 > /tmp/eval_psych_r3.log 2>&1
timeout 3600 python scripts/eval_psychometric.py outputs/psych_r2_bf16 \
  --file-name aline_psych --seeds 0,1,2 > /tmp/eval_psych_r2_reeval.log 2>&1
touch /tmp/r3_psych_done

# HPO-B: ranger retrain with the calibration fix (item 2)
timeout 10800 python train.py task=hpo min_T=30 T=30 max_epoch=15000 \
  burning_epoch=3000 head.std_min=0.05 dtype=bfloat16 checkpoint=1000 \
  verbose=500 file_name=aline_hpo.pth output_dir=outputs/hpo_r3_calib \
  > /tmp/hpo_r3.log 2>&1
timeout 3600 python scripts/eval_hpo.py outputs/hpo_r3_calib \
  --file-name aline_hpo --T 30 --n-query 100 --n-target 100 \
  --seeds 0,1,2 > /tmp/eval_hpo_r3.log 2>&1
ALINE_PLATFORM= timeout 2400 python scripts/diag_hpo.py outputs/hpo_r3_calib \
  --file-name aline_hpo > /tmp/diag_hpo_r3.log 2>&1
touch /tmp/r3_hpo_ranger_done

# HPO-B: second search space (svm surrogate, item 6)
timeout 10800 python train.py task=hpo task.meta_dataset=svm min_T=30 T=30 \
  max_epoch=15000 burning_epoch=3000 head.std_min=0.05 dtype=bfloat16 \
  checkpoint=1000 verbose=500 file_name=aline_hpo_svm.pth \
  output_dir=outputs/hpo_r3_svm > /tmp/hpo_svm_r3.log 2>&1
timeout 3600 python scripts/eval_hpo.py outputs/hpo_r3_svm \
  --file-name aline_hpo_svm --T 30 --n-query 100 --n-target 100 \
  --seeds 0,1,2 > /tmp/eval_hpo_svm_r3.log 2>&1
touch /tmp/r3_hpo_done

# continuous-design policy on location finding (item 10)
timeout 7200 python scripts/train_continuous.py max_epoch=10000 \
  burning_epoch=2000 verbose=500 dtype=bfloat16 eval.EIG=true \
  eval.L_final=1000000 eval.M_final=400 eval.batch_size_final=200 \
  eval.T_final=30 output_dir=outputs/loc_continuous_r3 \
  > /tmp/cont_r3.log 2>&1
touch /tmp/r3_cont_done
touch /tmp/r3_qb_done
