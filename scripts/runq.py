#!/usr/bin/env python3
"""Stall-aware serial queue runner for the round-3 TPU lanes.

The axon TPU tunnel occasionally starves a new client at attach time (the
process sits at ~0% CPU with no log growth forever). This runner executes a
lane of steps serially; each step gets a done-marker (skip on re-run), a
hard timeout, and a watchdog that kills + retries the step when BOTH hold
for `stall` seconds: the step's log stopped growing AND the step's process
tree accrued <5s of CPU. Training steps resume from their checkpoints
(`load_checkpoint=true`), so retries lose at most one checkpoint interval.

Usage: runq.py LANE   (lane specs are defined at the bottom)
"""
import os
import signal
import subprocess
import sys
import time

MARKER_DIR = "/tmp/r3m"
# Unix-ts file that overrides $RUNQ_DEADLINE when present, so a live
# queue's drain time can be tightened/extended between steps (the env of
# a running process is immutable from outside).
DEADLINE_FILE = "/tmp/runq_deadline"


def cpu_seconds(pgid):
    """Total utime+stime (seconds) of all processes in the process group."""
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
            # fields after comm/state: ppid pgrp ... utime=11 stime=12 (0-idx
            # into the post-comm list: state is parts[0])
            if int(parts[2]) != pgid:
                continue
            total += (int(parts[11]) + int(parts[12])) / hz
        except (OSError, IndexError, ValueError):
            continue
    return total


def run_step(name, cmd, timeout, stall=1200, watch=True, retries=3,
             min_room=900):
    marker = os.path.join(MARKER_DIR, f"{name}.done")
    if os.path.exists(marker):
        print(f"[runq] skip {name} (marker exists)", flush=True)
        return
    # RUNQ_DEADLINE (unix ts): drain the queue before the round-end
    # driver benchmark needs a quiet chip. Steps that don't fit are
    # skipped WITHOUT a marker so they resume next round; running steps
    # are capped so they checkpoint-stop in time. Quick must-run steps
    # (model preserves) pass a small min_room so a deadline-killed train
    # still gets its partial weights snapshotted into checkpoints/.
    deadline = float(os.environ.get("RUNQ_DEADLINE", "inf"))
    try:
        with open(DEADLINE_FILE) as f:
            deadline = float(f.read().strip())
    except (OSError, ValueError):
        pass
    remaining = deadline - time.time()
    if remaining < min_room:
        print(f"[runq] skip {name} (deadline: {remaining:.0f}s left)",
              flush=True)
        return
    timeout = min(timeout, max(remaining - min(300, min_room // 3), 60))
    log = f"/tmp/runq_{name}.log"
    status = "failed"
    for attempt in range(retries):
        print(f"[runq] start {name} attempt {attempt}: {cmd}", flush=True)
        with open(log, "a") as lf:
            lf.write(f"\n=== runq {name} attempt {attempt} "
                     f"{time.strftime('%H:%M:%S')} ===\n")
            lf.flush()
            p = subprocess.Popen(cmd, shell=True, stdout=lf, stderr=lf,
                                 start_new_session=True)
        t0 = time.time()
        last_sz = os.path.getsize(log)
        last_cpu = cpu_seconds(p.pid)
        last_progress = time.time()
        stalled = False
        while p.poll() is None:
            time.sleep(30)
            try:
                sz = os.path.getsize(log)
            except OSError:
                sz = last_sz
            cpu = cpu_seconds(p.pid)
            if sz != last_sz or cpu - last_cpu > 5.0:
                last_sz, last_cpu, last_progress = sz, cpu, time.time()
            if watch and time.time() - last_progress > stall:
                print(f"[runq] {name}: STALL (no log growth, "
                      f"{cpu - last_cpu:.1f}s cpu in {stall}s) — killing",
                      flush=True)
                stalled = True
            if time.time() - t0 > timeout:
                print(f"[runq] {name}: TIMEOUT after {timeout}s — killing",
                      flush=True)
                stalled = False  # timeout is final, no retry
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except OSError:
                    pass
                p.wait()
                status = "timeout"
                break
            if stalled:
                try:
                    os.killpg(p.pid, signal.SIGKILL)
                except OSError:
                    pass
                p.wait()
                break
        if stalled:
            print(f"[runq] {name}: retrying after stall", flush=True)
            continue
        if status == "timeout":
            break  # long steps resume from checkpoints; don't re-burn timeout
        rc = p.returncode
        print(f"[runq] {name}: exit {rc}", flush=True)
        if rc == 0:
            status = "ok"
            break
        print(f"[runq] {name}: nonzero exit, retrying", flush=True)
        time.sleep(60)
    if status == "timeout":
        # A (possibly deadline-capped) timeout means the step was cut
        # mid-budget; leave NO marker so a later lane re-runs it (training
        # steps checkpoint-resume). Writing one here would mark partial
        # work as done and let a downstream preserve_* snapshot it.
        print(f"[runq] {name}: timeout — no marker, resumes on re-run",
              flush=True)
        return
    with open(marker, "w") as f:
        f.write(status + "\n")


def wait_for(*markers, timeout=43200):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if all(os.path.exists(os.path.join(MARKER_DIR, m + ".done"))
               for m in markers):
            return
        time.sleep(60)
    print(f"[runq] wait_for {markers} timed out", flush=True)


AL2D_TRAIN = (
    "python train.py task=al_mix task.dim_x=2 task.n_target_theta=3 "
    "task.n_query_init=200 task.design_scale=5 gamma=1 min_T=50 T=50 "
    "max_epoch=50000 burning_epoch=3000 dtype=bfloat16 checkpoint=2000 "
    "verbose=1000 load_checkpoint=true file_name=aline_al_2d.pth "
    "output_dir=outputs/al2d_r3_bf16"
)

LANES = {}

LANES["A"] = lambda: (
    run_step("al2d_train", AL2D_TRAIN, timeout=21600, stall=1500),
    run_step("al2d_eval_data",
             "python scripts/eval_al.py outputs/al2d_r3_bf16 "
             "--file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("al2d_eval_theta",
             "python scripts/eval_al.py outputs/al2d_r3_bf16 "
             "--file-name aline_al_2d --batch-size 200 --T 50 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
    run_step("ces_prep",
             "cp -rn outputs/ces_r2_bf16 outputs/ces_r3_bf16 || true",
             timeout=300, watch=False),
    run_step("ces_train",
             "python train.py task=ces lr=1e-3 T=10 task.n_query_init=200 "
             "max_epoch=150000 burning_epoch=20000 eval=bed "
             "eval.batch_size=500 eval.L_final=10000000 "
             "eval.batch_size_final=20 eval.n_query_final=2000 "
             "eval.T_final=15 dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true file_name=aline_ces.pth "
             "output_dir=outputs/ces_r3_bf16", timeout=21600, stall=3600),
    run_step("ces_random",
             "python scripts/eval_bed.py outputs/ces_r3_bf16 "
             "--file-name aline_ces --L 10000000 --M 2000 --batch-size 20 "
             "--n-query 2000 --T 15 --with-random-baseline --skip-policy",
             timeout=14400, stall=3600),
)

LANES["B"] = lambda: (
    run_step("hpo_train",
             "python train.py task=hpo min_T=30 T=30 max_epoch=15000 "
             "burning_epoch=3000 head.std_min=0.05 dtype=bfloat16 "
             "checkpoint=1000 verbose=500 load_checkpoint=true "
             "file_name=aline_hpo.pth output_dir=outputs/hpo_r3_calib",
             timeout=10800),
    run_step("hpo_eval",
             "python scripts/eval_hpo.py outputs/hpo_r3_calib "
             "--file-name aline_hpo --T 30 --n-query 100 --n-target 100 "
             "--seeds 0,1,2", timeout=3600),
    run_step("hpo_diag",
             "ALINE_PLATFORM= python scripts/diag_hpo.py outputs/hpo_r3_calib "
             "--file-name aline_hpo", timeout=2400),
    run_step("hpo_svm_train",
             "python train.py task=hpo task.meta_dataset=svm min_T=30 T=30 "
             "max_epoch=15000 burning_epoch=3000 head.std_min=0.05 "
             "dtype=bfloat16 checkpoint=1000 verbose=500 "
             "load_checkpoint=true file_name=aline_hpo_svm.pth "
             "output_dir=outputs/hpo_r3_svm", timeout=10800),
    run_step("hpo_svm_eval",
             "python scripts/eval_hpo.py outputs/hpo_r3_svm "
             "--file-name aline_hpo_svm --T 30 --n-query 100 --n-target 100 "
             "--seeds 0,1,2", timeout=3600),
    run_step("cont_train",
             "python scripts/train_continuous.py max_epoch=10000 "
             "burning_epoch=2000 verbose=500 dtype=bfloat16 eval.EIG=true "
             "eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3", timeout=10800),
)

LANES["C"] = lambda: (
    wait_for("al2d_train"),
    run_step("al1d_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=100000 burning_epoch=20000 "
             "dtype=bfloat16 checkpoint=4000 verbose=1000 "
             "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
             "file_name=aline_al_1d.pth output_dir=outputs/al1d_r3_bf16",
             timeout=21600, stall=1500),
    run_step("al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r3_bf16 "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r3_bf16 "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
)

LANES["D"] = lambda: (
    wait_for("ces_random", "cont_train", "al1d_eval_theta"),
    run_step("bench_tasks", "python benchmarks/bench_tasks.py",
             timeout=5400),
    run_step("bench_knobs", "python benchmarks/bench_rollout_knobs.py",
             timeout=3600),
    run_step("seed10_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=5000 burning_epoch=1000 seed=10 "
             "dtype=bfloat16 checkpoint=2500 verbose=1000 "
             "load_checkpoint=true file_name=aline.pth "
             "output_dir=outputs/al1d_seed10", timeout=5400),
    run_step("seed8_eval",
             "python scripts/eval_al.py outputs/al1d_seed8 --file-name aline "
             "--batch-size 200 --T 30 --n-query 500 --mask data --seeds 0",
             timeout=3600),
    run_step("seed9_eval",
             "python scripts/eval_al.py outputs/al1d_seed9 --file-name aline "
             "--batch-size 200 --T 30 --n-query 500 --mask data --seeds 0",
             timeout=3600),
    run_step("seed10_eval",
             "python scripts/eval_al.py outputs/al1d_seed10 --file-name aline "
             "--batch-size 200 --T 30 --n-query 500 --mask data --seeds 0",
             timeout=3600),
)


LANES["F"] = lambda: (
    # continuous-design at 5x budget + a protocol-matched (T=30, M=400,
    # L=1e6) discrete-policy/random eval for a clean 3-way comparison
    run_step("cont50k_train",
             "python scripts/train_continuous.py max_epoch=50000 "
             "burning_epoch=5000 verbose=2000 dtype=bfloat16 eval.EIG=true "
             "eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_50k", timeout=10800,
             stall=1500),
    run_step("disc_t30_eval",
             "python scripts/eval_bed.py outputs/loc_r2_bf16 "
             "--file-name aline_loc --L 1000000 --M 400 --batch-size 200 "
             "--n-query 2000 --T 30 --with-random-baseline", timeout=7200),
)

LANES["G"] = lambda: (
    # continuous-design retrain with the exploration-std clamp (the 50k
    # run's std saturated at e^2; see scripts/diag_continuous.py)
    run_step("cont_clamp_train",
             "python scripts/train_continuous.py max_epoch=30000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 "
             "head.policy_log_std_min=-3.0 head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_clamp", timeout=10800,
             stall=1500),
)

LANES["H"] = lambda: (
    wait_for("cont_clamp_train"),
    # DAD baseline trained natively with the pathwise sPCE objective, on
    # the same location-finding task/protocol as the continuous runs
    run_step("dad_train",
             "python scripts/train_dad.py max_epoch=30000 verbose=1000 "
             "checkpoint=2000 load_checkpoint=true "
             "output_dir=outputs/dad_loc", timeout=10800, stall=1500),
)

LANES["I"] = lambda: (
    wait_for("dad_train"),
    # continuous ALINE head trained with the pathwise sPCE objective
    # (alpha=0: no REINFORCE; predict_loss still trains the posterior)
    run_step("cont_pce_train",
             "python scripts/train_continuous.py max_epoch=30000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=255 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_pce", timeout=10800,
             stall=1500),
)

LANES["J"] = lambda: (
    wait_for("cont_pce_train"),
    # DAD continued to 130k with exploration noise + bigger batch (the
    # 30k deterministic run sat in the constant-trajectory symmetry trap)
    run_step("dad_train2",
             "python scripts/train_dad.py max_epoch=130000 verbose=2000 "
             "checkpoint=4000 load_checkpoint=true batch_size=512 "
             "explore_std=0.2 output_dir=outputs/dad_loc",
             timeout=14400, stall=1500),
)

LANES["K"] = lambda: (
    wait_for("dad_train2"),
    # extend the pathwise-PCE continuous run with a larger contrastive
    # pool: at pce_L=255 the training bound ceiling log(256)=5.55 binds
    # (train sPCE sat at ~5.5 while eval L=1e6 showed 7.48)
    run_step("cont_pce_60k",
             "python scripts/train_continuous.py max_epoch=60000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=2047 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_pce", timeout=14400,
             stall=1800),
)

LANES["L"] = lambda: (
    wait_for("cont_pce_60k"),
    # fresh DAD attempt: strong exploration noise from scratch (the
    # resumed run could not escape the constant-trajectory optimum)
    run_step("dad_fresh",
             "python scripts/train_dad.py max_epoch=60000 verbose=2000 "
             "checkpoint=4000 load_checkpoint=true batch_size=512 "
             "lr=3e-4 explore_std=0.5 output_dir=outputs/dad_loc_v2",
             timeout=10800, stall=1500),
)

LANES["M"] = lambda: (
    wait_for("dad_fresh"),
    # careful pce_L=2047 extension: warm-start from the good 30k params
    # (snapshot), gentle constant-ish lr — the naive resume at cosine-
    # start lr 1e-3 with reset Adam state destroyed the 30k optimum
    run_step("cont_pce_ext",
             "python scripts/train_continuous.py max_epoch=20000 "
             "burning_epoch=0 verbose=1000 checkpoint=2000 "
             "load_path=outputs/snapshots/cont_pce_30k_params "
             "lr=2e-4 dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=2047 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_pce_ext",
             timeout=14400, stall=1800),
)

LANES["N"] = lambda: (
    wait_for("cont_pce_ext"),
    # DAD legs 2+3: continue with annealed exploration noise (0.5 got it
    # out of the symmetry trap: train sPCE 1.0 -> 4.6 over 60k)
    run_step("dad_200k",
             "python scripts/train_dad.py max_epoch=200000 verbose=4000 "
             "checkpoint=8000 load_checkpoint=true batch_size=512 "
             "lr=3e-4 explore_std=0.3 output_dir=outputs/dad_loc_v2",
             timeout=10800, stall=1500),
    run_step("dad_300k",
             "python scripts/train_dad.py max_epoch=300000 verbose=4000 "
             "checkpoint=8000 load_checkpoint=true batch_size=512 "
             "lr=1e-4 explore_std=0.15 output_dir=outputs/dad_loc_v2",
             timeout=10800, stall=1500),
)

LANES["O"] = lambda: (
    wait_for("dad_300k"),
    # pce_L=2047 extension, take 3: warm start + linear lr warmup so the
    # fresh Adam moments cannot jolt the loaded 7.48-sPCE optimum (take 2
    # at constant lr=2e-4 dropped LL 2.38->1.05 in the first 1k epochs)
    run_step("cont_pce_ext2",
             "python scripts/train_continuous.py max_epoch=25000 "
             "burning_epoch=0 verbose=1000 checkpoint=2000 "
             "load_path=outputs/snapshots/cont_pce_30k_params "
             "lr=2e-4 lr_warmup=3000 dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=2047 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_pce_ext2",
             timeout=14400, stall=1800),
)

LANES["P"] = lambda: (
    wait_for("cont_pce_ext2"),
    # final DAD polish: tiny noise + low lr (greedy eval trails the noisy
    # train bound — the mean must take over as noise anneals)
    run_step("dad_polish",
             "python scripts/train_dad.py max_epoch=350000 verbose=4000 "
             "checkpoint=8000 load_checkpoint=true batch_size=512 "
             "lr=5e-5 explore_std=0.05 output_dir=outputs/dad_loc_v2",
             timeout=7200, stall=1500),
)

LANES["Q"] = lambda: (
    run_step("dad_polish2",
             "python scripts/train_dad.py max_epoch=400000 verbose=4000 "
             "checkpoint=8000 load_checkpoint=true batch_size=512 "
             "lr=2e-5 explore_std=0.02 output_dir=outputs/dad_loc_v2",
             timeout=7200, stall=1500),
    # basin-preserving lr for the pce_L=2047 extension: the 7.48 optimum
    # was reached as the cosine annealed to ~0; any lr >= 2e-4 re-heats
    # out of the basin (takes 2 and 3), so stay at 3e-5
    run_step("cont_pce_ext3",
             "python scripts/train_continuous.py max_epoch=20000 "
             "burning_epoch=0 verbose=1000 checkpoint=2000 "
             "load_path=outputs/snapshots/cont_pce_30k_params "
             "lr=3e-5 lr_warmup=2000 dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=2047 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_continuous_r3_pce_ext3",
             timeout=10800, stall=1800),
)

LANES["R"] = lambda: (
    wait_for("cont_pce_ext3"),
    # fresh from-scratch pathwise run with the large contrastive pool and
    # a full cosine anneal (no warm-start hazards); own output dir
    run_step("cont_pce_fresh2047",
             "python scripts/train_continuous.py max_epoch=40000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=2047 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_cont_pce2047_fresh", timeout=14400,
             stall=1800),
    # exact reproduction of the pce_L=255 30k recipe in its own dir (the
    # original's final params were overwritten by a later run sharing the
    # directory); same seed => same stream => same result
    run_step("cont_pce_repro",
             "python scripts/train_continuous.py max_epoch=30000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=255 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_cont_pce255_repro", timeout=10800,
             stall=1800),
)

LANES["S"] = lambda: (
    wait_for("cont_pce_repro"),
    # push the training-bound ceiling past the discrete policy's 8.87:
    # log(8192)=9.01 (the 2047 run's train bound sat at its 7.62 ceiling
    # while eval reached 7.63)
    run_step("cont_pce_8191",
             "python scripts/train_continuous.py max_epoch=50000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=8191 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_cont_pce8191_fresh", timeout=14400,
             stall=1800),
)

def _hpo_space(space):
    """Train + eval one HPO-B surrogate search space (the svm recipe)."""
    run_step(f"hpo_{space}_train",
             f"python train.py task=hpo task.meta_dataset={space} min_T=30 "
             "T=30 max_epoch=15000 burning_epoch=3000 head.std_min=0.05 "
             "dtype=bfloat16 checkpoint=1000 verbose=500 "
             f"load_checkpoint=true file_name=aline_hpo_{space}.pth "
             f"output_dir=outputs/hpo_r3_{space}", timeout=10800)
    run_step(f"hpo_{space}_eval",
             f"python scripts/eval_hpo.py outputs/hpo_r3_{space} "
             f"--file-name aline_hpo_{space} --T 30 --n-query 100 "
             "--n-target 100 --seeds 0,1,2", timeout=3600)


LANES["T"] = lambda: (
    # remaining three HPO-B search spaces (reference: tasks/hpo.py:128
    # lists {ranger, glmnet, svm, rpart, xgboost}; ranger+svm done)
    _hpo_space("glmnet"),
    _hpo_space("rpart"),
    _hpo_space("xgboost"),
)

def _seed_variance(seed):
    """Train + eval one 5k-epoch GP-AL-1D run for the training-seed
    variance study on *final eval* metrics (round-2 VERDICT weak #6).
    The previous stint's seed8/seed9 checkpoints did not survive the
    host reset (outputs/ is not committed), so all three retrain."""
    run_step(f"seed{seed}_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             f"min_T=30 T=30 max_epoch=5000 burning_epoch=1000 seed={seed} "
             "dtype=bfloat16 checkpoint=2500 verbose=1000 "
             "load_checkpoint=true file_name=aline.pth "
             f"output_dir=outputs/al1d_seed{seed}", timeout=5400, stall=1500)
    run_step(f"seed{seed}_eval",
             f"python scripts/eval_al.py outputs/al1d_seed{seed} "
             "--file-name aline --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0", timeout=3600, stall=1500)


LANES["Z"] = lambda: (
    # this session's remainder: bench tables first (they need a quiet
    # host — single core), then the seed-variance study
    run_step("bench_tasks", "python benchmarks/bench_tasks.py",
             timeout=5400, stall=1500),
    run_step("bench_knobs", "python benchmarks/bench_rollout_knobs.py",
             timeout=3600, stall=1500),
    _seed_variance(8),
    _seed_variance(9),
    _seed_variance(10),
)

LANES["U"] = lambda: (
    # full-reference-budget runs for the three cheap configs (the host
    # reset wiped outputs/, so these retrain from scratch — at the
    # measured per-task rates that is ~50-80 min each). train.py runs
    # the full-protocol final eval (M=2000) at training end, producing
    # the artifact-of-record policy bounds; the matched random baselines
    # (ces_r3_random / loc_r3_random) remain valid.
    wait_for("seed10_eval"),
    run_step("ces_full_train",
             # batch_size_final=100 (reference recipe says 20, a GPU-memory
             # workaround; the protocol is (M, L, T, n_query) and outer
             # batching only groups independent rollouts — 5x fewer outer
             # iterations cuts hours off the M=2000 x L=1e7 final eval)
             "python train.py task=ces lr=1e-3 T=10 task.n_query_init=200 "
             "max_epoch=200000 burning_epoch=20000 eval=bed "
             "eval.batch_size=500 eval.L_final=10000000 "
             "eval.batch_size_final=100 eval.n_query_final=2000 "
             "eval.T_final=15 dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true file_name=aline_ces.pth "
             "output_dir=outputs/ces_r4_full", timeout=21600, stall=3600),
    # preserve immediately after each train — outputs/ does not survive
    # host resets, and waiting for all three trains cost us round-2's
    # models once already
    run_step("preserve_ces_full",
             "python scripts/preserve_models.py outputs/ces_r4_full "
             "aline_ces ces_200k 'CES full reference budget (200k, bf16)'",
             timeout=600, watch=False),
    run_step("loc_full_train",
             "python train.py task=location_finding task.theta_dist=uniform "
             "task.n_target_theta=2 task.K=1 lr=1e-3 T=30 "
             "task.n_query_init=200 max_epoch=100000 burning_epoch=20000 "
             "eval=bed eval.batch_size=1000 eval.L_final=1000000 "
             "eval.batch_size_final=200 eval.n_query_final=2000 "
             "eval.T_final=35 dtype=bfloat16 checkpoint=2000 verbose=2000 "
             "load_checkpoint=true file_name=aline_loc.pth "
             "output_dir=outputs/loc_r4_full", timeout=18000, stall=3600),
    run_step("preserve_loc_full",
             "python scripts/preserve_models.py outputs/loc_r4_full "
             "aline_loc loc_100k "
             "'location finding full reference budget (100k, bf16)'",
             timeout=600, watch=False),
    run_step("psych_full_train",
             "python train.py task=psychometric task.mask_type=[predefined] "
             '"task.predefined_masks=[[false,false,true,true],'
             '[true,true,false,false],[true,true,true,true]]" '
             '"task.predefined_mask_weights=[1,1,1]" min_T=30 T=30 '
             "gamma=0.99 max_epoch=100000 burning_epoch=10000 "
             "dtype=bfloat16 checkpoint=2000 verbose=2000 "
             "load_checkpoint=true file_name=aline_psych.pth "
             "output_dir=outputs/psych_r4_full", timeout=10800, stall=1800),
    run_step("preserve_psych_full",
             "python scripts/preserve_models.py outputs/psych_r4_full "
             "aline_psych psych_100k "
             "'psychometric 3-mask full reference budget (100k, bf16)'",
             timeout=600, watch=False),
    run_step("psych_full_eval",
             "python scripts/eval_psychometric.py outputs/psych_r4_full "
             "--file-name aline_psych --seeds 0,1,2", timeout=3600),
    # batch-scaling throughput study (roofline follow-up; ~15 min)
    run_step("bench_batch", "python benchmarks/bench_batch.py",
             timeout=3600),
    # all five reference HPO-B search spaces (ranger+svm already trained)
    _hpo_space("glmnet"),
    _hpo_space("rpart"),
    _hpo_space("xgboost"),
    run_step("preserve_hpo",
             "python scripts/preserve_models.py outputs/hpo_r3_glmnet "
             "aline_hpo_glmnet hpo_glmnet_15k 'HPO-B glmnet surrogate' "
             "&& python scripts/preserve_models.py outputs/hpo_r3_rpart "
             "aline_hpo_rpart hpo_rpart_15k 'HPO-B rpart surrogate' "
             "&& python scripts/preserve_models.py outputs/hpo_r3_xgboost "
             "aline_hpo_xgboost hpo_xgboost_15k 'HPO-B xgboost surrogate'",
             timeout=600, watch=False),
)

LANES["V"] = lambda: (
    # best-effort tail: the flagship GP-AL-1D at the FULL reference
    # budget (200k; reference README.md:35), exact recipe + default seed
    # so it deterministically reproduces the 100k-epoch artifact-of-
    # record trajectory on the way. Runs until the round ends; resumes
    # from its checkpoint next round if outputs/ survives.
    wait_for("preserve_hpo"),
    run_step("al1d_full_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=200000 burning_epoch=20000 "
             "dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
             "file_name=aline_al_1d.pth output_dir=outputs/al1d_r4_full",
             timeout=86400, stall=1800),
)

LANES["E"] = lambda: (
    wait_for("hpo_train"),  # don't add a third client while two trainers run
    run_step("psych_r2_reeval",
             "python scripts/eval_psychometric.py outputs/psych_r2_bf16 "
             "--file-name aline_psych --seeds 0,1,2", timeout=3600),
)

LANES["W"] = lambda: (
    # Round-4 opening lane (written at round-3 close). Assumes a fresh
    # host: /tmp/r3m markers and outputs/ are gone; trained weights live
    # only in the committed checkpoints/ tree (see MANIFEST.md). Fresh
    # r4_* marker names so stale round-3 markers can't suppress steps;
    # load_checkpoint=true is resume-if-present, so re-launching after a
    # mid-train reset loses at most one checkpoint interval.
    # Priorities per round-3 tail triage (STATUS.md):
    #   1. psychometric 3-mask at the full 100k reference budget
    #      (deferred from round 3 for time),
    #   2. whichever of the five HPO-B search spaces lane U didn't
    #      reach before the round-3 drain (markerless skip ⇒ rerun),
    #   3. the flagship GP-AL-1D at the full 200k budget (lane V never
    #      started in round 3 — the chip was busy until the drain).
    # 0. CES 200k final bounds: lane U's train COMPLETED (model preserved
    #    in checkpoints/ces_200k) but the M=2000 x L=1e7 final eval died
    #    to a TPU-worker crash on every retry (marker ces_full_train =
    #    "failed"). Re-running train.py restores at epoch 200000 and
    #    goes straight to eval_boed.
    run_step("r4_ces_final_eval",
             "python train.py task=ces lr=1e-3 T=10 task.n_query_init=200 "
             "max_epoch=200000 burning_epoch=20000 eval=bed "
             "eval.batch_size=500 eval.L_final=10000000 "
             "eval.batch_size_final=100 eval.n_query_final=2000 "
             "eval.T_final=15 dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true file_name=aline_ces.pth "
             "output_dir=outputs/ces_r4_full", timeout=14400, stall=3600),
    run_step("r4_psych_full_train",
             "python train.py task=psychometric task.mask_type=[predefined] "
             '"task.predefined_masks=[[false,false,true,true],'
             '[true,true,false,false],[true,true,true,true]]" '
             '"task.predefined_mask_weights=[1,1,1]" min_T=30 T=30 '
             "gamma=0.99 max_epoch=100000 burning_epoch=10000 "
             "dtype=bfloat16 checkpoint=2000 verbose=2000 "
             "load_checkpoint=true file_name=aline_psych.pth "
             "output_dir=outputs/psych_r4_full", timeout=10800, stall=1800),
    run_step("r4_preserve_psych",
             "python scripts/preserve_models.py outputs/psych_r4_full "
             "aline_psych psych_100k "
             "'psychometric 3-mask full reference budget (100k, bf16)'",
             timeout=600, watch=False),
    run_step("r4_psych_full_eval",
             "python scripts/eval_psychometric.py outputs/psych_r4_full "
             "--file-name aline_psych --seeds 0,1,2", timeout=3600),
    _hpo_space("glmnet"),
    _hpo_space("rpart"),
    _hpo_space("xgboost"),
    run_step("r4_preserve_hpo",
             "python scripts/preserve_models.py outputs/hpo_r3_glmnet "
             "aline_hpo_glmnet hpo_glmnet_15k 'HPO-B glmnet surrogate' "
             "&& python scripts/preserve_models.py outputs/hpo_r3_rpart "
             "aline_hpo_rpart hpo_rpart_15k 'HPO-B rpart surrogate' "
             "&& python scripts/preserve_models.py outputs/hpo_r3_xgboost "
             "aline_hpo_xgboost hpo_xgboost_15k 'HPO-B xgboost surrogate'",
             timeout=600, watch=False),
    run_step("r4_al1d_full_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=200000 burning_epoch=20000 "
             "dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
             "file_name=aline_al_1d.pth output_dir=outputs/al1d_r4_full",
             timeout=86400, stall=1800),
    run_step("r4_preserve_al1d",
             "python scripts/preserve_models.py outputs/al1d_r4_full "
             "aline_al_1d al1d_200k "
             "'GP-AL-1D flagship, full reference budget (200k, bf16)'",
             timeout=600, watch=False),
    run_step("r4_al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("r4_al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
)


LANES["Y"] = lambda: (
    # CES 200k final bounds, attempt 3. train.py-driven eval with
    # batch_size_final=100 crashes the TPU worker deterministically
    # (6/6 attempts, ~3 min into eval_boed — the transient per-chunk
    # working set at B=100 x L_chunk=32768 x n_query=2000 is too much
    # for the worker); round 3's successful protocol used batch 20.
    # The trained model file exists (outputs/ces_r4_full/model), so run
    # the eval directly at the proven batch size.
    run_step("r4_ces_bounds_b20",
             "python scripts/eval_bed.py outputs/ces_r4_full "
             "--file-name aline_ces --L 10000000 --M 2000 --batch-size 20 "
             "--n-query 2000 --T 15", timeout=18000, stall=3600),
)

LANES["X"] = lambda: (
    # Round-3 tail, session 2: HPO-B budget push. The acquisition
    # diagnostic (scripts/diag_hpo_acq.py) shows the policy's picks are
    # near-random w.r.t. the pool variance ordering at 15k epochs (15%
    # of the reference's default 100k recipe, reference:
    # config/train.yaml:11) — and on rpart that costs the LL lead to
    # uncertainty sampling. Extend rpart to 45k (resumes the 15k
    # checkpoint in outputs/hpo_r3_rpart), re-eval, preserve; then
    # restore the lost ranger + svm checkpoints (their round-3 models
    # predate the outputs/ wipe; eval artifacts exist but weights
    # don't). Time-shares the chip with lane W's al1d train.
    wait_for("r4_psych_full_eval"),
    run_step("r4_rpart45k_train",
             "python train.py task=hpo task.meta_dataset=rpart min_T=30 "
             "T=30 max_epoch=45000 burning_epoch=3000 head.std_min=0.05 "
             "dtype=bfloat16 checkpoint=1000 verbose=500 "
             "load_checkpoint=true file_name=aline_hpo_rpart.pth "
             "output_dir=outputs/hpo_r3_rpart", timeout=18000, stall=2400),
    run_step("r4_rpart45k_eval",
             "python scripts/eval_hpo.py outputs/hpo_r3_rpart "
             "--file-name aline_hpo_rpart --T 30 --n-query 100 "
             "--n-target 100 --seeds 0,1,2", timeout=5400),
    run_step("r4_rpart45k_preserve",
             "python scripts/preserve_models.py outputs/hpo_r3_rpart "
             "aline_hpo_rpart hpo_rpart_45k "
             "'HPO-B rpart surrogate, 45k-epoch budget push'",
             timeout=600, watch=False),
    run_step("r4_ranger_train",
             "python train.py task=hpo task.meta_dataset=ranger min_T=30 "
             "T=30 max_epoch=15000 burning_epoch=3000 head.std_min=0.05 "
             "dtype=bfloat16 checkpoint=1000 verbose=500 "
             "load_checkpoint=true file_name=aline_hpo_ranger.pth "
             "output_dir=outputs/hpo_r4_ranger", timeout=10800, stall=2400),
    run_step("r4_ranger_eval",
             "python scripts/eval_hpo.py outputs/hpo_r4_ranger "
             "--file-name aline_hpo_ranger --T 30 --n-query 100 "
             "--n-target 100 --seeds 0,1,2", timeout=5400),
    run_step("r4_ranger_preserve",
             "python scripts/preserve_models.py outputs/hpo_r4_ranger "
             "aline_hpo_ranger hpo_ranger_15k 'HPO-B ranger surrogate'",
             timeout=600, watch=False),
    run_step("r4_svm_train",
             "python train.py task=hpo task.meta_dataset=svm min_T=30 "
             "T=30 max_epoch=15000 burning_epoch=3000 head.std_min=0.05 "
             "dtype=bfloat16 checkpoint=1000 verbose=500 "
             "load_checkpoint=true file_name=aline_hpo_svm.pth "
             "output_dir=outputs/hpo_r4_svm", timeout=10800, stall=2400),
    run_step("r4_svm_eval",
             "python scripts/eval_hpo.py outputs/hpo_r4_svm "
             "--file-name aline_hpo_svm --T 30 --n-query 100 "
             "--n-target 100 --seeds 0,1,2", timeout=5400),
    run_step("r4_svm_preserve",
             "python scripts/preserve_models.py outputs/hpo_r4_svm "
             "aline_hpo_svm hpo_svm_15k 'HPO-B svm surrogate'",
             timeout=600, watch=False),
)


LANES["R4"] = lambda: (
    # Round-4 main lane (relaunched mid-round with the round's own
    # RUNQ_DEADLINE). Serial on purpose: big eval programs (2-min XLA
    # executions) starve a co-running trainer at program granularity, so
    # time-sharing buys nothing here.
    # 1. Flagship GP-AL-1D to the FULL 200k reference budget (VERDICT r3
    #    item 1; reference README.md:35). Resumes outputs/al1d_r4_full.
    run_step("r4_al1d_full_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=200000 burning_epoch=20000 "
             "dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
             "file_name=aline_al_1d.pth output_dir=outputs/al1d_r4_full",
             timeout=86400, stall=1800),
    run_step("r4_preserve_al1d",
             "python scripts/preserve_models.py outputs/al1d_r4_full "
             "aline_al_1d al1d_200k "
             "'GP-AL-1D flagship, full reference budget (200k, bf16)'",
             timeout=600, watch=False, min_room=90),
    run_step("r4_al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("r4_al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
    # 2. CES sNMC bracket-vs-L convergence trend (VERDICT r3 item 7):
    #    single streaming pass with LSE snapshots at L checkpoints, so
    #    the 4-point curve costs one L=3e7 eval; batch 100 exercises the
    #    worker-crash fix at the exact batch size that used to kill the
    #    worker.
    run_step("r4_ces_trend",
             "python scripts/eval_bed_trend.py outputs/ces_r4_full "
             "--file-name aline_ces "
             "--L-checkpoints 1000000,3000000,10000000,30000000 "
             "--M 200 --batch-size 100 --n-query 2000 --T 15",
             timeout=10800, stall=2400),
    # OOD acquisition: the ranger policy on the dataset-shift slice
    # (VERDICT r3 item 8 follow-through; ~15 min)
    run_step("r4_hpo_shift_eval",
             "python scripts/eval_hpo.py checkpoints/hpo_ranger_15k "
             "--file-name aline_hpo_ranger --meta-dataset ranger_shift "
             "--T 30 --n-query 100 --n-target 100 --seeds 0,1,2 "
             "--out-name hpo_shift_curves.npz", timeout=5400),
    # 3. GP-AL-2D toward the 200k reference budget, FROM SCRATCH: the
    #    round-3 50k weights died with a host reset before preserve_models
    #    existed (eval artifacts survive in benchmarks/artifacts/). Burns
    #    whatever chip time remains, checkpoint-resumes next round.
    run_step("r4_al2d_train",
             "python train.py task=al_mix task.dim_x=2 task.n_target_theta=3 "
             "task.n_query_init=200 task.design_scale=5 gamma=1 min_T=50 "
             "T=50 max_epoch=200000 burning_epoch=20000 dtype=bfloat16 "
             "checkpoint=2000 verbose=2000 load_checkpoint=true "
             "file_name=aline_al_2d.pth output_dir=outputs/al2d_r4_full",
             timeout=86400, stall=1800),
    run_step("r4_preserve_al2d",
             "python scripts/preserve_models.py outputs/al2d_r4_full "
             "aline_al_2d al2d_wip "
             "'GP-AL-2D toward 200k; ACTUAL epoch count in metrics.jsonl'",
             timeout=600, watch=False, min_room=90),
)


LANES["R4b"] = lambda: (
    # Round-4 SESSION-2 lane. The host reset wiped outputs/ and the /tmp
    # markers: the al1d 200k flagship restarts from scratch (its 54k
    # resume ckpt and the round-3 100k weights both lived only in
    # outputs/), and every step referencing outputs/ces_r4_full must now
    # read the committed checkpoints/ces_200k snapshot instead.
    # Short checkpoint-based steps land first so an early death still
    # banks them; then the 200k flagship owns the chip.
    # (a) OOD acquisition: ranger policy on the dataset-shift slice
    #     (VERDICT r3 item 8 follow-through; ~15 min)
    run_step("r4_hpo_shift_eval",
             "python scripts/eval_hpo.py checkpoints/hpo_ranger_15k "
             "--file-name aline_hpo_ranger --meta-dataset ranger_shift "
             "--T 30 --n-query 100 --n-target 100 --seeds 0,1,2 "
             "--out-name hpo_shift_curves.npz", timeout=5400),
    # (b) on-TPU validation of the B=100 worker-crash fix at the exact
    #     crashing scale (VERDICT r3 item 3: "passing batch-100 eval"):
    #     one outer chunk of B=M=100 at the full L=1e7.
    run_step("r4_ces_b100_fixcheck",
             "python scripts/repro_ces_eval_crash.py checkpoints/ces_200k "
             "--file-name aline_ces --mode fixed --B 100 --L 10000000",
             timeout=5400, stall=1800),
    # (c) flagship GP-AL-1D to the FULL 200k reference budget (VERDICT
    #     r3 item 1; reference README.md:35), from scratch, default seed
    #     => deterministically reproduces the round-3 100k trajectory on
    #     the way.
    run_step("r4_al1d_full_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=200000 burning_epoch=20000 "
             "dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
             "file_name=aline_al_1d.pth output_dir=outputs/al1d_r4_full",
             timeout=86400, stall=1800),
    run_step("r4_preserve_al1d",
             "python scripts/preserve_models.py outputs/al1d_r4_full "
             "aline_al_1d al1d_200k "
             "'GP-AL-1D flagship, full reference budget (200k, bf16)'",
             timeout=600, watch=False, min_room=90),
    run_step("r4_al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("r4_al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
    # (d) CES sNMC bracket-vs-L convergence trend (VERDICT r3 item 7):
    #     one streaming pass with LSE snapshots; batch 100 re-exercises
    #     the worker-crash fix at trend scale (L=3e7).
    run_step("r4_ces_trend",
             "python scripts/eval_bed_trend.py checkpoints/ces_200k "
             "--file-name aline_ces "
             "--L-checkpoints 1000000,3000000,10000000,30000000 "
             "--M 200 --batch-size 100 --n-query 2000 --T 15",
             timeout=10800, stall=2400),
    # (e) continuous-design policy past its pce_L ceiling (VERDICT r3
    #     item 4): pathwise sPCE at pce_L=8191 (train-bound ceiling
    #     log(8192)=9.01 > the discrete policy's 8.87), full cosine
    #     anneal from scratch like the successful pce_L=2047 run.
    run_step("r4_cont_pce8191",
             "python scripts/train_continuous.py max_epoch=50000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=8191 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_cont_pce8191", timeout=21600,
             stall=1800),
    run_step("r4_preserve_cont8191",
             "python scripts/preserve_models.py outputs/loc_cont_pce8191 "
             "aline_cont cont_pce8191 "
             "'continuous-design loc policy, pathwise sPCE pce_L=8191'",
             timeout=600, watch=False, min_room=90),
    # (f) GP-AL-2D toward the 200k reference budget, from scratch (the
    #     round-3 50k weights died with the same host reset). Burns
    #     whatever chip time remains; checkpoint-resumes later.
    run_step("r4_al2d_train",
             "python train.py task=al_mix task.dim_x=2 task.n_target_theta=3 "
             "task.n_query_init=200 task.design_scale=5 gamma=1 min_T=50 "
             "T=50 max_epoch=200000 burning_epoch=20000 dtype=bfloat16 "
             "checkpoint=2000 verbose=2000 load_checkpoint=true "
             "file_name=aline_al_2d.pth output_dir=outputs/al2d_r4_full",
             timeout=86400, stall=1800),
    run_step("r4_preserve_al2d",
             "python scripts/preserve_models.py outputs/al2d_r4_full "
             "aline_al_2d al2d_wip "
             "'GP-AL-2D toward 200k; ACTUAL epoch count in metrics.jsonl'",
             timeout=600, watch=False, min_room=90),
)


LANES["R5"] = lambda: (
    # Round-5 opening lane (written at the round-4 tail). Assumes a
    # fresh host: /tmp markers and outputs/ gone; trained weights +
    # resume ckpts live in the committed checkpoints/ tree.
    # 1. Finish the flagship GP-AL-1D 200k (round 4 banked ~170k +
    #    resume ckpt in checkpoints/al1d_200k) and run the split-mask
    #    evals (VERDICT r3 item 1).
    run_step("r5_al1d_restore",
             "python scripts/restore_run.py al1d_200k outputs/al1d_r4_full",
             timeout=300, watch=False),
    run_step("r5_al1d_train",
             "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
             "task.n_query_init=200 task.lengthscale_lower=0.1 "
             "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
             "min_T=30 T=30 max_epoch=200000 burning_epoch=20000 "
             "dtype=bfloat16 checkpoint=4000 verbose=2000 "
             "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
             "file_name=aline_al_1d.pth output_dir=outputs/al1d_r4_full",
             timeout=21600, stall=1800),
    run_step("r5_preserve_al1d",
             "python scripts/preserve_models.py outputs/al1d_r4_full "
             "aline_al_1d al1d_200k "
             "'GP-AL-1D flagship, full reference budget (200k, bf16)'",
             timeout=600, watch=False, min_room=90),
    run_step("r5_al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("r5_al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
    run_step("r5_al1d_artifacts",
             "cp outputs/al1d_r4_full/eval/al_curves_data_mask.npz "
             "benchmarks/artifacts/al1d_r4_data_mask.npz && "
             "cp outputs/al1d_r4_full/eval/al_curves_theta_mask.npz "
             "benchmarks/artifacts/al1d_r4_theta_mask.npz && "
             "python scripts/paired_al_stats.py al1d_r4_data_mask.npz "
             "al1d_r4_theta_mask.npz "
             "--out benchmarks/artifacts/al1d_r4_paired_stats.json && "
             "python scripts/make_figures.py", timeout=900, watch=False),
    # 2. CES bracket-vs-L trend at full protocol (VERDICT r3 item 7).
    run_step("r5_ces_trend",
             "python scripts/eval_bed_trend.py checkpoints/ces_200k "
             "--file-name aline_ces "
             "--L-checkpoints 1000000,3000000,10000000,30000000 "
             "--M 200 --batch-size 100 --n-query 2000 --T 15",
             timeout=10800, stall=2400),
    # 3. Continuous policy past the pce_L ceiling (VERDICT r3 item 4).
    #    30k with a full cosine anneal, NOT 50k: round 5 is the last
    #    round, so a COMPLETED run with the final-eval bounds artifact
    #    beats a deadline-cut 50k partial (the pce_L=2047 fresh run
    #    reached its eval ceiling by 30-40k; ceiling here is
    #    log(8192)=9.01, target >=8.0 vs discrete 8.87).
    run_step("r5_cont_pce8191",
             "python scripts/train_continuous.py max_epoch=30000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=8191 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_cont_pce8191", timeout=16200,
             stall=1800),
    run_step("r5_preserve_cont8191",
             "python scripts/preserve_models.py outputs/loc_cont_pce8191 "
             "aline_cont cont_pce8191 "
             "'continuous-design loc policy, pathwise sPCE pce_L=8191'",
             timeout=600, watch=False, min_room=90),
    # 4. GP-AL-2D toward 200k (VERDICT r3 item 1 second half); resumes
    #    checkpoints/al2d_wip if round 4 banked one, else from scratch.
    #    NOTE (round-4 close analysis, STATUS.md): the round-3 50k 2D
    #    weights are lost but their eval artifacts survive
    #    (benchmarks/artifacts/al2d_r3_{data,theta}_mask.npz). A fresh
    #    run only adds evidence past ~50k (~4-5 h at the measured 2D
    #    rate). If the remaining round-5 window is shorter than that,
    #    consider spending it on HPO budget pushes (rpart 15k->45k
    #    showed real acquisition gains) or extra flagship eval seeds
    #    instead.
    run_step("r5_al2d_restore",
             "python scripts/restore_run.py al2d_wip outputs/al2d_r4_full "
             "|| true", timeout=300, watch=False),
    run_step("r5_al2d_train",
             "python train.py task=al_mix task.dim_x=2 task.n_target_theta=3 "
             "task.n_query_init=200 task.design_scale=5 gamma=1 min_T=50 "
             "T=50 max_epoch=200000 burning_epoch=20000 dtype=bfloat16 "
             "checkpoint=2000 verbose=2000 load_checkpoint=true "
             "file_name=aline_al_2d.pth output_dir=outputs/al2d_r4_full",
             timeout=86400, stall=1800),
    run_step("r5_preserve_al2d",
             "python scripts/preserve_models.py outputs/al2d_r4_full "
             "aline_al_2d al2d_wip "
             "'GP-AL-2D toward 200k; ACTUAL epoch count in metrics.jsonl'",
             timeout=600, watch=False, min_room=90),
)


_AL1D_TRAIN = (
    "python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 "
    "task.n_query_init=200 task.lengthscale_lower=0.1 "
    "task.lengthscale_upper=2.0 task.design_scale=5 gamma=1 "
    "min_T=30 T=30 max_epoch=200000 burning_epoch=20000 "
    "dtype=bfloat16 checkpoint=4000 verbose=2000 "
    "load_checkpoint=true checkpoint_name=ckpt_al_1d.tar "
    "file_name=aline_al_1d.pth output_dir=outputs/al1d_r4_full"
)


def _hpo_push(space, run_dir, epochs=45000, min_room_train=12600):
    """From-scratch budget push for one HPO-B search space (VERDICT r4
    item 5: only rpart's lead over random survived pairing at 15k, and
    rpart is the one space that got 45k — test budget on the weak ones).
    From scratch because the completed 15k snapshots hold no resume ckpt
    (preserve_models skips the ckpt when the final model is as fresh).
    Gated on enough room to finish train+eval, else deadline-skips whole.
    """
    run_step(f"r5b_{space}{epochs // 1000}k_train",
             f"python train.py task=hpo task.meta_dataset={space} min_T=30 "
             f"T=30 max_epoch={epochs} burning_epoch=3000 head.std_min=0.05 "
             "dtype=bfloat16 checkpoint=1000 verbose=500 "
             f"load_checkpoint=true file_name=aline_hpo_{space}.pth "
             f"output_dir={run_dir}", timeout=18000, stall=2400,
             min_room=min_room_train)
    run_step(f"r5b_{space}{epochs // 1000}k_preserve",
             f"python scripts/preserve_models.py {run_dir} "
             f"aline_hpo_{space} hpo_{space}_{epochs // 1000}k "
             f"'HPO-B {space} surrogate, {epochs // 1000}k-epoch budget "
             "push'", timeout=600, watch=False, min_room=90)
    run_step(f"r5b_{space}{epochs // 1000}k_eval",
             f"python scripts/eval_hpo.py {run_dir} "
             f"--file-name aline_hpo_{space} --T 30 --n-query 100 "
             "--n-target 100 --seeds 0,1,2", timeout=5400)


LANES["R5b"] = lambda: (
    # Round-5 main lane, adjusted from the pre-written R5: outputs/
    # SURVIVED the round boundary this time and the flagship train is
    # already LIVE (~148k at lane authoring, launched by round-4's runq
    # whose stale 19:03 deadline would have cut it — that runner was
    # killed by PID; the train keeps the chip). Step 1 therefore waits
    # for the adopted train instead of restoring from checkpoints/.
    run_step("r5b_al1d_wait",
             "python scripts/wait_for_run.py outputs/al1d_r4_full "
             "--timeout 14400", timeout=15000, watch=False),
    # Finishes (or crash-resumes) the flagship if the adopted train died
    # short of 200k; no-op when the final model already exists.
    run_step("r5b_al1d_train",
             "test -e outputs/al1d_r4_full/model/aline_al_1d || "
             + _AL1D_TRAIN, timeout=14400, stall=1800),
    run_step("r5b_preserve_al1d",
             "python scripts/preserve_models.py outputs/al1d_r4_full "
             "aline_al_1d al1d_200k "
             "'GP-AL-1D flagship, full reference budget (200k, bf16)'",
             timeout=600, watch=False, min_room=90),
    run_step("r5b_al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("r5b_al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
    run_step("r5b_al1d_artifacts",
             "cp outputs/al1d_r4_full/eval/al_curves_data_mask.npz "
             "benchmarks/artifacts/al1d_r4_data_mask.npz && "
             "cp outputs/al1d_r4_full/eval/al_curves_theta_mask.npz "
             "benchmarks/artifacts/al1d_r4_theta_mask.npz && "
             "python scripts/paired_al_stats.py al1d_r4_data_mask.npz "
             "al1d_r4_theta_mask.npz "
             "--out benchmarks/artifacts/al1d_r4_paired_stats.json && "
             "python scripts/make_figures.py", timeout=900, watch=False,
             min_room=120),
    # CES bracket-vs-L trend at full protocol (VERDICT r3 item 7 / r4
    # item 3): one streaming pass, LSE snapshots at each L checkpoint.
    run_step("r5b_ces_trend",
             "python scripts/eval_bed_trend.py checkpoints/ces_200k "
             "--file-name aline_ces "
             "--L-checkpoints 1000000,3000000,10000000,30000000 "
             "--M 200 --batch-size 100 --n-query 2000 --T 15",
             timeout=10800, stall=2400),
    # Continuous policy past the pce_L ceiling (VERDICT r4 item 4):
    # 30k full cosine anneal at pce_L=8191 (train-bound ceiling
    # log(8192)=9.01), then the T=30/L=1e6/M=400 final bounds eval.
    run_step("r5b_cont_pce8191",
             "python scripts/train_continuous.py max_epoch=30000 "
             "burning_epoch=3000 verbose=1000 checkpoint=2000 "
             "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
             "pce_L=8191 head.policy_log_std_min=-3.0 "
             "head.policy_log_std_max=0.0 "
             "eval.EIG=true eval.L_final=1000000 eval.M_final=400 "
             "eval.batch_size_final=200 eval.T_final=30 "
             "output_dir=outputs/loc_cont_pce8191", timeout=16200,
             stall=1800),
    run_step("r5b_preserve_cont8191",
             "python scripts/preserve_models.py outputs/loc_cont_pce8191 "
             "aline_cont cont_pce8191 "
             "'continuous-design loc policy, pathwise sPCE pce_L=8191'",
             timeout=600, watch=False, min_room=90),
    # HPO-B budget pushes for the two spaces whose paired ΔLL-vs-random
    # CIs straddle 0 (VERDICT r4 item 5). Each gated to only start with
    # room to finish; otherwise README wording covers the 15k state.
    _hpo_push("xgboost", "outputs/hpo_r5_xgboost"),
    _hpo_push("ranger", "outputs/hpo_r5_ranger"),
)

_CONT8191 = (
    "python scripts/train_continuous.py max_epoch=30000 "
    "burning_epoch=3000 verbose=1000 checkpoint=2000 "
    "load_checkpoint=true dtype=bfloat16 alpha=0 alpha_pce=1.0 "
    "pce_L=8191 head.policy_log_std_min=-3.0 "
    "head.policy_log_std_max=0.0 "
    "eval.L_final=1000000 eval.M_final=400 "
    "eval.batch_size_final=200 eval.T_final=30 "
    "output_dir=outputs/loc_cont_pce8191 "
)

LANES["R5c"] = lambda: (
    # Session-2 rework of R5b: the serialized R5b schedule left the
    # pce_L=8191 train (VERDICT r4 item 4, ~3-4 h) starting ~00:30 with
    # a 03:25 deadline kill — no bounds artifact. Changes: (a) the trend
    # runs at M=100 (SE 0.08→0.12, still decisive for a multi-nat gap),
    # buying pce8191 ~45 min; (b) pce8191's train and final eval are
    # separate steps with a preserve between, so a deadline cut keeps
    # the weights and the eval step doubles as finish+eval on a rerun;
    # (c) step 1 waits on the ADOPTED live train (launched by the
    # retired R5b runner) instead of racing it.
    run_step("r5c_al1d_wait",
             "python scripts/wait_for_run.py outputs/al1d_r4_full "
             "--timeout 14400", timeout=15000, watch=False, min_room=60),
    run_step("r5b_al1d_train",
             "test -e outputs/al1d_r4_full/model/aline_al_1d || "
             + _AL1D_TRAIN, timeout=14400, stall=1800),
    run_step("r5b_preserve_al1d",
             "python scripts/preserve_models.py outputs/al1d_r4_full "
             "aline_al_1d al1d_200k "
             "'GP-AL-1D flagship, full reference budget (200k, bf16)'",
             timeout=600, watch=False, min_room=90),
    run_step("r5b_al1d_eval_data",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask data --seeds 0,1,2", timeout=5400),
    run_step("r5b_al1d_eval_theta",
             "python scripts/eval_al.py outputs/al1d_r4_full "
             "--file-name aline_al_1d --batch-size 200 --T 30 --n-query 500 "
             "--mask theta --seeds 0,1,2", timeout=5400),
    run_step("r5b_al1d_artifacts",
             "cp outputs/al1d_r4_full/eval/al_curves_data_mask.npz "
             "benchmarks/artifacts/al1d_r4_data_mask.npz && "
             "cp outputs/al1d_r4_full/eval/al_curves_theta_mask.npz "
             "benchmarks/artifacts/al1d_r4_theta_mask.npz && "
             "python scripts/paired_al_stats.py al1d_r4_data_mask.npz "
             "al1d_r4_theta_mask.npz "
             "--out benchmarks/artifacts/al1d_r4_paired_stats.json && "
             "python scripts/make_figures.py", timeout=900, watch=False,
             min_room=120),
    run_step("r5c_ces_trend",
             "python scripts/eval_bed_trend.py checkpoints/ces_200k "
             "--file-name aline_ces "
             "--L-checkpoints 1000000,3000000,10000000,30000000 "
             "--M 100 --batch-size 100 --n-query 2000 --T 15",
             timeout=7200, stall=2400),
    run_step("r5c_cont8191_train", _CONT8191 + "eval.EIG=false",
             timeout=16200, stall=1800),
    run_step("r5b_preserve_cont8191",
             "python scripts/preserve_models.py outputs/loc_cont_pce8191 "
             "aline_cont cont_pce8191 "
             "'continuous-design loc policy, pathwise sPCE pce_L=8191'",
             timeout=600, watch=False, min_room=90),
    # Resumes at epoch 30000 (or finish-trains a deadline-cut run),
    # then runs the T=30/L=1e6/M=400 bounds eval.
    run_step("r5c_cont8191_eval", _CONT8191 + "eval.EIG=true",
             timeout=7200, stall=2400, min_room=1500),
    _hpo_push("xgboost", "outputs/hpo_r5_xgboost"),
    _hpo_push("ranger", "outputs/hpo_r5_ranger"),
)


def main():
    os.makedirs(MARKER_DIR, exist_ok=True)
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lane = sys.argv[1]
    LANES[lane]()
    open(os.path.join(MARKER_DIR, f"lane{lane}.done"), "w").close()
    print(f"[runq] lane {lane} complete", flush=True)


if __name__ == "__main__":
    main()
