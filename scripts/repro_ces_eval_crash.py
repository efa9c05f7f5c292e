#!/usr/bin/env python
"""Minimized repro + fix verification for the deterministic TPU-worker
crash in the CES final eval at eval.batch_size_final=100 (round-3
STATUS.md; VERDICT r3 item 3).

Root cause: at B=100, ``compute_eig_from_history`` folded all ~895
contrastive chunks (L=1e7, auto-chunked Lc=11184) in ONE device
execution — a single XLA program doing ~15e9 element-steps that runs for
many minutes, which gets the TPU worker killed ("TPU worker process
crashed or restarted").  The proven-good batch-20 path only did ~3e9 per
execution.  Fix (aline_tpu/eval/eig.py): split the chunk scan into
multiple short executions with the LSE state carried across calls
(bit-identical fold order, tested in tests/test_eig.py).

Usage:
    python scripts/repro_ces_eval_crash.py RUN_DIR [--file-name aline_ces]
        [--mode fixed|unfixed] [--B 100] [--L 10000000]

``--mode unfixed`` restores the old single-execution behavior by raising
the per-call work ceiling to infinity — on the TPU this reproduces the
worker crash; ``--mode fixed`` (default) runs the shipped split path and
must complete.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from aline_tpu.utils.preflight import wait_for_backend
    wait_for_backend()
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--file-name", default="aline_ces")
    ap.add_argument("--mode", choices=["fixed", "unfixed"], default="fixed")
    ap.add_argument("--B", type=int, default=100)
    ap.add_argument("--L", type=int, default=10_000_000)
    ap.add_argument("--n-query", type=int, default=2000)
    ap.add_argument("--T", type=int, default=14)
    args = ap.parse_args()

    import jax
    import numpy as np

    import aline_tpu.eval.eig as eig_mod
    from aline_tpu.eval.eig import eval_boed
    from aline_tpu.tasks import build_task
    from aline_tpu.utils.serialization import load_config_and_model

    if args.mode == "unfixed":
        eig_mod._MAX_ELEMS_PER_CALL = 10**18   # old one-big-scan behavior

    cfg, model, params = load_config_and_model(args.run_dir, args.file_name)
    task = build_task(cfg.task)
    print(f"mode={args.mode} B={args.B} L={args.L} "
          f"ceiling={eig_mod._MAX_ELEMS_PER_CALL:.1e}", flush=True)
    t0 = time.time()
    bounds = eval_boed(model, params, task, args.T, args.L, args.B,
                       args.B, jax.random.key(0), cfg.time_token,
                       stepwise=False, n_query=args.n_query)
    dt = time.time() - t0
    print(f"OK in {dt:.0f}s: sPCE {np.asarray(bounds['pce_mean']):.4f} "
          f"± {np.asarray(bounds['pce_err']):.4f}, "
          f"sNMC {np.asarray(bounds['nmc_mean']):.4f}", flush=True)


if __name__ == "__main__":
    main()
