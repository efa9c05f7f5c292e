#!/usr/bin/env python3
"""Restore a preserved checkpoints/ snapshot back into an outputs/ run dir.

Inverse of scripts/preserve_models.py: after a host reset wipes outputs/,
this recreates the run directory from the committed snapshot so a
``load_checkpoint=true`` training command resumes instead of restarting.

Usage:
    python scripts/restore_run.py SNAPSHOT_NAME RUN_DIR

e.g.  python scripts/restore_run.py al1d_200k outputs/al1d_r4_full

Copies checkpoints/SNAPSHOT_NAME/{config.json, metrics.jsonl, model/,
ckpt*} into RUN_DIR (won't clobber an existing resume ckpt or
metrics.jsonl in RUN_DIR — if the run dir already has one, it is
assumed fresher and kept).
"""
import os
import shutil
import sys


def main():
    snap_name, run_dir = sys.argv[1:3]
    # see preserve_models.py: test override for the repo root
    repo = os.environ.get("ALINE_REPO_ROOT") or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    snap = os.path.join(repo, "checkpoints", snap_name)
    dest = os.path.join(repo, run_dir)
    if not os.path.isdir(snap):
        sys.exit(f"no snapshot at {snap}")
    os.makedirs(dest, exist_ok=True)
    for entry in os.listdir(snap):
        src = os.path.join(snap, entry)
        dst = os.path.join(dest, entry)
        if entry in ("config.json", "metrics.jsonl"):
            # metrics.jsonl carries the full training trajectory; the
            # resumed train appends to it, and the next preserve_models
            # snapshot then keeps the whole 0..N history instead of only
            # the post-restore tail.
            if not os.path.exists(dst):
                shutil.copy2(src, dst)
            continue
        if entry.startswith("ckpt") or entry == "model":
            if os.path.exists(dst):
                print(f"[restore] keep existing {dst} (assumed fresher)")
                continue
            shutil.copytree(src, dst)
            print(f"[restore] {src} -> {dst}")
    print(f"[restore] {snap_name} -> {run_dir} done")


if __name__ == "__main__":
    main()
