#!/usr/bin/env python3
"""Block until no live train.py process targets the given run dir.

Used by runq lanes that adopt a training process which survived a
session handoff (the runner that launched it was retired, but the train
itself keeps the chip): the lane's first step waits for the adopted
train to exit, then the next step either finds the final model or
checkpoint-resumes it.

Usage:
    python scripts/wait_for_run.py RUN_DIR [--timeout SECONDS]

Exits 0 when no process whose cmdline contains both "train" and
"output_dir=RUN_DIR" remains (or immediately if none exists), and 0 on
timeout too (the caller's next step handles resume-vs-done).
"""
import argparse
import os
import sys
import time


def live_pids(run_dir):
    token = f"output_dir={run_dir}"
    me = os.getpid()
    pids = []
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or int(pid) == me:
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace").replace("\0", " ")
        except OSError:
            continue
        if token in cmd and "train" in cmd and "wait_for_run" not in cmd:
            pids.append(int(pid))
    return pids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--timeout", type=float, default=86400)
    args = ap.parse_args()
    t0 = time.time()
    pids = live_pids(args.run_dir)
    if not pids:
        print(f"[wait_for_run] no live train for {args.run_dir}")
        return
    print(f"[wait_for_run] waiting on {pids} for {args.run_dir}",
          flush=True)
    while time.time() - t0 < args.timeout:
        if not live_pids(args.run_dir):
            print(f"[wait_for_run] train for {args.run_dir} exited "
                  f"after {time.time() - t0:.0f}s", flush=True)
            return
        time.sleep(30)
    print(f"[wait_for_run] timeout after {args.timeout}s; proceeding",
          flush=True)


if __name__ == "__main__":
    main()
