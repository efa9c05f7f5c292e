#!/usr/bin/env python3
"""Snapshot trained model parameters into the committed checkpoints/ tree.

outputs/ does not survive host resets (learned the hard way: the round-3
reset destroyed every round-2/3 trained model; only the eval artifacts in
benchmarks/artifacts/ lived on in git). Final param snapshots of this
model are ~450 KB each, so the flagship models belong in git.

Usage:
    python scripts/preserve_models.py RUN_DIR MODEL_NAME DEST_NAME ["note"]

e.g.  python scripts/preserve_models.py outputs/ces_r4_full aline_ces \
          ces_200k "CES full reference budget (200k epochs, bf16)"

Copies outputs/RUN_DIR/model/MODEL_NAME -> checkpoints/DEST_NAME plus the
run's resolved config.json, and appends a line to checkpoints/MANIFEST.md.
Loading a preserved model:
    from aline_tpu.utils.serialization import load_config_and_model
    cfg, model, params = load_config_and_model("checkpoints/ces_200k")
(checkpoints/DEST_NAME is laid out like a run dir: config.json +
model/MODEL_NAME, so the normal loader works unchanged.)
"""
import json
import os
import shutil
import sys
import time


def main():
    run_dir, model_name, dest_name = sys.argv[1:4]
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    # ALINE_REPO_ROOT lets tests exercise the preserve/restore round trip
    # in a throwaway tree instead of the real checkpoints/ + MANIFEST.md.
    repo = os.environ.get("ALINE_REPO_ROOT") or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    src_model = os.path.join(repo, run_dir, "model", model_name)
    src_cfg = os.path.join(repo, run_dir, "config.json")
    # resume checkpoints (params+opt+rng, written every cfg.checkpoint
    # epochs) — the only artifact a deadline-killed train leaves behind.
    # train.py writes model/<name> only on completion.
    ckpts = [d for d in os.listdir(os.path.join(repo, run_dir))
             if d.startswith("ckpt")
             and os.path.isdir(os.path.join(repo, run_dir, d, "tree"))]
    have_model = os.path.isdir(src_model)
    if not have_model and not ckpts:
        sys.exit(f"no model dir at {src_model} and no resume ckpt")
    dest = os.path.join(repo, "checkpoints", dest_name)
    os.makedirs(os.path.join(dest, "model"), exist_ok=True)
    if have_model:
        dst_model = os.path.join(dest, "model", model_name)
        if os.path.exists(dst_model):
            shutil.rmtree(dst_model)
        shutil.copytree(src_model, dst_model)
    for ck in ckpts:
        src_ck = os.path.join(repo, run_dir, ck)
        if have_model and os.path.getmtime(
                os.path.join(src_ck, "tree")) <= os.path.getmtime(
                os.path.join(src_model, "tree")):
            # Final model is at least as fresh; skip the ckpt — and prune
            # any stale ckpt an earlier mid-train preserve left in the
            # snapshot, or a later restore+resume would re-train epochs
            # the snapshot's final model already contains.
            stale = os.path.join(dest, ck)
            if os.path.exists(stale):
                shutil.rmtree(stale)
            continue
        dst_ck = os.path.join(dest, ck)
        if os.path.exists(dst_ck):
            shutil.rmtree(dst_ck)
        shutil.copytree(src_ck, dst_ck)
        note = (note + " " if note else "") + \
            f"[+resume ckpt {ck}; restore into {run_dir}/ to continue]"
    if not have_model:
        note = (note + " " if note else "") + "[NO final model: " \
            "train incomplete — resume ckpt only]"
    if os.path.exists(src_cfg):
        shutil.copy2(src_cfg, os.path.join(dest, "config.json"))
    # training-trajectory evidence (epoch counts, loss/norm series)
    src_metrics = os.path.join(repo, run_dir, "metrics.jsonl")
    if os.path.exists(src_metrics):
        shutil.copy2(src_metrics, os.path.join(dest, "metrics.jsonl"))

    manifest = os.path.join(repo, "checkpoints", "MANIFEST.md")
    header = ("# Preserved trained models\n\n"
              "| name | source run | model file | preserved | note |\n"
              "|---|---|---|---|---|\n")
    lines = []
    if os.path.exists(manifest):
        with open(manifest) as f:
            lines = [ln for ln in f.read().splitlines()
                     if ln.startswith("| ") and
                     not ln.startswith("| name ") and
                     not ln.startswith("|---")]
    # re-preserving a name replaces its row instead of appending a dup
    lines = [ln for ln in lines
             if ln.split("|")[1].strip() != dest_name]
    lines.append(f"| {dest_name} | {run_dir} | {model_name} | "
                 f"{time.strftime('%Y-%m-%d %H:%M')} | {note} |")
    with open(manifest, "w") as f:
        f.write(header)
        f.write("\n".join(lines) + "\n")
    n_bytes = sum(os.path.getsize(os.path.join(d, x))
                  for d, _, xs in os.walk(dest) for x in xs)
    print(f"preserved {run_dir}/model/{model_name} -> checkpoints/"
          f"{dest_name} ({n_bytes / 1024:.0f} KB)")


if __name__ == "__main__":
    main()
