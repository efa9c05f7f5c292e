"""End-to-end smoke tests for the round-3 trainer entry scripts.

The continuous-design and DAD trainers produced round-3 headline
results; these tests drive their CLI mains at tiny shapes (the module
internals are covered in test_continuous.py / test_baselines_and_curves)
so a refactor cannot silently break the scripts themselves.
"""
import json
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
if SCRIPTS not in sys.path:
    sys.path.insert(0, SCRIPTS)


@pytest.mark.slow
def test_train_continuous_main_end_to_end(tmp_path):
    import train_continuous

    out_dir = str(tmp_path / "cont")
    argv = ["batch_size=4", "min_T=3", "T=3",
            "max_epoch=4", "burning_epoch=2", "checkpoint=0", "verbose=2",
            "alpha=0", "alpha_pce=1.0", "pce_L=7",
            "eval.EIG=true", "eval.L_final=50", "eval.M_final=4",
            "eval.batch_size_final=4", "eval.T_final=3",
            f"output_dir={out_dir}"]
    train_continuous.main(argv)

    assert os.path.exists(os.path.join(out_dir, "config.json"))
    bounds = np.load(os.path.join(out_dir, "continuous_bounds.npz"))
    assert np.isfinite(float(bounds["pce_mean"]))
    assert np.isfinite(float(bounds["nmc_mean"]))
    # sPCE (lower bound) can exceed sNMC only by Monte-Carlo noise
    assert float(bounds["pce_mean"]) <= float(bounds["nmc_mean"]) + 0.5
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    ms = [l for l in lines if l.get("_type") == "metrics"]
    assert ms and all(np.isfinite(m["loss"]) for m in ms)
    assert all(np.isfinite(m["spce_train"]) for m in ms)


@pytest.mark.slow
def test_train_dad_main_end_to_end(tmp_path):
    import train_dad

    out_dir = str(tmp_path / "dad")
    argv = ["batch_size=4", "T=3", "max_epoch=4", "checkpoint=0",
            "verbose=2", "pce_L=7",
            "eval.EIG=true", "eval.L_final=50", "eval.M_final=4",
            "eval.batch_size_final=4", "eval.T_final=3",
            f"output_dir={out_dir}"]
    train_dad.main(argv)

    bounds = np.load(os.path.join(out_dir, "dad_bounds.npz"))
    assert np.isfinite(float(bounds["pce_mean"]))
    assert np.isfinite(float(bounds["nmc_mean"]))
