"""Config/model persistence + end-to-end train.py smoke test."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aline_tpu.config import GPTaskConfig, parse_overrides
from aline_tpu.utils.serialization import (
    config_from_dict,
    load_config,
    load_config_and_model,
    save_config,
)


def test_config_roundtrip(tmp_path):
    cfg = parse_overrides(["task=al_mix", "task.dim_x=1",
                           "task.n_target_theta=2", "lr=0.002",
                           "eval=bed", "eval.L_final=12345"])
    save_config(cfg, str(tmp_path))
    cfg2 = load_config(str(tmp_path))
    assert isinstance(cfg2.task, GPTaskConfig)
    assert cfg2.task.dim_x == 1
    assert cfg2.lr == 0.002
    assert cfg2.eval.L_final == 12345
    assert cfg2.task.mask_type == ["split"]


def test_config_from_dict_ignores_unknown_keys():
    cfg = config_from_dict({"lr": 0.5, "bogus_key": 1,
                            "task": {"target": "ces", "dim_x": 6}})
    assert cfg.lr == 0.5
    assert cfg.task.target == "ces"


@pytest.mark.slow
def test_train_main_end_to_end(tmp_path):
    """Tiny full training run through the CLI entry, then reload the model
    and verify it produces finite outputs (the load_config_and_model path,
    reference: utils/misc.py:174-241)."""
    import train as train_cli

    out_dir = str(tmp_path / "run")
    argv = ["task=al_mix", "task.dim_x=1", "task.n_target_theta=2",
            "task.n_context_init=1", "task.n_query_init=6",
            "task.n_target_data=4", "batch_size=4", "min_T=3", "T=3",
            "max_epoch=3", "burning_epoch=1", "checkpoint=0", "verbose=2",
            f"output_dir={out_dir}", "file_name=aline.pth"]
    train_cli.main(argv)

    assert os.path.exists(os.path.join(out_dir, "config.json"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert any(l.get("_type") == "metrics" for l in lines)

    import jax
    from aline_tpu.tasks import build_task

    cfg, model, params = load_config_and_model(out_dir, "aline")
    task = build_task(cfg.task)
    batch = task.sample_batch(jax.random.key(1), 3)
    out = model.apply(params, batch, training=False)
    assert np.isfinite(np.asarray(out.design_out.log_prob)).all()
    assert np.isfinite(
        np.asarray(out.posterior_out.mixture_means)).all()
