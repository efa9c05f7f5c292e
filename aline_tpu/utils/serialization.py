"""Config + model persistence.

Capability parity with the reference's run-directory loading
(reference: utils/misc.py:174-241 ``load_config_and_model``, which
re-composes the saved hydra config and rebuilds the model).  Here the run
config is one JSON file and the parameters are an orbax checkpoint.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax

from aline_tpu.config import (
    BenchmarkTaskConfig,
    CESTaskConfig,
    Config,
    EmbedderConfig,
    EncoderConfig,
    EvalConfig,
    GPTaskConfig,
    HeadConfig,
    HPOTaskConfig,
    LocationFindingConfig,
    PsychometricConfig,
    TaskConfig,
    to_dict,
)

_TASK_CFG_BY_TARGET = {
    "gp": GPTaskConfig,
    "location_finding": LocationFindingConfig,
    "ces": CESTaskConfig,
    "psychometric": PsychometricConfig,
    "benchmark": BenchmarkTaskConfig,
    "hpo": HPOTaskConfig,
}


def _from_dict(cls, d):
    field_types = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in field_types:
            continue
        kwargs[k] = v
    return cls(**kwargs)


def config_from_dict(d: dict) -> Config:
    task_cls = _TASK_CFG_BY_TARGET.get(d.get("task", {}).get("target", ""),
                                       TaskConfig)
    cfg = _from_dict(Config, {k: v for k, v in d.items()
                              if k not in ("task", "encoder", "embedder",
                                           "head", "eval")})
    cfg.task = _from_dict(task_cls, d.get("task", {}))
    cfg.encoder = _from_dict(EncoderConfig, d.get("encoder", {}))
    cfg.embedder = _from_dict(EmbedderConfig, d.get("embedder", {}))
    cfg.head = _from_dict(HeadConfig, d.get("head", {}))
    cfg.eval = _from_dict(EvalConfig, d.get("eval", {}))
    return cfg


def save_config(cfg: Config, output_dir: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "config.json")
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)
    return path


def load_config(run_dir: str) -> Config:
    with open(os.path.join(run_dir, "config.json")) as f:
        return config_from_dict(json.load(f))


def load_config_and_model(run_dir: str, file_name: str = "aline"
                          ) -> Tuple[Config, object, dict]:
    """Load (config, model, params) from a training run directory
    (reference: utils/misc.py:174-241).

    ``file_name`` is the model checkpoint name without extension, as saved
    by train.py under ``<run_dir>/model/<file_name>``.
    """
    import numpy as np

    from aline_tpu.models.aline import build_model
    from aline_tpu.tasks import HPOTask, build_task
    from aline_tpu.train.checkpoint import load_checkpoint

    cfg = load_config(run_dir)
    model = build_model(cfg)
    task = build_task(cfg.task)
    key = jax.random.key(0)
    n_q = min(4, cfg.task.n_query_init)
    if isinstance(task, HPOTask):
        init_batch = task.sample_batch(np.random.default_rng(0), 2,
                                       n_query=n_q)
    else:
        init_batch = task.sample_batch(key, 2, n_query=n_q)
    template = model.init(key, init_batch, training=False)
    ckpt_path = os.path.join(run_dir, "model", file_name.split(".")[0])
    device_state, _ = load_checkpoint(ckpt_path, dict(params=template))
    return cfg, model, device_state["params"]
