"""Experiment tracking.

Capability parity with the reference's Weights & Biases integration
(reference: train_aline.py:209-222,157-158,168-169,180-181): per-epoch
scalar series and run metadata.  Writes an append-only ``metrics.jsonl``
in the run directory (always available offline) and mirrors to wandb when
the package is installed and enabled.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

try:
    import wandb as _wandb
except ImportError:  # wandb not installed in this environment
    _wandb = None


class RunTracker:
    def __init__(self, output_dir: str, config: Optional[dict] = None,
                 use_wandb: bool = False, project: str = "aline-tpu",
                 run_name: Optional[str] = None,
                 group: Optional[str] = None):
        os.makedirs(output_dir, exist_ok=True)
        self._path = os.path.join(output_dir, "metrics.jsonl")
        self._f = open(self._path, "a")
        self._t0 = time.time()
        self._wandb_run = None
        if use_wandb and _wandb is not None:
            self._wandb_run = _wandb.init(
                project=project, name=run_name, group=group, config=config,
                dir=output_dir)
        if config is not None:
            self._f.write(json.dumps({"_type": "config",
                                      "config": config}) + "\n")
            self._f.flush()

    def log(self, metrics: Dict[str, float], step: int) -> None:
        rec = {"_type": "metrics", "step": step,
               "time": time.time() - self._t0}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb_run is not None:
            self._wandb_run.log(metrics, step=step)

    def finish(self) -> None:
        self._f.close()
        if self._wandb_run is not None:
            self._wandb_run.finish()
