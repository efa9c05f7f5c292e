from aline_tpu.tasks.base import Batch, Task, select_design
from aline_tpu.tasks.benchmarks import BENCHMARKS, BenchmarkTask
from aline_tpu.tasks.ces import CESTask
from aline_tpu.tasks.gp import GPTask
from aline_tpu.tasks.hpo import HPOB, HPOBHandler, HPOTask
from aline_tpu.tasks.location_finding import HiddenLocation
from aline_tpu.tasks.psychometric import PsychometricTask

_TASK_REGISTRY = {
    "gp": GPTask,
    "location_finding": HiddenLocation,
    "ces": CESTask,
    "psychometric": PsychometricTask,
    "benchmark": BenchmarkTask,
    "hpo": HPOTask,
}


def build_task(task_cfg) -> Task:
    """Instantiate a task from its config (the hydra ``_target_`` equivalent,
    reference: train_aline.py:225)."""
    try:
        cls = _TASK_REGISTRY[task_cfg.target]
    except KeyError:
        raise KeyError(f"unknown task target {task_cfg.target!r}; "
                       f"available: {sorted(_TASK_REGISTRY)}") from None
    return cls(task_cfg)
