from aline_tpu.utils.logging import create_logger
from aline_tpu.utils.metrics import PhaseTimer, Metrics
