"""Colored console + file logging (reference: utils/logger.py:8-36)."""
from __future__ import annotations

import functools
import logging
import os
import sys
import time

_COLORS = {
    logging.DEBUG: "\x1b[36m",     # cyan
    logging.INFO: "\x1b[32m",      # green
    logging.WARNING: "\x1b[33m",   # yellow
    logging.ERROR: "\x1b[31m",     # red
    logging.CRITICAL: "\x1b[35m",  # magenta
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if color and sys.stderr.isatty() else msg


@functools.lru_cache(maxsize=None)
def create_logger(log_dir: str | None = None, name: str = "aline_tpu",
                  level: int = logging.INFO) -> logging.Logger:
    """Create (and cache) a logger with a colored console handler and an
    optional timestamped file handler under ``log_dir``."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if logger.handlers:
        return logger

    fmt = "[%(asctime)s %(name)s %(levelname)s] %(message)s"
    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(_ColorFormatter(fmt, datefmt="%H:%M:%S"))
    logger.addHandler(console)

    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        fh = logging.FileHandler(os.path.join(log_dir, f"{name}_{stamp}.log"))
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    return logger
