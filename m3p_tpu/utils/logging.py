"""Experiment logging: single root logger with elapsed-time prefixes and
per-process log files, plus dump-dir management.

Replaces the reference `logger.py` + `utils.py:51-125` (`initialize_exp`,
`get_dump_path`).  Process identity comes from `jax.process_index()` instead of
torch distributed ranks.
"""

from __future__ import annotations

import json
import logging
import os
import random
import string
import sys
import time
from datetime import timedelta
from typing import Optional


class ElapsedFormatter(logging.Formatter):
    """``INFO - 00:01:23 - message`` format (reference `logger.py:13-28`)."""

    def __init__(self) -> None:
        super().__init__()
        self.start_time = time.time()

    def format(self, record: logging.LogRecord) -> str:
        elapsed = timedelta(seconds=round(record.created - self.start_time))
        prefix = f"{record.levelname} - {elapsed} - {time.strftime('%x %X')}"
        message = record.getMessage()
        return f"{prefix} - {message}"


def create_logger(filepath: Optional[str] = None, process_index: int = 0) -> logging.Logger:
    logger = logging.getLogger("m3p_tpu")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    logger.handlers.clear()
    formatter = ElapsedFormatter()
    if filepath is not None:
        if process_index > 0:
            filepath = f"{filepath}-{process_index}"
        fh = logging.FileHandler(filepath, "a")
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    return logger


def get_dump_path(dump_path: str, exp_name: str, exp_id: str = "") -> str:
    """``dump_path/exp_name/exp_id`` with a random id when none is given."""
    assert exp_name
    if not exp_id:
        chars = string.ascii_lowercase + string.digits
        exp_id = "".join(random.choice(chars) for _ in range(10))
    path = os.path.join(dump_path, exp_name, exp_id)
    os.makedirs(path, exist_ok=True)
    return path


def initialize_exp(cfg, process_index: int = 0) -> logging.Logger:
    """Create the dump dir, persist the config, and return the logger."""
    dump = get_dump_path(cfg.dump_path, cfg.exp_name, cfg.exp_id)
    object.__setattr__(cfg, "dump_path", dump) if hasattr(cfg, "__dataclass_fields__") else None
    with open(os.path.join(dump, "params.json"), "w") as f:
        f.write(cfg.to_json() if hasattr(cfg, "to_json") else json.dumps(vars(cfg), default=str))
    logger = create_logger(os.path.join(dump, "train.log"), process_index)
    logger.info("============ Initialized experiment ============")
    logger.info("The experiment will be stored in %s", dump)
    logger.info("Running command: %s", " ".join(sys.argv))
    return logger
