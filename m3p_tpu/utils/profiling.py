"""Profiling / tracing as a first-class subsystem.

The reference only had a wall-clock words/s meter (`xtrainer.py:254-289`,
SURVEY.md §5.1).  Here: a `jax.profiler` trace context plus a step timer that
respects the async dispatch model (syncs on an explicit array, since on some
remote platforms `block_until_ready` can return early).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax
import numpy as np

logger = logging.getLogger("m3p_tpu")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-format device trace (view with xprof/TB)."""
    with jax.profiler.trace(log_dir):
        yield
    logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """Measures steady-state step time; call `sync` with a device scalar from
    the latest step to bound the timed region."""

    def __init__(self) -> None:
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self) -> None:
        self._steps += 1

    def sync(self, device_scalar) -> float:
        """Force completion via host transfer; returns seconds/step."""
        float(device_scalar)
        assert self._t0 is not None and self._steps > 0
        dt = (time.perf_counter() - self._t0) / self._steps
        self.start()
        return dt
