"""Training statistics and throughput metering.

Replaces the reference per-task loss lists + sentences/s meter
(`xtrainer.py:101-128,254-289`) with a device-async-friendly design: losses are
accumulated as (possibly not-yet-ready) jax scalars and only materialized at
flush time, so the host never blocks the TPU stream mid-interval.
"""

from __future__ import annotations

import collections
import time
from typing import Deque, Dict, List


class SpeedMeter:
    """Tracks sentences/s and words/s over a sliding flush interval."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.t0 = time.time()
        self.n_sentences = 0
        self.n_words = 0

    def update(self, n_sentences: int, n_words: int) -> None:
        self.n_sentences += n_sentences
        self.n_words += n_words

    def rates(self) -> Dict[str, float]:
        dt = max(time.time() - self.t0, 1e-9)
        return {
            "sentences_per_s": self.n_sentences / dt,
            "words_per_s": self.n_words / dt,
        }


class StatsAccumulator:
    """Per-task loss accumulation with deferred host transfer."""

    def __init__(self, maxlen: int = 1000) -> None:
        self._stats: Dict[str, Deque] = collections.defaultdict(
            lambda: collections.deque(maxlen=maxlen))

    def add(self, name: str, value) -> None:
        self._stats[name].append(value)

    def flush(self) -> Dict[str, float]:
        """Materialize pending device scalars and return per-task means."""
        out: Dict[str, float] = {}
        for name, values in self._stats.items():
            if not values:
                continue
            vals: List[float] = [float(v) for v in values]
            out[name] = sum(vals) / len(vals)
            values.clear()
        return out

    def format(self) -> str:
        flushed = self.flush()
        return " || ".join(f"{k}: {v:7.4f}" for k, v in sorted(flushed.items()))
