"""Input pipeline: background host prefetch with device double-buffering.

TPU-native replacement for the reference's forked DataLoader workers
(`dataset_utils.py:51-140`): a daemon thread drains the dataset iterator and
stages batches onto the device (optionally with a mesh batch sharding) while
the TPU executes the previous step — the host-side h5 reads, tokenization and
collation overlap with accelerator compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def stage_array(x, sharding):
    """Stage one host array onto the device(s).

    Single-host: a plain ``device_put`` (replicated or mesh-sharded).
    Multi-host (``jax.process_count() > 1``): ``x`` is this process's LOCAL
    shard of the global batch (the loaders shard data per process), so the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — a bare device_put of
    per-process values would trip JAX's same-value-everywhere assertion
    (and be semantically wrong).
    """
    if sharding is None:
        return jnp.asarray(x)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(jnp.asarray(x), sharding)


class DevicePrefetcher:
    """Wraps a numpy-batch iterator; yields device-resident batches."""

    def __init__(
        self,
        iterator: Iterator[Dict[str, np.ndarray]],
        buffer_size: int = 2,
        sharding=None,
    ):
        self._iterator = iterator
        self._sharding = sharding
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _stage(self, batch):
        return jax.tree.map(lambda x: stage_array(x, self._sharding), batch)

    def _worker(self) -> None:
        try:
            for batch in self._iterator:
                self._queue.put(self._stage(batch))
        except BaseException as e:  # surface in the consumer thread
            self._error = e
        finally:
            self._queue.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def prefetch_to_device(iterator, buffer_size: int = 2, sharding=None):
    return DevicePrefetcher(iterator, buffer_size, sharding)
