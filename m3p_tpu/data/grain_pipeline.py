"""Grain-based input pipeline: deterministic, checkpointable, multi-worker.

The production path for feeding the TPU (the thread prefetcher in
`m3p_tpu.data.pipeline` remains the lightweight fallback): datasets expose a
random-access item view, Grain handles sharding (`ShardByJaxProcess`),
shuffling, worker processes and batching, and the resulting iterator state is
checkpointable alongside the train state — the TPU-native replacement for the
reference's forked DataLoader workers + per-rank h5 shard bookkeeping
(`dataset_utils.py:51-140`, `dataset_pretrain.py:210-226`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import grain.python as gp

from m3p_tpu.data.datasets import RetrievalDataset


class RetrievalGridSource(gp.RandomAccessDataSource):
    """Random-access view over a RetrievalDataset: item i is image i's
    (t2i, i2t) grid pair built with a per-record PRNG derived from the record
    key — deterministic under shuffling and resumable mid-epoch."""

    def __init__(self, dataset: RetrievalDataset, direction: str = "t2i"):
        self._ds = dataset
        self._direction = direction

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, record_key: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self._ds.seed * 1000003 + record_key)
        img_id = self._ds.image_ids[record_key % len(self._ds.image_ids)]
        batch = self._ds._grid_batch(rng, [img_id], self._direction)
        # one group: strip the group dim so Grain batching stacks groups
        return batch


class _CollateGroups(gp.MapTransform):
    """Flatten the (groups, rows_per_group, ...) leaves Grain's Batch stacks
    into grid-flattened (groups * rows, ...) batches."""

    def map(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {k: v.reshape(-1, *v.shape[2:]) for k, v in batch.items()}


def make_retrieval_loader(
    dataset: RetrievalDataset,
    batch_groups: int,
    direction: str = "t2i",
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
    shard_by_process: bool = True,
) -> gp.DataLoader:
    """Grain DataLoader yielding grid-flattened retrieval batches.

    ``batch_groups`` groups per batch -> BN = batch_groups * sample_n rows.
    """
    source = RetrievalGridSource(dataset, direction)
    sharding = (gp.ShardByJaxProcess(drop_remainder=True)
                if shard_by_process else gp.NoSharding())
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=sharding,
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed,
    )
    operations = [
        gp.Batch(batch_size=batch_groups, drop_remainder=True),
        _CollateGroups(),
    ]
    return gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )


def save_loader_state(iterator) -> bytes:
    """Serialize a PyGrainDatasetIterator's position (resumable input)."""
    return iterator.get_state()


def restore_loader_state(iterator, state: bytes) -> None:
    iterator.set_state(state)
