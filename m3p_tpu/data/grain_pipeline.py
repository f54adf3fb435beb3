"""Grain-based input pipeline: deterministic, checkpointable, multi-worker.

The production input path (the thread prefetcher in `m3p_tpu.data.pipeline`
remains the lightweight fallback for exotic dataset objects): every dataset
family exposes a random-access row/grid view, Grain handles sharding
(`ShardByJaxProcess`), shuffling, worker processes and batching, and the
resulting iterator state is checkpointable alongside the train state — the
TPU-native replacement for the reference's forked DataLoader workers +
per-rank h5 shard bookkeeping (`dataset_utils.py:51-140`,
`dataset_pretrain.py:210-226`), with the resumability the reference never had.

Determinism contract: record ``key`` -> per-record PRNG
``RandomState(seed * 1000003 + key)``, so any record rebuilds identically
under shuffling, sharding, and mid-epoch resume. That guarantee is
*per-record*; **batch composition** additionally depends on
``worker_count`` (each Grain worker batches its own strided subset of the
record stream and drop_remainder applies per worker), so batch-level
reproducibility holds only for a fixed worker_count — and a checkpointed
iterator state is only restorable into a loader built with the same
worker_count (the Trainer falls back to a fresh iterator otherwise).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import grain.python as gp

from m3p_tpu.data.datasets import (
    CaptionDataset, NoisedStreamDataset, ParallelDataset, PCDataset,
    PretrainDataset, RetrievalDataset, SlideDataset, StreamDataset)


class RowSource(gp.RandomAccessDataSource):
    """Generic random-access source: ``row_fn(rng, index) -> dict`` of
    per-row arrays; Grain's Batch stacks rows into batches."""

    def __init__(self, n: int, seed: int, row_fn: Callable):
        self._n = n
        self._seed = seed
        self._row_fn = row_fn

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, record_key: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(
            (self._seed * 1000003 + record_key) % (2 ** 32))
        return self._row_fn(rng, record_key % self._n)

    def __repr__(self) -> str:
        # stable across processes: Grain validates restored iterator state
        # against repr(data_source)
        return (f"RowSource(n={self._n}, seed={self._seed}, "
                f"row={getattr(self._row_fn, '__qualname__', 'row')})")


class _Flatten(gp.MapTransform):
    """(groups, rows_per_group, ...) stacked grid leaves -> grid-flattened
    (groups * rows, ...) batches (drops the length-1 group dims too)."""

    def map(self, batch):
        return _tree_map_arrays(
            lambda v: v.reshape(-1, *v.shape[2:]), batch)


def _tree_map_arrays(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map_arrays(fn, v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return tuple(_tree_map_arrays(fn, v) for v in tree)
    return fn(tree)


class _PairTuple(gp.MapTransform):
    """{"t2i": ..., "i2t": ...} -> the (t2i, i2t) tuple the Trainer steps."""

    def map(self, batch):
        return (batch["t2i"], batch["i2t"])


# ---------------------------------------------------------------------------
# per-family row builders
# ---------------------------------------------------------------------------


def _grid_pair_source(ds: RetrievalDataset, seed: int,
                      with_clcm: bool = False) -> RowSource:
    """One record = one anchor image's (t2i, i2t) grid pair."""

    def row(rng, i):
        img_id = ds.image_ids[i]
        if isinstance(ds, PretrainDataset):
            t2i = ds.pretrain_batch(rng, [img_id], "t2i")
            i2t = ds.pretrain_batch(rng, [img_id], "i2t",
                                    with_clcm=with_clcm)
        else:
            t2i = ds._grid_batch(rng, [img_id], "t2i")
            i2t = ds._grid_batch(rng, [img_id], "i2t")
        return {"t2i": t2i, "i2t": i2t}

    return RowSource(len(ds.image_ids), seed, row)


def _caption_source(ds: CaptionDataset, seed: int) -> RowSource:
    def row(rng, i):
        img_id, cap = ds.items[i]
        if ds.clager is not None:
            cap = ds.clager.clag(rng, cap, ds.lang)
        from m3p_tpu.data.datasets import _encode_padded

        tokens, lengths, _ = _encode_padded(ds.tokenizer, [cap], ds.max_len)
        r = ds.store.get(ds.store.index_of(img_id))
        feats = r["feats"][None]
        img_len = np.array([r["mask"].sum()], np.int32)
        if ds.region_noise:
            from m3p_tpu.data.span_masking import poisson_region_noise

            feats = poisson_region_noise(rng, feats, img_len)
        return {"tokens": tokens[0], "tgt_len": lengths[0],
                "feats": feats[0], "locs": r["locs"],
                "img_len": img_len[0]}

    return RowSource(len(ds.items), seed, row)


def _slide_source(ds: SlideDataset, seed: int) -> RowSource:
    def row(rng, i):
        img_id, text, label = ds.items[i]
        from m3p_tpu.data.datasets import _encode_padded

        tokens, lengths, _ = _encode_padded(ds.tokenizer, [text], ds.max_len)
        r = ds.store.get(ds.store.index_of(img_id))
        return {"tokens": tokens[0], "text_len": lengths[0],
                "feats": r["feats"], "locs": r["locs"],
                "img_len": np.int32(r["mask"].sum()),
                "labels": np.int32(label)}

    return RowSource(len(ds.items), seed, row)


def _parallel_source(ds: ParallelDataset, seed: int) -> RowSource:
    def row(rng, i):
        from m3p_tpu.data.datasets import _encode_padded

        s_toks, s_len, s_langs = _encode_padded(
            ds.tokenizer, [ds.src_texts[i]], ds.max_len,
            [ds.src_lang_id] if ds.src_lang_id is not None else None)
        t_toks, t_len, t_langs = _encode_padded(
            ds.tokenizer, [ds.tgt_texts[i]], ds.max_len,
            [ds.tgt_lang_id] if ds.tgt_lang_id is not None else None)
        out = {"src_tokens": s_toks[0], "src_len": s_len[0],
               "tgt_tokens": t_toks[0], "tgt_len": t_len[0]}
        if s_langs is not None:
            out["src_langs"] = s_langs[0]
        if t_langs is not None:
            out["tgt_langs"] = t_langs[0]
        if ds.store is not None:
            r = ds.store.get(ds.store.index_of(ds.image_ids[i]))
            out["feats"] = r["feats"]
            out["locs"] = r["locs"]
            out["img_len"] = np.int32(r["mask"].sum())
        return out

    return RowSource(len(ds.src_texts), seed, row)


def _pc_source(ds: PCDataset, seed: int) -> RowSource:
    def row(rng, i):
        from m3p_tpu.data.datasets import _encode_padded
        from m3p_tpu.data.noise import concat_batches

        label = np.int32(rng.rand() < 0.5)
        j = i if label else rng.randint(len(ds.tgt_texts))
        s_toks, s_len, _ = _encode_padded(ds.tokenizer, [ds.src_texts[i]],
                                          ds.max_len)
        t_toks, t_len, _ = _encode_padded(ds.tokenizer, [ds.tgt_texts[j]],
                                          ds.max_len)
        toks, lens, pos, langs = concat_batches(
            s_toks, s_len, ds.src_lang_id, t_toks, t_len, ds.tgt_lang_id)
        width = 2 * ds.max_len - 1
        out_t = np.full((width,), 1, toks.dtype)  # PAD
        out_p = np.zeros((width,), pos.dtype)
        out_l = np.zeros((width,), langs.dtype)
        w = toks.shape[1]
        out_t[:w] = toks[0]
        out_p[:w] = pos[0]
        out_l[:w] = langs[0]
        return {"tokens": out_t, "lengths": lens[0], "positions": out_p,
                "langs": out_l, "labels": label}

    return RowSource(len(ds.src_texts), seed, row)


def _stream_source(ds: StreamDataset, seed: int) -> RowSource:
    transform = getattr(ds, "transform", None)
    lang_id = getattr(ds, "lang_id", None)

    def row(rng, i):
        block = ds.blocks[i]
        batch = {"tokens": block[None],
                 "lengths": np.array([ds.bptt], np.int32)}
        if transform is not None:
            batch = transform(rng, batch, lang_id)
        return {k: v[0] for k, v in batch.items()}

    return RowSource(len(ds.blocks), seed, row)


# ---------------------------------------------------------------------------
# loader construction + iterator state
# ---------------------------------------------------------------------------


def supports_grain(dataset) -> bool:
    return isinstance(dataset, (RetrievalDataset, CaptionDataset,
                                SlideDataset, ParallelDataset, PCDataset,
                                StreamDataset))


def make_grain_loader(
    dataset,
    batch_size: int,
    seed: int = 0,
    epoch: int = 0,
    with_clcm: bool = False,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    shard_by_process: bool = True,
) -> gp.DataLoader:
    """Build the Grain DataLoader for any supported dataset family.

    Grid datasets (retrieval/pretrain/MILD) yield (t2i, i2t) batch tuples of
    BN = batch_size * sample_n rows; row datasets yield plain batch dicts.
    Epoch-shard datasets (`PretrainDataset.update`) switch shards here, like
    the per-epoch iterator rebuild does.
    """
    row_seed = seed * 31 + epoch
    operations: list = []
    if isinstance(dataset, RetrievalDataset):  # incl. Pretrain/MILD
        if isinstance(dataset, PretrainDataset):
            dataset.update(epoch)
        source = _grid_pair_source(dataset, row_seed, with_clcm)
        operations = [gp.Batch(batch_size=batch_size, drop_remainder=True),
                      _Flatten(), _PairTuple()]
    elif isinstance(dataset, CaptionDataset):
        if hasattr(dataset, "update"):   # PretrainCaptionDataset shards
            dataset.update(epoch)
        source = _caption_source(dataset, row_seed)
        operations = [gp.Batch(batch_size=batch_size, drop_remainder=True)]
    elif isinstance(dataset, SlideDataset):
        source = _slide_source(dataset, row_seed)
        operations = [gp.Batch(batch_size=batch_size, drop_remainder=True)]
    elif isinstance(dataset, PCDataset):
        source = _pc_source(dataset, row_seed)
        operations = [gp.Batch(batch_size=batch_size, drop_remainder=True)]
    elif isinstance(dataset, ParallelDataset):
        source = _parallel_source(dataset, row_seed)
        operations = [gp.Batch(batch_size=batch_size, drop_remainder=True)]
    elif isinstance(dataset, StreamDataset):  # incl. NoisedStreamDataset
        source = _stream_source(dataset, row_seed)
        operations = [gp.Batch(batch_size=batch_size, drop_remainder=True)]
    else:
        raise TypeError(f"no grain source for {type(dataset).__name__}")

    # drop_remainder applies PER WORKER (each worker batches its strided
    # record subset): with too many workers a small dataset yields ZERO
    # batches (e.g. 8 records / 4 workers / batch 4).  Cap workers so each
    # can fill at least one batch — from the PER-PROCESS record count:
    # ShardByJaxProcess splits `source` across hosts BEFORE workers stride
    # it, so a 16-record shard on 4 processes feeds each worker pool only
    # 4 records (found by the 4-process multi-host test, which got zero
    # batches at worker_count=4).
    if worker_count > 0:
        import jax

        per_process = len(source) // (jax.process_count()
                                      if shard_by_process else 1)
        worker_count = min(worker_count, per_process // max(batch_size, 1))

    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=(gp.ShardByJaxProcess(drop_remainder=True)
                       if shard_by_process else gp.NoSharding()),
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed + epoch,
    )
    logging.getLogger("m3p_tpu").info(
        "grain loader: %s n=%d bs=%d workers=%d (batch composition is "
        "reproducible only for a fixed worker_count)",
        type(dataset).__name__, len(source), batch_size, worker_count)
    return gp.DataLoader(data_source=source, sampler=sampler,
                         operations=operations, worker_count=worker_count)


def save_loader_state(iterator) -> str:
    """Serialize a PyGrainDatasetIterator's position (resumable input)."""
    state = iterator.get_state()
    return state.decode() if isinstance(state, bytes) else str(state)


def restore_loader_state(iterator, state: str) -> None:
    iterator.set_state(state.encode() if isinstance(state, str) else state)
