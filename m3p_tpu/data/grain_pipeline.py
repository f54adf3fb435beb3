"""Grain-based input pipeline: deterministic, checkpointable, prefetched.

The production input path (the thread prefetcher in `m3p_tpu.data.pipeline`
remains the lightweight fallback for exotic dataset objects): every dataset
family exposes a random-access row/grid view, Grain's lazy ``MapDataset``
pipeline handles sharding (per-process slice), shuffling, batching and
background read prefetch, and the resulting iterator state is checkpointable
alongside the train state — the TPU-native replacement for the reference's
forked DataLoader workers + per-rank h5 shard bookkeeping
(`dataset_utils.py:51-140`, `dataset_pretrain.py:210-226`), with the
resumability the reference never had.

Why threads, not worker processes: one record at flagship shapes carries
~3 MB of region features, so Grain's multiprocess workers spend their time
pickling/shm-copying batches back to the parent — measured 7-20x SLOWER
than in-process assembly (36-110 vs 781 joint rows/s at 100 regions,
tools/bench_host_pipeline.py).  The lazy in-process pipeline with
background read threads, measured with REAL tokenization cost in the row
path (a 250k-piece XLM-R-scale vocab through the native trie-Viterbi) at
flagship shapes (100 regions, max_len 64, sample_n 4): 1721 joint rows/s
at 1 read thread, 1824 at 2, 1867 at 4, 948 at 8 (GIL contention) —
2.2-2.4x the chip's 793 rows/s consume rate.  h5py and the big numpy
copies release the GIL, and nothing is serialized.  ``worker_count``
therefore now sizes the READ THREAD pool (1 is usually right; more helps
only when record IO blocks on a real filesystem; >4 hurts).

Determinism contract: record ``key`` -> per-record PRNG
``RandomState(seed * 1000003 + key)``, so any record rebuilds identically
under shuffling, sharding, and mid-epoch resume.  Batch composition is a
pure function of (seed, epoch, process topology) — unlike the legacy
multiprocess path it does NOT depend on the thread count.  Checkpointed
iterator states from the pre-lazy loader are not restorable; the Trainer
falls back to a fresh iterator (losing only mid-epoch position).
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


def _tree_map_arrays(fn, tree):
    if isinstance(tree, dict):
        return {k: _tree_map_arrays(fn, v) for k, v in tree.items()}
    if isinstance(tree, tuple):
        return tuple(_tree_map_arrays(fn, v) for v in tree)
    return fn(tree)


def _grid_batch_fn(rows) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """List of per-anchor {"t2i": grid, "i2t": grid} records -> the
    grid-flattened (t2i, i2t) batch tuple the Trainer steps.  Each record's
    grid leaves already carry the rows_per_group leading dim, so batching is
    a single concatenate per leaf (same layout as stack+reshape)."""
    out = []
    for key in ("t2i", "i2t"):
        out.append({leaf: np.concatenate([r[key][leaf] for r in rows], axis=0)
                    for leaf in rows[0][key]})
    return tuple(out)


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
    worker_count: int = 1,
    shard_by_process: bool = True,
):
    """Build the lazy Grain pipeline for any supported dataset family.

    Grid datasets (retrieval/pretrain/MILD) yield (t2i, i2t) batch tuples of
    BN = batch_size * sample_n rows; row datasets yield plain batch dicts.
    Epoch-shard datasets (`PretrainDataset.update`) switch shards here, like
    the per-epoch iterator rebuild does.

    ``worker_count`` sizes the background READ THREAD pool (records are
    assembled in-process — see the module docstring for why processes lose);
    it does not affect batch composition.  Returns an ``IterDataset`` —
    ``iter()`` it for a checkpointable iterator (get_state/set_state).
    """
    row_seed = seed * 31 + epoch
    batch_fn = None
    if isinstance(dataset, RetrievalDataset):  # incl. Pretrain/MILD
        if isinstance(dataset, PretrainDataset):
            dataset.update(epoch)
        source = _grid_pair_source(dataset, row_seed, with_clcm)
        batch_fn = _grid_batch_fn
    elif isinstance(dataset, CaptionDataset):
        if hasattr(dataset, "update"):   # PretrainCaptionDataset shards
            dataset.update(epoch)
        source = _caption_source(dataset, row_seed)
    elif isinstance(dataset, SlideDataset):
        source = _slide_source(dataset, row_seed)
    elif isinstance(dataset, PCDataset):
        source = _pc_source(dataset, row_seed)
    elif isinstance(dataset, ParallelDataset):
        source = _parallel_source(dataset, row_seed)
    elif isinstance(dataset, StreamDataset):  # incl. NoisedStreamDataset
        source = _stream_source(dataset, row_seed)
    else:
        raise TypeError(f"no grain source for {type(dataset).__name__}")

    md = gp.MapDataset.source(source)
    if shard_by_process:
        import jax

        # strided per-process slice: disjoint, balanced to within one record
        md = md.slice(slice(jax.process_index(), None, jax.process_count()))
    if worker_count > 4:
        # measured cliff (module docstring): read throughput at flagship
        # shapes is 1721/1824/1867/948 rows/s at 1/2/4/8 threads — past 4
        # the GIL contention on row assembly HALVES throughput
        logging.getLogger("m3p_tpu").warning(
            "worker_count=%d read threads is past the measured scaling "
            "cliff (1/2/4/8 threads -> 1721/1824/1867/948 rows/s at "
            "flagship shapes); >4 threads is ~2x SLOWER than 4 — use <=4",
            worker_count)
    md = md.shuffle(seed=seed + epoch)
    md = md.repeat(num_epochs)
    md = md.batch(batch_size, drop_remainder=True, batch_fn=batch_fn)
    logging.getLogger("m3p_tpu").info(
        "grain loader: %s n=%d bs=%d read_threads=%d",
        type(dataset).__name__, len(source), batch_size,
        max(1, worker_count))
    # keep the record prefetch window small: a flagship grid record is ~3 MB
    return md.to_iter_dataset(read_options=gp.ReadOptions(
        num_threads=max(1, worker_count),
        prefetch_buffer_size=min(4 * batch_size, 128)))


def save_loader_state(iterator) -> str:
    """Serialize a grain DatasetIterator's position (resumable input)."""
    import json

    return json.dumps(iterator.get_state())


def restore_loader_state(iterator, state: str) -> None:
    """Seek ``iterator`` to a position saved by `save_loader_state`.

    Raises ValueError on states written by an incompatible loader (e.g. the
    pre-lazy multiprocess format) — the Trainer catches it and falls back to
    a fresh iterator."""
    import json

    try:
        iterator.set_state(json.loads(state) if isinstance(state, str)
                           else state)
    except ValueError:
        raise
    except Exception as e:  # grain raises various types on format mismatch
        raise ValueError(f"loader state not restorable: {e}") from e
