"""Data loading orchestration — the reference `check_data_params`/`load_data`
(`/root/reference/M3P/src/data/loader.py:25-750`) rebuilt around the typed
config.

Builds, from the configured paths and task-step DSLs:
  * train_datasets: {(task, name): dataset} consumed by the Trainer
  * eval_data: the dict consumed by `Evaluator.run_all_evals`

On-disk conventions (reference formats kept where they were sane):
  * captions:   ``<dataset>_path/train.<lang>.pkl`` — pickle dict
                image_id -> [caption, ...]   (`loader.py:275-280`)
  * features:   ``input_fea_dir/<dataset>/train.h5`` reference-layout shards
  * mono text:  ``data_path/train.<lang>.npy`` int32 token stream (produced
                by m3p_tpu.cli.preprocess — replaces the XLM .pth binarizer)
  * parallel:   ``data_path/<split>.<src>-<tgt>.<side>.txt`` plain text
  * bilingual dictionaries for MCT: ``cross_lingual_path/<l1>-<l2>.txt``
Missing files skip their task with a warning instead of crashing, so partial
setups (e.g. text-only pre-training) run as in the reference's conditional
loaders.
"""

from __future__ import annotations

import glob
import logging
import os
import pickle
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from m3p_tpu.config import TrainConfig, parse_steps
from m3p_tpu.data.clag import Clager, load_bilingual_dict
from m3p_tpu.data.datasets import (
    CaptionDataset, ParallelDataset, PretrainDataset, RetrievalDataset,
    SlideDataset, StreamDataset, build_eval_retrieval_arrays)
from m3p_tpu.data.features import RegionFeatureStore

logger = logging.getLogger("m3p_tpu")


@dataclass
class LoadedData:
    train_datasets: Dict[Tuple[str, str], Any] = field(default_factory=dict)
    eval_data: Dict[str, Any] = field(default_factory=dict)
    tokenizer: Any = None


def _load_captions(path: str) -> Optional[Dict[str, List[str]]]:
    if not os.path.exists(path):
        logger.warning("captions not found: %s", path)
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def _load_tokenizer(cfg: TrainConfig):
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer

    if cfg.data.vocab_path and os.path.exists(cfg.data.vocab_path):
        return XLMRTokenizer(cfg.data.vocab_path)
    logger.warning("vocab_path missing (%s) — no tokenizer available",
                   cfg.data.vocab_path)
    return None


def _build_clager(cfg: TrainConfig, paths_root: str) -> Optional[Clager]:
    if not cfg.data.use_mct or not paths_root:
        return None
    lexicon: Dict = {}
    for path in glob.glob(os.path.join(paths_root, "*-*.txt")):
        name = os.path.splitext(os.path.basename(path))[0]
        src, tgt = name.split("-")[:2]
        load_bilingual_dict(path, src, tgt, lexicon)
    if not lexicon:
        return None
    return Clager(lexicon, cfg.data.mct_sent_ratio, cfg.data.mct_word_ratio)


def _dataset_root(cfg: TrainConfig, name: str,
                  overrides: Optional[Dict[str, str]] = None) -> str:
    """Per-dataset root: explicit path flags (--coco_path etc.,
    `train_x.py`) win over data_path/<name>."""
    if overrides and overrides.get(name):
        return overrides[name]
    return os.path.join(cfg.data.data_path, name)


def load_data(cfg: TrainConfig, cross_lingual_path: str = "",
              dataset_paths: Optional[Dict[str, str]] = None) -> LoadedData:
    """``dataset_paths``: optional {name: root} overrides (the reference's
    --coco_path/--flicker_path/--google_path/--sbu_path/--mild_path/
    --slide_path flags)."""
    out = LoadedData()
    tokenizer = _load_tokenizer(cfg)
    out.tokenizer = tokenizer
    if tokenizer is None:
        logger.warning("no tokenizer — returning empty data")
        return out
    clager = _build_clager(cfg, cross_lingual_path
                           or cfg.data.cross_lingual_path)
    langs = list(cfg.lang2id.keys())
    if cfg.ft_all and len(langs) > 1:
        # --ft_all: each data feeder fine-tunes a different language
        # (`loader.py:187-190,444-449`)
        import jax

        langs = [langs[jax.process_index() % len(langs)]]

    # ---- mono text streams (xMLM) -----------------------------------
    for lang, _ in parse_steps(cfg.mlm_steps):
        path = os.path.join(cfg.data.data_path, f"train.{lang}.npy")
        if not os.path.exists(path):
            logger.warning("mono stream missing: %s", path)
            continue
        stream = np.load(path)
        out.train_datasets[("mlm", lang)] = StreamDataset(
            stream, bptt=cfg.data.bptt, seed=cfg.seed)
        valid_path = os.path.join(cfg.data.data_path, f"valid.{lang}.npy")
        if os.path.exists(valid_path):
            ds = StreamDataset(np.load(valid_path), bptt=cfg.data.bptt)
            out.eval_data.setdefault("mlm_batches", []).extend(
                list(ds.epoch_iterator(cfg.data.batch_size))[:8])

    # ---- retrieval / pretraining ------------------------------------
    for name, _mod in parse_steps(cfg.cross_rel_steps):
        root = _dataset_root(cfg, name, dataset_paths)
        h5s = sorted(glob.glob(os.path.join(root, "*.h5")))
        if not h5s:
            logger.warning("no feature shards under %s", root)
            continue
        stores = [RegionFeatureStore(p, cfg.data.max_region_num)
                  for p in h5s]
        lang = langs[0]
        if cfg.is_pretrain:
            caps = []
            for p in h5s:
                cap_path = p.replace(".h5", f".{lang}.pkl")
                caps.append(_load_captions(cap_path) or {})
            out.train_datasets[("rel", name)] = PretrainDataset(
                stores, caps, tokenizer, sample_n=cfg.data.sample_n,
                max_len=cfg.data.max_len, clager=clager, lang=lang,
                seed=cfg.seed)
        elif cfg.is_mild or name == "mild":
            # MILD query-based retrieval: train.<lang>.pkl maps
            # image_id -> [(query, passage), ...]
            from m3p_tpu.data.datasets import MILDDataset

            queries = _load_captions(os.path.join(root, f"train.{lang}.pkl"))
            if queries is None:
                continue
            out.train_datasets[("rel", name)] = MILDDataset(
                queries, stores[0], tokenizer, qp_type=cfg.qp_type,
                lang=lang, sample_n=cfg.data.sample_n,
                max_len=cfg.data.max_len, clager=clager, seed=cfg.seed)
            test_q = _load_captions(os.path.join(root, f"test.{lang}.pkl"))
            if test_q:
                mild_eval = MILDDataset(test_q, stores[0], tokenizer,
                                        qp_type=cfg.qp_type, lang=lang)
                out.eval_data["retrieval_test"] = \
                    build_eval_retrieval_arrays(
                        mild_eval.captions, stores[0], tokenizer,
                        max_len=cfg.data.max_len, caps_per_image=1)
        else:
            cap_path = os.path.join(root, f"train.{lang}.pkl")
            captions = _load_captions(cap_path)
            if captions is None:
                continue
            out.train_datasets[("rel", name)] = RetrievalDataset(
                captions, stores[0], tokenizer, lang=lang,
                sample_n=cfg.data.sample_n, max_len=cfg.data.max_len,
                clager=clager, seed=cfg.seed)
            test_caps = _load_captions(os.path.join(root, f"test.{lang}.pkl"))
            if test_caps:
                out.eval_data["retrieval_test"] = \
                    build_eval_retrieval_arrays(
                        test_caps, stores[0], tokenizer,
                        max_len=cfg.data.max_len)

    # ---- captioning --------------------------------------------------
    for name, _mod in parse_steps(cfg.cross_ic_steps):
        root = _dataset_root(cfg, name, dataset_paths)
        h5s = sorted(glob.glob(os.path.join(root, "*.h5")))
        lang = langs[0]
        captions = _load_captions(os.path.join(root, f"train.{lang}.pkl"))
        if not h5s or captions is None:
            continue
        store = RegionFeatureStore(h5s[0], cfg.data.max_region_num)
        out.train_datasets[("ic", name)] = CaptionDataset(
            captions, store, tokenizer, lang=lang, max_len=cfg.data.max_len,
            clager=clager, seed=cfg.seed)

    # ---- MT / NTG ----------------------------------------------------
    step_groups = [("mt", cfg.cross_mt_steps), ("ntg", cfg.ntg_steps)]
    for kind, steps in step_groups:
        for src, tgt in parse_steps(steps):
            if tgt is None:
                continue
            base = os.path.join(cfg.data.data_path,
                                f"train.{src}-{tgt}")
            src_path, tgt_path = f"{base}.{src}.txt", f"{base}.{tgt}.txt"
            if not (os.path.exists(src_path) and os.path.exists(tgt_path)):
                logger.warning("parallel data missing: %s", base)
                continue
            with open(src_path, encoding="utf-8") as f:
                src_texts = [l.rstrip("\n") for l in f]
            with open(tgt_path, encoding="utf-8") as f:
                tgt_texts = [l.rstrip("\n") for l in f]
            out.train_datasets[(kind, src)] = ParallelDataset(
                src_texts, tgt_texts, tokenizer, max_len=cfg.data.max_len,
                seed=cfg.seed, src_lang_id=cfg.lang2id.get(src),
                tgt_lang_id=cfg.lang2id.get(tgt))

    # ---- slide -------------------------------------------------------
    for name, _mod in parse_steps(cfg.slide_steps):
        root = _dataset_root(cfg, "slide", dataset_paths)
        h5s = sorted(glob.glob(os.path.join(root, "*.h5")))
        items_path = os.path.join(root, "train.tsv")
        if not h5s or not os.path.exists(items_path):
            logger.warning("slide data missing under %s", root)
            continue
        items = []
        with open(items_path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 3:
                    items.append((parts[0], parts[1], int(parts[2])))
        out.train_datasets[("slide", name)] = SlideDataset(
            items, RegionFeatureStore(h5s[0], cfg.data.max_region_num),
            tokenizer, max_len=cfg.data.max_len, seed=cfg.seed)

    logger.info("loaded %d train datasets; eval keys: %s",
                len(out.train_datasets), sorted(out.eval_data.keys()))
    return out
