"""Full-grid image-text retrieval evaluation.

The reference scores every (caption, image) pair with a separate joint forward
in a Python loop over bs=1 DataLoader rows with per-rank `.npy` dumps merged
offline (`/root/reference/M3P/src/evaluation/xevaluator.py:1528-1657`).  Here
the grid is restructured TPU-first: pairs are enumerated host-side, packed into
fixed-size chunks, and scored by ONE jitted joint-forward that shards the chunk
over the mesh data axis; the (n_images, n_captions) score matrix assembles on
host and R@k reduces with numpy.

Semantics preserved: the score of a pair is the ITM head's scalar on the
[img; caption] joint encoding; ranking directions and R@1/5/10 + mean recall
match `evaluate_image_retrieval` (`xevaluator.py:1621-1657`).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m3p_tpu.model.transformer import as_variables, lengths_to_mask

logger = logging.getLogger(__name__)


# module-level jit keyed on the (hashable) flax module config so repeated
# retrieval_grid_scores calls reuse the compiled chunk scorer instead of
# recompiling (a fresh jax.jit wrapper per call defeats the jit cache).
# The caption pool and UNIQUE image features live on-device; each chunk ships
# only two small index vectors and gathers its (caption, image) pairs there —
# replicating the 100x2048 region features per pair on host and re-uploading
# them every chunk costs ~0.5 GB/chunk of host->device traffic.
@functools.partial(
    jax.jit, static_argnames=("model", "refine_image", "text_width"))
def _score_chunk(model, params, cap_tokens, cap_len, img_feats, img_locs,
                 img_len, cap_idx, img_idx, refine_image, text_width=None):
    tokens = jnp.take(cap_tokens, cap_idx, axis=0)
    if text_width is not None and text_width < tokens.shape[1]:
        # length-bucketed chunk: every caption in this chunk fits in
        # text_width tokens, so the joint sequence shrinks from R+S to
        # R+text_width (static slice -> one compile per distinct width).
        tokens = tokens[:, :text_width]
    text_len = jnp.take(cap_len, cap_idx, axis=0)
    feats = jnp.take(img_feats, img_idx, axis=0)
    locs = jnp.take(img_locs, img_idx, axis=0)
    ilen = jnp.take(img_len, img_idx, axis=0)
    text_mask = lengths_to_mask(text_len, tokens.shape[1])
    img_mask = lengths_to_mask(ilen, feats.shape[1])
    hidden = model.apply(as_variables(params), tokens, text_mask, feats, locs,
                         img_mask, refine_image, method=model.encode_joint)
    scores = model.apply(as_variables(params), hidden, method=model.itm_score)
    return scores[:, 0].astype(jnp.float32)


def retrieval_grid_scores(
    model,
    params,
    cap_tokens: np.ndarray,     # (n_cap, S)
    cap_len: np.ndarray,        # (n_cap,)
    img_feats: np.ndarray,      # (n_img, R, 2048)
    img_locs: np.ndarray,       # (n_img, R, 5)
    img_len: np.ndarray,        # (n_img,)
    chunk_size: int = 512,
    refine_image: bool = True,
    batch_sharding=None,
    progress: bool = False,
    process_index: int = 0,
    process_count: int = 1,
    length_bucket: bool = False,
    min_bucket: int = 16,
) -> np.ndarray:
    """Score all n_img x n_cap pairs; returns the fp32 score matrix.

    With ``process_count > 1`` each host scores an interleaved subset of the
    pair chunks and the caller merges score matrices by summation (the
    multihost replacement for the reference's per-rank .npy dumps,
    `xevaluator.py:1616-1619`) — unscored entries stay 0.

    ``length_bucket`` groups captions into power-of-two length buckets
    (S, S/2, ... down to ``min_bucket``) and scores each bucket's pairs at
    its own static text width, so short captions don't pay the full padded
    joint-sequence cost.  Exact: padding is fully masked (attention weights
    at padded keys are exactly 0), so scores are identical up to reduction-
    order noise.  One extra compile per distinct width (pool shapes stay
    fixed; the width is a static slice inside the jitted chunk scorer).
    Default OFF: measured on-chip at Multi30K shapes (100-region images,
    8-20-token captions) bucketing LOSES (1327 vs 1662 pairs/s on a 100x500
    grid) — the R=100 image block dominates the joint sequence, so the text
    saving is small while per-bucket tail chunks add padded work.  Enable it
    for text-heavy grids where S is a large share of the joint length.
    """
    n_cap = cap_tokens.shape[0]
    n_img = img_feats.shape[0]
    S = cap_tokens.shape[1]

    # stage the caption pool + unique image features on device ONCE
    cap_tokens_d = jnp.asarray(cap_tokens)
    cap_len_d = jnp.asarray(cap_len)
    img_feats_d = jnp.asarray(img_feats)
    img_locs_d = jnp.asarray(img_locs)
    img_len_d = jnp.asarray(img_len)

    # bucket captions by length: smallest width in {S, S/2, ...} >= length
    widths = [S]
    if length_bucket:
        while widths[-1] % 2 == 0 and widths[-1] // 2 >= max(min_bucket, 2):
            widths.append(widths[-1] // 2)
    cap_w = np.full((n_cap,), S, np.int64)
    for w in widths[1:]:
        cap_w[np.asarray(cap_len) <= w] = w
    # tasks = (width, bucket caption ids, pair-range start); the flat task
    # list is identical on every process, so interleaving by process index
    # partitions the grid disjointly across hosts
    tasks = []
    for w in widths:
        sel = np.where(cap_w == w)[0]
        if sel.size == 0:
            continue
        for start in range(0, n_img * sel.size, chunk_size):
            tasks.append((w, sel, start))
    my_tasks = tasks[process_index::process_count]

    out = np.zeros((n_img, n_cap), np.float32)
    # dispatch every chunk asynchronously, materialize once at the end — a
    # per-chunk host sync would stall the device between chunks
    pending = []
    for w, sel, start in my_tasks:
        idx = np.arange(start, min(start + chunk_size, n_img * sel.size))
        pad = chunk_size - idx.size
        ii = np.concatenate([idx // sel.size, np.zeros(pad, np.int64)])
        ci = sel[np.concatenate([idx % sel.size, np.zeros(pad, np.int64)])]
        s = _score_chunk(model, params, cap_tokens_d, cap_len_d, img_feats_d,
                         img_locs_d, img_len_d,
                         jnp.asarray(ci, jnp.int32),
                         jnp.asarray(ii, jnp.int32),
                         refine_image=refine_image,
                         text_width=(w if w < S else None))
        pending.append((ii[: idx.size], ci[: idx.size], s))
    # materialization is where the wall time goes (each np.asarray blocks on
    # that chunk's device execution), so progress logs here track REAL
    # completion — a full Multi30K-shaped grid is hours of silent device
    # time otherwise.  Time-based throttle: chatty on big grids, silent on
    # the per-epoch monitoring evals.
    t0 = time.perf_counter()
    last_log = t0
    pairs_done = 0
    for k, (ii, ci, s) in enumerate(pending):
        out[ii, ci] = np.asarray(s)[: ii.size]
        pairs_done += ii.size
        now = time.perf_counter()
        if now - last_log >= 60.0:
            rate = pairs_done / max(now - t0, 1e-9)
            left = sum(p[0].size for p in pending[k + 1:])
            logger.info(
                "grid eval: %d/%d chunks, %d pairs scored, %.0f pairs/s, "
                "eta %.1f min", k + 1, len(pending), pairs_done, rate,
                left / max(rate, 1e-9) / 60.0)
            last_log = now
    return out


def merge_process_scores(scores: np.ndarray) -> np.ndarray:
    """Merge per-process partial score matrices (unscored entries are 0) by
    summation across hosts — the multihost replacement for the reference's
    per-rank .npy dumps + offline merge (`xevaluator.py:1616-1619`).
    No-op in single-process runs."""
    if jax.process_count() == 1:
        return scores
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(
        jnp.asarray(scores)).sum(axis=0))


def recall_at_k(
    scores: np.ndarray,          # (n_img, n_cap)
    cap_to_img: np.ndarray,      # (n_cap,) ground-truth image per caption
    ks=(1, 5, 10),
) -> Dict[str, float]:
    """R@k both directions + mean recall (`xevaluator.py:1621-1657`).

    i2t: for each image, rank captions; hit if any gold caption in top-k.
    t2i: for each caption, rank images; hit if the gold image in top-k.
    """
    n_img, n_cap = scores.shape
    out: Dict[str, float] = {}

    # image -> set of gold caption ids
    order_i2t = np.argsort(-scores, axis=1)          # (n_img, n_cap)
    gold_per_img = [np.where(cap_to_img == i)[0] for i in range(n_img)]
    for k in ks:
        hits = 0
        for i in range(n_img):
            topk = order_i2t[i, :k]
            hits += bool(np.isin(topk, gold_per_img[i]).any())
        out[f"i2t_r{k}"] = 100.0 * hits / n_img

    order_t2i = np.argsort(-scores, axis=0)          # (n_img, n_cap) cols
    for k in ks:
        hits = 0
        for c in range(n_cap):
            topk = order_t2i[:k, c]
            hits += bool((topk == cap_to_img[c]).any())
        out[f"t2i_r{k}"] = 100.0 * hits / n_cap

    out["mean_recall"] = float(np.mean(
        [out[f"{d}_r{k}"] for d in ("i2t", "t2i") for k in ks]))
    return out
