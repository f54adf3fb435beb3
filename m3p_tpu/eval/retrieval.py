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
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from m3p_tpu.model.transformer import as_variables, lengths_to_mask


# module-level jit keyed on the (hashable) flax module config so repeated
# retrieval_grid_scores calls reuse the compiled chunk scorer instead of
# recompiling (a fresh jax.jit wrapper per call defeats the jit cache).
# The caption pool and UNIQUE image features live on-device; each chunk ships
# only two small index vectors and gathers its (caption, image) pairs there —
# replicating the 100x2048 region features per pair on host and re-uploading
# them every chunk costs ~0.5 GB/chunk of host->device traffic.
@functools.partial(jax.jit, static_argnames=("model", "refine_image"))
def _score_chunk(model, params, cap_tokens, cap_len, img_feats, img_locs,
                 img_len, cap_idx, img_idx, refine_image):
    tokens = jnp.take(cap_tokens, cap_idx, axis=0)
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
) -> np.ndarray:
    """Score all n_img x n_cap pairs; returns the fp32 score matrix.

    With ``process_count > 1`` each host scores an interleaved subset of the
    pair chunks and the caller merges score matrices by summation (the
    multihost replacement for the reference's per-rank .npy dumps,
    `xevaluator.py:1616-1619`) — unscored entries stay 0.
    """
    n_cap = cap_tokens.shape[0]
    n_img = img_feats.shape[0]
    n_pairs = n_img * n_cap

    # stage the caption pool + unique image features on device ONCE
    cap_tokens_d = jnp.asarray(cap_tokens)
    cap_len_d = jnp.asarray(cap_len)
    img_feats_d = jnp.asarray(img_feats)
    img_locs_d = jnp.asarray(img_locs)
    img_len_d = jnp.asarray(img_len)

    out = np.zeros((n_pairs,), np.float32)
    all_starts = list(range(0, n_pairs, chunk_size))
    my_starts = all_starts[process_index::process_count]
    # dispatch every chunk asynchronously, materialize once at the end — a
    # per-chunk host sync would stall the device between chunks
    pending = []
    for start in my_starts:
        idx = np.arange(start, min(start + chunk_size, n_pairs))
        pad = chunk_size - idx.size
        ii = np.concatenate([idx // n_cap, np.zeros(pad, np.int64)])
        ci = np.concatenate([idx % n_cap, np.zeros(pad, np.int64)])
        s = _score_chunk(model, params, cap_tokens_d, cap_len_d, img_feats_d,
                         img_locs_d, img_len_d,
                         jnp.asarray(ci, jnp.int32),
                         jnp.asarray(ii, jnp.int32),
                         refine_image=refine_image)
        pending.append((idx, s))
    for idx, s in pending:
        out[idx] = np.asarray(s)[: idx.size]
    return out.reshape(n_img, n_cap)


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
