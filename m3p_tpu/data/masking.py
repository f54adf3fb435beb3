"""On-device masking transforms for the pre-training objectives.

TPU-native redesign of the reference host-side masking:
  * MLM / MC-MLM 80/10/10 word masking (`xtrainer.py:385-434`,
    `dataset_pretrain.py:231-256`)
  * MC-MRM / MRFR object masking — 15% of regions get features zeroed and the
    region's object class exposed as the label (`dataset_pretrain.py:258-292`)

The reference gathers a *dynamic* number of masked positions per batch, which
is hostile to XLA's static-shape compilation.  Here masking runs inside the
jitted train step with a per-step PRNG key and produces **fixed-size** outputs:
``max_pred`` masked slots per sequence with a weight vector marking real slots
(BERT-TPU convention).  Losses are computed at gathered slots and normalized by
the weight sum, which is numerically equivalent to the reference's mean-over-
masked-positions CE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MaskingConfig:
    word_pred: float = 0.15          # fraction of tokens to predict
    mask_keep_rand: Tuple[float, float, float] = (0.8, 0.1, 0.1)
    obj_mask_ratio: float = 0.15
    max_pred: int = 24               # fixed masked slots per sequence
    n_words: int = 250002
    mask_index: int = 250001
    pad_index: int = 1
    special_boundary: int = 4        # ids < this are never re-sampled as randoms


def _select_fixed(rng: jax.Array, eligible: jax.Array, rate: float,
                  max_pred: int,
                  pos_prob: Optional[jax.Array] = None
                  ) -> Tuple[jax.Array, jax.Array]:
    """Bernoulli(rate) over eligible (B, S) positions, capped at ``max_pred``
    per row and packed into fixed slots.

    ``pos_prob`` (B, S) skews selection: position i is drawn with probability
    ``rate * pos_prob[i] * n_eligible / sum(pos_prob over eligible)`` — the
    frequency-weighted masking of the reference's ``sample_alpha`` path
    (`xtrainer.py:393-402`, scores `fp16_trainer.py:96-98`), expressed as
    independent Bernoulli draws with matched expected count instead of
    without-replacement multinomial (an XLA-friendly, documented deviation).

    Returns (positions (B, P) int32, weights (B, P) float32)."""
    b, s = eligible.shape
    max_pred = min(max_pred, s)  # short sequences: never ask top_k for > s
    r_sel, r_prio = jax.random.split(rng)
    if pos_prob is None:
        p = rate
    else:
        w = jnp.where(eligible, pos_prob.astype(jnp.float32), 0.0)
        n_elig = jnp.sum(eligible)
        p = jnp.clip(rate * w * n_elig / jnp.maximum(jnp.sum(w), 1e-9),
                     0.0, 1.0)
    selected = jnp.logical_and(
        jax.random.uniform(r_sel, (b, s)) < p, eligible)
    # rank selected positions first via a random priority, take top max_pred
    prio = jax.random.uniform(r_prio, (b, s))
    score = jnp.where(selected, 1.0 + prio, prio * 1e-3)
    top_scores, positions = jax.lax.top_k(score, max_pred)
    weights = (top_scores >= 1.0).astype(jnp.float32)
    return positions.astype(jnp.int32), weights


def mask_tokens(
    rng: jax.Array,
    tokens: jax.Array,        # (B, S) int32
    valid_mask: jax.Array,    # (B, S) bool — paddings/specials excluded below
    cfg: MaskingConfig,
    mask_scores: Optional[jax.Array] = None,   # (n_words,) sample_alpha skew
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """80/10/10 MLM masking with fixed prediction slots.

    Returns (masked_tokens (B,S), positions (B,P), labels (B,P),
    weights (B,P)).  Position 0 (BOS) is never masked (`xtrainer.py:406`).
    ``mask_scores`` (``counts**-sample_alpha``) skews selection toward rare
    words (`fp16_trainer.py:96-98`)."""
    b, s = tokens.shape
    r_sel, r_act, r_rand = jax.random.split(rng, 3)

    eligible = jnp.logical_and(valid_mask, tokens != cfg.pad_index)
    eligible = eligible.at[:, 0].set(False)

    pos_prob = None if mask_scores is None else jnp.take(
        mask_scores, jnp.clip(tokens, 0, mask_scores.shape[0] - 1))
    positions, weights = _select_fixed(r_sel, eligible, cfg.word_pred,
                                       cfg.max_pred, pos_prob)
    # never an all-empty mask: if the bernoulli draw selected nothing in the
    # whole batch, force one prediction slot (the reference's
    # ``pred_mask[0,0]=1`` fallback, `xtrainer.py:421-423`) — with a fixed
    # eval seed and small batches an empty draw would otherwise zero the
    # loss for EVERY eval batch
    # elementwise (not .at[0,0] scatter: GSPMD partitions a static-index
    # scatter on a batch-sharded array PER SHARD, corrupting every shard's
    # first row — found by the sharded-vs-local loss parity test)
    none_selected = jnp.sum(weights) == 0
    force = jnp.logical_and(
        none_selected,
        jnp.logical_and(
            (jnp.arange(positions.shape[0]) == 0)[:, None],
            (jnp.arange(positions.shape[1]) == 0)[None, :]))
    positions = jnp.where(force, 1, positions)
    weights = jnp.where(force, 1.0, weights)
    n_pred = positions.shape[1]  # == min(cfg.max_pred, seq_len)
    labels = jnp.take_along_axis(tokens, positions, axis=1)

    p_mask, p_keep, p_rand = cfg.mask_keep_rand
    u = jax.random.uniform(r_act, (b, n_pred))
    rand_words = jax.random.randint(
        r_rand, (b, n_pred), cfg.special_boundary, cfg.n_words)
    replaced = jnp.where(
        u < p_mask, jnp.full_like(labels, cfg.mask_index),
        jnp.where(u < p_mask + p_rand, rand_words, labels))
    # slots with weight 0 keep the original token
    replaced = jnp.where(weights > 0, replaced, labels)

    masked = jax.vmap(lambda t, p, v: t.at[p].set(v))(tokens, positions,
                                                      replaced)
    return masked, positions, labels, weights


def mask_regions(
    rng: jax.Array,
    feats: jax.Array,         # (B, R, 2048) float
    obj_labels: jax.Array,    # (B, R) int32 — Faster-RCNN class per region
    img_mask: jax.Array,      # (B, R) bool
    cfg: MaskingConfig,
    max_pred: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Object masking: zero the features of ~obj_mask_ratio regions.

    Returns (masked_feats (B,R,2048), positions (B,P), labels (B,P),
    weights (B,P), target_feats (B,P,2048)).  Labels/targets feed MC-MRM CE
    and MRFR MSE respectively (`dataset_pretrain.py:258-292`).
    """
    p = max_pred if max_pred is not None else cfg.max_pred
    positions, weights = _select_fixed(rng, img_mask, cfg.obj_mask_ratio, p)
    labels = jnp.take_along_axis(obj_labels, positions, axis=1)
    target_feats = jnp.take_along_axis(feats, positions[..., None], axis=1)

    b, r, _ = feats.shape
    zero_mask = jnp.zeros((b, r), feats.dtype)
    zero_mask = jax.vmap(lambda z, pos, w: z.at[pos].set(w))(
        zero_mask, positions, weights.astype(feats.dtype))
    masked_feats = feats * (1.0 - zero_mask)[..., None]
    return masked_feats, positions, labels, weights, target_feats
