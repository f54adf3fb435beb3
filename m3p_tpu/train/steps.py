"""Per-objective loss functions and jitted train steps.

Objective parity with the reference XTrainer (`/root/reference/M3P/src/
xtrainer.py:1128-2962`), redesigned as pure functions over static-shape
batches:

  * ``mlm``            — xMLM on text streams (`mlm_step`, :734)
  * ``mct_pretrain``   — the multitask MCT step: ITM + MC-MLM + MC-MRM + MRFR
    [+ CLCM] over the [img; text] joint stream (`pretrain_under_step`, :2234)
  * ``itm``            — fine-tune retrieval t2i/i2t candidate-grid scoring
    (`t2i_step`/`i2t_step`, :1888-2018)
  * ``caption``        — image -> text generation CE (`ic_step`, :1443)
  * ``mt`` / ``ntg``   — text seq2seq CE (`mt_step`, :1383; `ntg_step`, :2596)
  * ``mt_caption``     — multimodal MT: joint [img; src] encoder, text decoder
    (`mt_ic_step`, :1517)
  * ``slide``          — binary slide-text matching (`slide_step`, :2649)

Masking runs on device inside the step (see `m3p_tpu.data.masking`); loss
coefficients (lambda schedules) enter as scalar arguments so schedule updates
never recompile.  The 50/50 mask-words-or-mask-objects coin from
`dataset_pretrain.py:376-383` is a per-row bernoulli applied to the mask
weights.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from m3p_tpu.data.masking import MaskingConfig, mask_regions, mask_tokens
from m3p_tpu.model.transformer import M3PModel, lengths_to_mask

Batch = Dict[str, jax.Array]
Metrics = Dict[str, jax.Array]


# ---------------------------------------------------------------------------
# loss helpers
# ---------------------------------------------------------------------------


def expand_compact_batch(batch: Batch) -> Batch:
    """Materialize grid rows from a compact image batch on device.

    Compact batches (`RetrievalDataset._grid_batch`) ship each group's unique
    images once — ``raw_feats`` (G, U, R, D), ``locs`` (G, U, R, 5),
    ``obj_labels`` (G, U, R), ``img_len`` (G, U) — plus a local gather map
    ``img_index`` (G, n).  Rows are gathered per group (shard-local under
    leading-axis batch sharding) and features are L2-normalized here instead
    of on the host (`get_img_feature` semantics,
    `dataset_finetune.py:559-593`), cutting host work and H2D traffic ~3x
    for candidate grids.  Batches without ``img_index`` pass through
    unchanged, so dense (synthetic/legacy) batches keep working."""
    if "img_index" not in batch:
        return batch
    batch = dict(batch)
    idx = batch.pop("img_index")                      # (G, n) local slots
    g, n = idx.shape

    def rows(pool):
        gathered = jax.vmap(lambda p, i: p[i])(pool, idx)   # (G, n, ...)
        return gathered.reshape((g * n,) + gathered.shape[2:])

    raw = rows(batch["raw_feats"])                    # (B, R, D)
    batch["raw_feats"] = raw
    norm = jnp.linalg.norm(raw.astype(jnp.float32), axis=-1, keepdims=True)
    batch["feats"] = (raw / jnp.maximum(norm, 1e-12)).astype(raw.dtype)
    for k in ("locs", "obj_labels", "img_len"):
        if k in batch:
            batch[k] = rows(batch[k])
    return batch


def masked_ce(logits: jax.Array, labels: jax.Array,
              weights: jax.Array) -> jax.Array:
    """Mean CE over weighted slots (== reference mean-over-masked CE)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), jnp.maximum(labels, 0))
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(ce * weights) / denom


def itm_grid_losses(scores: jax.Array, pos_labels: jax.Array,
                    sample_n: int) -> Tuple[jax.Array, jax.Array]:
    """(B*N, 1) ITM scores -> (CE over the N-way grid, BCE vs one-hot).

    Matches `t2i_step` (`xtrainer.py:1929-1943`): CE with the positive index
    plus binary CE on each pair's score."""
    grid = scores.reshape(-1, sample_n).astype(jnp.float32)
    ce = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        grid, pos_labels))
    one_hot = jax.nn.one_hot(pos_labels, sample_n, dtype=jnp.float32)
    bce = jnp.mean(optax.sigmoid_binary_cross_entropy(grid, one_hot))
    return ce, bce


def seq2seq_ce(model: M3PModel, params, src_enc, src_mask, tgt_tokens,
               tgt_mask, langs=None, rngs=None,
               deterministic=True) -> Tuple[jax.Array, Metrics]:
    """Teacher-forced next-token CE through the causal decoder with
    cross-attention (`mt_step`/`ic_step` prediction structure)."""
    x = tgt_tokens[:, :-1]
    y = tgt_tokens[:, 1:]
    y_mask = tgt_mask[:, 1:].astype(jnp.float32)
    x_mask = tgt_mask[:, :-1]
    dec, _ = model.apply(
        {"params": params}, x, x_mask,
        langs[:, :-1] if langs is not None else None, None, True,
        src_enc, src_mask, None, deterministic,
        method=model.encode_text, rngs=rngs)
    logits = model.apply({"params": params}, dec, method=model.word_logits)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), y)
    denom = jnp.maximum(jnp.sum(y_mask), 1.0)
    loss = jnp.sum(ce * y_mask) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == y) * y_mask) / denom
    return loss, {"ce": loss, "acc": acc, "n_words": jnp.sum(y_mask)}


# ---------------------------------------------------------------------------
# objective losses
# ---------------------------------------------------------------------------


def clm_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
             deterministic: bool = False, context_size: int = 0
             ) -> Tuple[jax.Array, Metrics]:
    """Causal LM on text streams (`clm_steps` / `evaluate_clm` — XLM heritage
    kept in the reference CLI surface): causal self-attention over the
    sequence, next-token CE.  ``context_size`` > 0 excludes the first
    positions from prediction (context-conditioned CLM,
    `xtrainer.py:712-713`)."""
    tokens = batch["tokens"]
    text_mask = lengths_to_mask(batch["lengths"], tokens.shape[1])
    x, y = tokens[:, :-1], tokens[:, 1:]
    y_mask = text_mask[:, 1:].astype(jnp.float32)
    if context_size > 0:
        y_mask = y_mask * (jnp.arange(y.shape[1])[None, :]
                           >= context_size).astype(jnp.float32)
    hidden, _ = model.apply(
        {"params": params}, x, text_mask[:, :-1], batch.get("langs"),
        None, True, method=model.encode_text,
        rngs={"dropout": rng}, deterministic=deterministic)
    logits = model.apply({"params": params}, hidden,
                         method=model.word_logits)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), y)
    denom = jnp.maximum(jnp.sum(y_mask), 1.0)
    loss = jnp.sum(ce * y_mask) / denom
    acc = jnp.sum((jnp.argmax(logits, -1) == y) * y_mask) / denom
    return loss, {"clm": loss, "acc": acc}


def mlm_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
             mask_cfg: MaskingConfig, deterministic: bool = False,
             mask_scores=None) -> Tuple[jax.Array, Metrics]:
    """xMLM on a text stream (`mlm_step`, `xtrainer.py:734-770`)."""
    r_mask, r_drop = jax.random.split(rng)
    tokens = batch["tokens"]
    text_mask = lengths_to_mask(batch["lengths"], tokens.shape[1])
    masked, pos, labels, weights = mask_tokens(r_mask, tokens, text_mask,
                                               mask_cfg,
                                               mask_scores=mask_scores)
    hidden, _ = model.apply(
        {"params": params}, masked, text_mask, batch.get("langs"),
        method=model.encode_text, rngs={"dropout": r_drop},
        deterministic=deterministic)
    gathered = jnp.take_along_axis(hidden, pos[..., None], axis=1)
    logits = model.apply({"params": params}, gathered,
                         method=model.word_logits)
    loss = masked_ce(logits, labels, weights)
    return loss, {"mlm": loss}


def mct_pretrain_loss(
    model: M3PModel, params, batch: Batch, rng: jax.Array,
    mask_cfg: MaskingConfig, sample_n: int,
    lambda_rel: jax.Array, lambda_mlm: jax.Array, lambda_mrm: jax.Array,
    lambda_mrfr: jax.Array, lambda_clcm: jax.Array,
    refine_image: bool = True, deterministic: bool = False,
    text_delta: Optional[jax.Array] = None,
    img_delta: Optional[jax.Array] = None,
    mask_scores=None,
    pack_ratio: float = 0.5,
    multi_cls_weight: float = 1.0,
    bin_cls_weight: float = 1.0,
) -> Tuple[jax.Array, Metrics]:
    """The multitask pre-training step (`pretrain_under_step`).

    Batch (already grid-flattened, BN = B * sample_n):
      tokens (BN,S) — MCT-code-switched captions; text_len (BN,)
      feats (BN,R,2048), locs (BN,R,5), obj_labels (BN,R), img_len (BN,)
      pos_label (B,) — index of the positive pair within each N-group
      [clcm_tokens (BN,S2), clcm_len, clcm_labels (BN,) — i2t CLCM pairs]
    """
    r_coin, r_text, r_img, r_drop = jax.random.split(rng, 4)
    tokens = batch["tokens"]
    bn, s = tokens.shape
    r = batch["feats"].shape[1]
    text_mask = lengths_to_mask(batch["text_len"], s)
    img_mask = lengths_to_mask(batch["img_len"], r)

    # 50/50 mask-words-or-mask-objects per row (`dataset_pretrain.py:376-383`)
    coin = jax.random.bernoulli(r_coin, 0.5, (bn,)).astype(jnp.float32)

    masked_tokens, pos_t, lab_t, w_t = mask_tokens(r_text, tokens, text_mask,
                                                   mask_cfg,
                                                   mask_scores=mask_scores)
    w_t = w_t * coin[:, None]
    masked_tokens = jnp.where(coin[:, None] > 0, masked_tokens, tokens)

    masked_feats, pos_r, lab_r, w_r, tgt_r = mask_regions(
        r_img, batch["feats"], batch["obj_labels"], img_mask, mask_cfg)
    if "raw_feats" in batch:
        # MRFR regresses the ORIGINAL (un-normalized) region features
        # (`xtrainer.py:2332-2352` uses ori_att_feats)
        tgt_r = jnp.take_along_axis(batch["raw_feats"], pos_r[..., None],
                                    axis=1)
    w_r = w_r * (1.0 - coin)[:, None]
    masked_feats = jnp.where((coin < 1)[:, None, None], masked_feats,
                             batch["feats"])

    # freeLB adversarial deltas: text on the (masked-)token embeddings,
    # image on the raw region features (`freelb_pretrain_under_step`,
    # `xtrainer.py:2404-2594`)
    token_embeds = None
    if text_delta is not None:
        token_embeds = model.apply({"params": params}, masked_tokens,
                                   method=model.embed_tokens) + text_delta
    if img_delta is not None:
        masked_feats = masked_feats + img_delta.astype(masked_feats.dtype)

    hidden = model.apply(
        {"params": params}, masked_tokens, text_mask, masked_feats,
        batch["locs"], img_mask, refine_image,
        method=model.encode_joint, rngs={"dropout": r_drop},
        deterministic=deterministic, token_embeds=token_embeds)
    img_out, text_out = hidden[:, :r], hidden[:, r:]

    # MC-MLM — pack the active slots across the batch before the 250k-vocab
    # projection: the 50/50 word/object coin leaves ~half the rows with zero
    # text-prediction weight, so the largest GEMM of the step runs on a
    # packed (BN*P*pack_ratio, D) block instead of all BN*P slots.  top_k on
    # the 0/1 weights moves every active slot into the packed block
    # (zero-weight slots contribute 0 to both the weighted-CE numerator and
    # the weight sum), so the loss is bit-identical unless more slots are
    # active than the budget; on overflow the surplus slots drop and the
    # weight-normalized CE becomes an unbiased subsample of the same mean.
    # Expected text load = BN/2 * word_pred * len slots: the default 0.5
    # budget sits ~12 sigma above it; 0.25 is ~3.5 sigma for 64-token
    # synthetic captions (overflow p ~ 2e-4/step) and ~12 sigma for real
    # <=20-token captions — less lossy in practice than the per-row
    # max_pred cap the fixed-slot layout already imposes.
    g_t = jnp.take_along_axis(text_out, pos_t[..., None], axis=1)
    p_t = pos_t.shape[1]
    k_pack = max(int(bn * p_t * pack_ratio), 1)
    pack_w, pack_idx = jax.lax.top_k(w_t.reshape(-1), k_pack)
    g_pack = jnp.take(g_t.reshape(bn * p_t, -1), pack_idx, axis=0)
    lab_pack = jnp.take(lab_t.reshape(-1), pack_idx)
    mlm = masked_ce(
        model.apply({"params": params}, g_pack, method=model.word_logits),
        lab_pack, pack_w)

    # MC-MRM / MRFR — same cross-batch packing, fixed 0.5 budget: region
    # masking selects ~15 of 100 regions so nearly every coin-off row fills
    # its slots (expected load ~0.47 of BN*P — unlike text, pack_ratio<0.5
    # would subsample real slots here)
    g_r = jnp.take_along_axis(img_out, pos_r[..., None], axis=1)
    p_r = pos_r.shape[1]
    k_r = max((bn * p_r) // 2, 1)
    packr_w, packr_idx = jax.lax.top_k(w_r.reshape(-1), k_r)
    g_r_pack = jnp.take(g_r.reshape(bn * p_r, -1), packr_idx, axis=0)
    lab_r_pack = jnp.take(lab_r.reshape(-1), packr_idx)
    w_obj = packr_w * (lab_r_pack >= 0).astype(jnp.float32)
    mrm = masked_ce(
        model.apply({"params": params}, g_r_pack, method=model.obj_logits),
        lab_r_pack, w_obj)

    # MRFR feature regression
    tgt_r_pack = jnp.take(
        tgt_r.reshape(bn * p_r, -1), packr_idx, axis=0)
    pred_feats = model.apply({"params": params}, g_r_pack,
                             method=model.mrfr_predict).astype(jnp.float32)
    se = jnp.mean((pred_feats - tgt_r_pack.astype(jnp.float32)) ** 2,
                  axis=-1)
    mrfr = jnp.sum(se * packr_w) / jnp.maximum(jnp.sum(packr_w), 1.0)

    # ITM over the candidate grid
    scores = model.apply({"params": params}, hidden, method=model.itm_score)
    ce, bce = itm_grid_losses(scores, batch["pos_label"], sample_n)
    rel = multi_cls_weight * ce + bin_cls_weight * bce

    total = (lambda_rel * rel + lambda_mlm * mlm + lambda_mrm * mrm
             + lambda_mrfr * mrfr)
    metrics = {"rel": rel, "mlm": mlm, "mrm": mrm, "mrfr": mrfr}

    # CLCM: concat-caption pairs, binary labels (i2t only)
    if "clcm_tokens" in batch:
        clcm_mask = lengths_to_mask(batch["clcm_len"],
                                    batch["clcm_tokens"].shape[1])
        hidden2 = model.apply(
            {"params": params}, batch["clcm_tokens"], clcm_mask, masked_feats,
            batch["locs"], img_mask, refine_image,
            method=model.encode_joint, rngs={"dropout": r_drop},
            deterministic=deterministic)
        s2 = model.apply({"params": params}, hidden2,
                         method=model.clcm_score).astype(jnp.float32)
        clcm = jnp.mean(optax.sigmoid_binary_cross_entropy(
            s2[:, 0], batch["clcm_labels"].astype(jnp.float32)))
        total = total + lambda_clcm * clcm
        metrics["clcm"] = clcm

    metrics["loss"] = total
    return total, metrics


def itm_finetune_loss(
    model: M3PModel, params, batch: Batch, rng: jax.Array, sample_n: int,
    refine_image: bool = True, deterministic: bool = False,
    multi_cls_weight: float = 1.0, bin_cls_weight: float = 1.0,
) -> Tuple[jax.Array, Metrics]:
    """Fine-tune retrieval step (`t2i_step`/`i2t_step`): CE + BCE over the
    sample_n candidate grid."""
    tokens = batch["tokens"]
    text_mask = lengths_to_mask(batch["text_len"], tokens.shape[1])
    img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
    hidden = model.apply(
        {"params": params}, tokens, text_mask, batch["feats"], batch["locs"],
        img_mask, refine_image,
        method=model.encode_joint, rngs={"dropout": rng},
        deterministic=deterministic)
    scores = model.apply({"params": params}, hidden, method=model.itm_score)
    ce, bce = itm_grid_losses(scores, batch["pos_label"], sample_n)
    loss = multi_cls_weight * ce + bin_cls_weight * bce
    acc = jnp.mean(
        (jnp.argmax(scores.reshape(-1, sample_n), axis=1)
         == batch["pos_label"]).astype(jnp.float32))
    return loss, {"loss": loss, "ce": ce, "bce": bce, "acc": acc}


def caption_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
                 refine_image: bool = True, deterministic: bool = False,
                 refine_encoder: bool = False) -> Tuple[jax.Array, Metrics]:
    """Image captioning (`ic_step`): encode regions via the image stream,
    decode the caption with cross-attention.  ``refine_encoder`` applies the
    AoA refiner again AFTER the encoder stack (`transformer.py:869-870`,
    passed by `ic_step` `xtrainer.py:1495`)."""
    r_enc, r_dec = jax.random.split(rng)
    img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
    src_enc = model.apply(
        {"params": params}, batch["feats"], batch["locs"], img_mask, None,
        refine_image, method=model.encode_image, rngs={"dropout": r_enc},
        deterministic=deterministic, refine_encoder=refine_encoder)
    tgt_mask = lengths_to_mask(batch["tgt_len"], batch["tokens"].shape[1])
    loss, m = seq2seq_ce(model, params, src_enc, img_mask, batch["tokens"],
                         tgt_mask, langs=batch.get("langs"),
                         rngs={"dropout": r_dec}, deterministic=deterministic)
    return loss, m


def mt_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
            deterministic: bool = False) -> Tuple[jax.Array, Metrics]:
    """Text seq2seq (`mt_step` / `ntg_step`)."""
    r_enc, r_dec = jax.random.split(rng)
    src_mask = lengths_to_mask(batch["src_len"], batch["src_tokens"].shape[1])
    src_enc, _ = model.apply(
        {"params": params}, batch["src_tokens"], src_mask,
        batch.get("src_langs"), method=model.encode_text,
        rngs={"dropout": r_enc}, deterministic=deterministic)
    tgt_mask = lengths_to_mask(batch["tgt_len"], batch["tgt_tokens"].shape[1])
    return seq2seq_ce(model, params, src_enc, src_mask, batch["tgt_tokens"],
                      tgt_mask, langs=batch.get("tgt_langs"),
                      rngs={"dropout": r_dec}, deterministic=deterministic)


def mt_caption_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
                    refine_image: bool = True, deterministic: bool = False
                    ) -> Tuple[jax.Array, Metrics]:
    """Multimodal MT (`mt_ic_step`): joint [img; src-text] encoder, causal
    text decoder with cross-attention over the joint encoding."""
    r_enc, r_dec = jax.random.split(rng)
    src_mask = lengths_to_mask(batch["src_len"], batch["src_tokens"].shape[1])
    img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
    joint = model.apply(
        {"params": params}, batch["src_tokens"], src_mask, batch["feats"],
        batch["locs"], img_mask, refine_image,
        method=model.encode_joint, rngs={"dropout": r_enc},
        deterministic=deterministic)
    joint_mask = jnp.concatenate([img_mask, src_mask], axis=1)
    tgt_mask = lengths_to_mask(batch["tgt_len"], batch["tgt_tokens"].shape[1])
    return seq2seq_ce(model, params, joint, joint_mask, batch["tgt_tokens"],
                      tgt_mask, langs=batch.get("tgt_langs"),
                      rngs={"dropout": r_dec}, deterministic=deterministic)


def tifg_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
              refine_image: bool = True, deterministic: bool = False
              ) -> Tuple[jax.Array, Metrics]:
    """Text-to-image-feature generation (`tifg_step`, `xtrainer.py:1810-1866`):
    encode the caption, causally "decode" the image stream with
    cross-attention, regress the refined image embedding with MSE."""
    r_t, r_i, r_d = jax.random.split(rng, 3)
    text_len = batch["text_len"] if "text_len" in batch else batch["tgt_len"]
    text_mask = lengths_to_mask(text_len, batch["tokens"].shape[1])
    img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
    target = model.apply(
        {"params": params}, batch["feats"], batch["locs"], img_mask, None,
        refine_image, method=model.embed_image_regions,
        rngs={"dropout": r_i}, deterministic=deterministic)
    enc, _ = model.apply(
        {"params": params}, batch["tokens"], text_mask,
        method=model.encode_text, rngs={"dropout": r_t},
        deterministic=deterministic)
    dec = model.apply(
        {"params": params}, batch["feats"], batch["locs"], img_mask, enc,
        text_mask, deterministic, method=model.decode_image,
        rngs={"dropout": r_d})
    w = img_mask[..., None].astype(jnp.float32)
    se = (dec.astype(jnp.float32)
          - jax.lax.stop_gradient(target).astype(jnp.float32)) ** 2
    loss = jnp.sum(se * w) / jnp.maximum(jnp.sum(w) * dec.shape[-1], 1.0)
    return loss, {"tifg": loss}


def pc_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
            clf_ids: Tuple[int, int] = (8, 9), deterministic: bool = False
            ) -> Tuple[jax.Array, Metrics]:
    """Parallel classification (`pc_step`, `xtrainer.py:772-826`): classify
    whether a concatenated sentence pair is a translation pair; the binary
    classifier reuses two word-embedding rows as weight/bias (reference
    CLF_ID1/CLF_ID2 hack preserved for checkpoint parity).

    Batch from `m3p_tpu.data.noise.concat_batches` + labels (B,)."""
    text_mask = lengths_to_mask(batch["lengths"], batch["tokens"].shape[1])
    hidden, _ = model.apply(
        {"params": params}, batch["tokens"], text_mask, batch.get("langs"),
        batch.get("positions"), method=model.encode_text,
        rngs={"dropout": rng}, deterministic=deterministic)
    h0 = hidden[:, 0].astype(jnp.float32)
    emb = params["text_emb"]["word"]["embedding"].astype(jnp.float32)
    logits = h0 @ emb[clf_ids[0]] + emb[clf_ids[1], 0]
    loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits, batch["labels"].astype(jnp.float32)))
    acc = jnp.mean(((logits > 0) == (batch["labels"] > 0))
                   .astype(jnp.float32))
    return loss, {"pc": loss, "acc": acc}


def mass_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
              deterministic: bool = False) -> Tuple[jax.Array, Metrics]:
    """MASS segment-masked seq2seq (`bart_mass_step`/`restricted_mask_sent`,
    `xtrainer.py:1269-1316,1648`): encode the span-masked sentence, decode the
    masked span from its previous tokens at the span's source positions.

    Batch from `m3p_tpu.data.span_masking.mass_mask`."""
    r_enc, r_dec = jax.random.split(rng)
    enc_mask = lengths_to_mask(batch["enc_len"], batch["enc_tokens"].shape[1])
    src_enc, _ = model.apply(
        {"params": params}, batch["enc_tokens"], enc_mask,
        batch.get("langs"), method=model.encode_text,
        rngs={"dropout": r_enc}, deterministic=deterministic)
    tgt_mask = batch["target_mask"]
    dec, _ = model.apply(
        {"params": params}, batch["dec_tokens"], tgt_mask > 0, None,
        batch["dec_pos"], True, src_enc, enc_mask, None, deterministic,
        method=model.encode_text, rngs={"dropout": r_dec})
    logits = model.apply({"params": params}, dec, method=model.word_logits)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), batch["targets"])
    denom = jnp.maximum(jnp.sum(tgt_mask), 1.0)
    loss = jnp.sum(ce * tgt_mask) / denom
    return loss, {"mass": loss}


def slide_loss(model: M3PModel, params, batch: Batch, rng: jax.Array,
               refine_image: bool = True, deterministic: bool = False
               ) -> Tuple[jax.Array, Metrics]:
    """Slide-text matching (`slide_step`): joint forward + binary ITM."""
    text_mask = lengths_to_mask(batch["text_len"], batch["tokens"].shape[1])
    img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
    hidden = model.apply(
        {"params": params}, batch["tokens"], text_mask, batch["feats"],
        batch["locs"], img_mask, refine_image,
        method=model.encode_joint, rngs={"dropout": rng},
        deterministic=deterministic)
    scores = model.apply({"params": params}, hidden,
                         method=model.itm_score).astype(jnp.float32)
    loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
        scores[:, 0], batch["labels"].astype(jnp.float32)))
    acc = jnp.mean(((scores[:, 0] > 0)
                    == (batch["labels"] > 0)).astype(jnp.float32))
    return loss, {"loss": loss, "acc": acc}


# ---------------------------------------------------------------------------
# jitted step factory
# ---------------------------------------------------------------------------


def make_train_step(
    loss_fn: Callable[..., Tuple[jax.Array, Metrics]],
    donate: bool = True,
    state_shardings: Optional[Any] = None,
    with_grad_norm: bool = False,
) -> Callable:
    """Wrap a loss function into a jitted (state, batch, rng, **scalars) ->
    (state, metrics) step with value_and_grad.

    ``state_shardings`` (a TrainState-shaped tree of NamedShardings, see
    `m3p_tpu.parallel.sharding.train_state_shardings`) pins the output state
    layout so parameters stay sharded across steps on a mesh.
    ``with_grad_norm`` adds the global gradient norm to the metrics — an
    extra full pass over the gradients, so off by default (the clipping
    transform computes its own norm regardless)."""

    def step(state, batch, rng, **kw):
        batch = expand_compact_batch(batch)

        def compute(params):
            return loss_fn(params, batch, rng, **kw)

        (loss, metrics), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = dict(metrics)
        if with_grad_norm:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    out_shardings = None
    if state_shardings is not None:
        out_shardings = (state_shardings, None)
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)
