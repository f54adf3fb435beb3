"""FreeLB adversarial training: embedding-space PGD with "free" gradient
accumulation.

Parity with the reference freeLB machinery (`/root/reference/M3P/src/
xtrainer.py:2020-2223, 2700-2962`):
  * text delta init  ~ U(-1,1) * adv_init_mag / sqrt(len * d)   (l2 norm)
  * image delta init ~ U(-1,1) * adv_init_mag / sqrt(feat_dim)
  * K adversarial steps; each step accumulates PARAMETER gradients (scaled by
    1/K) and ascends the deltas by adv_lr * g / ||g||_2 (rowwise), projected
    onto the adv_max_norm ball
  * deltas apply to word embeddings (pre-position/LN) and to the raw 2048-d
    region features

Implemented as a lax.scan inside one jitted step — the reference's K
backward passes collapse into one compiled program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from m3p_tpu.model.transformer import lengths_to_mask
from m3p_tpu.train import steps as S


@dataclass(frozen=True)
class FreeLBConfig:
    adv_steps: int = 3
    adv_lr: float = 1e-3
    adv_init_mag: float = 1e-4
    adv_max_norm: float = 1e-2     # 0 disables projection
    norm_type: str = "l2"
    free_text: bool = True
    free_img: bool = True


def _init_delta(key, shape, lengths, dim, mag, norm_type):
    if norm_type == "linf":
        return jax.random.uniform(key, shape, minval=-mag, maxval=mag)
    u = jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
    dims = (lengths.astype(jnp.float32) * dim).reshape(-1, 1, 1)
    return u * (mag / jnp.sqrt(dims))


def _ascend(delta, grad, adv_lr, adv_max_norm, norm_type):
    b = delta.shape[0]
    g = grad.reshape(b, -1)
    if norm_type == "linf":
        denorm = jnp.max(jnp.abs(g), axis=1).reshape(-1, 1, 1)
    else:
        denorm = jnp.linalg.norm(g, axis=1).reshape(-1, 1, 1)
    denorm = jnp.maximum(denorm, 1e-8)
    delta = delta + adv_lr * grad / denorm
    if adv_max_norm > 0:
        if norm_type == "linf":
            delta = jnp.clip(delta, -adv_max_norm, adv_max_norm)
        else:
            norms = jnp.linalg.norm(delta.reshape(b, -1), axis=1)
            scale = jnp.where(norms > adv_max_norm,
                              adv_max_norm / jnp.maximum(norms, 1e-8), 1.0)
            delta = delta * scale.reshape(-1, 1, 1)
    return delta


def make_freelb_itm_step(
    model,
    sample_n: int,
    adv: FreeLBConfig,
    refine_image: bool = True,
    state_shardings: Optional[Any] = None,
    donate: bool = True,
) -> Callable:
    """FreeLB-wrapped retrieval fine-tune step (the reference
    `free_lb_t2i/i2t_step`, `xtrainer.py:2020-2223`)."""

    def step(state, batch: Dict[str, jax.Array], rng: jax.Array):
        batch = S.expand_compact_batch(batch)
        params = state.params
        tokens = batch["tokens"]
        text_mask = lengths_to_mask(batch["text_len"], tokens.shape[1])
        img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
        dim = model.cfg.emb_dim

        embeds0 = model.apply({"params": params}, tokens,
                              method=model.embed_tokens)

        def loss_fn(params, d_text, d_img, key):
            token_embeds = embeds0 + d_text if adv.free_text else embeds0
            feats = batch["feats"] + d_img if adv.free_img else batch["feats"]
            hidden = model.apply(
                {"params": params}, tokens, text_mask, feats, batch["locs"],
                img_mask, refine_image, True, token_embeds,
                method=model.encode_joint, rngs={"dropout": key})
            scores = model.apply({"params": params}, hidden,
                                 method=model.itm_score)
            ce, bce = S.itm_grid_losses(scores, batch["pos_label"], sample_n)
            return ce + bce

        k_init, k_img, rng = jax.random.split(rng, 3)
        d_text = _init_delta(k_init, embeds0.shape, batch["text_len"], dim,
                             adv.adv_init_mag, adv.norm_type)
        feat_dim = batch["feats"].shape[-1]
        d_img = _init_delta(
            k_img, batch["feats"].shape,
            jnp.ones_like(batch["img_len"]), feat_dim,
            adv.adv_init_mag, adv.norm_type).astype(batch["feats"].dtype)

        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def body(carry, key):
            d_t, d_i, g_acc, loss_acc = carry
            loss, (g_p, g_dt, g_di) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(params, d_t, d_i, key)
            g_acc = jax.tree.map(
                lambda a, g: a + g / adv.adv_steps, g_acc, g_p)
            d_t = _ascend(d_t, g_dt, adv.adv_lr, adv.adv_max_norm,
                          adv.norm_type)
            d_i = _ascend(d_i, g_di.astype(jnp.float32), adv.adv_lr,
                          adv.adv_max_norm, adv.norm_type).astype(d_i.dtype)
            return (d_t, d_i, g_acc, loss_acc + loss / adv.adv_steps), None

        keys = jax.random.split(rng, adv.adv_steps)
        (_, _, grads, mean_loss), _ = jax.lax.scan(
            body, (d_text, d_img, zero_grads, 0.0), keys)

        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": mean_loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    out_shardings = (state_shardings, None) if state_shardings is not None \
        else None
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)


def make_freelb_pretrain_step(
    model,
    sample_n: int,
    mask_cfg,
    adv: FreeLBConfig,
    refine_image: bool = True,
    state_shardings: Optional[Any] = None,
    donate: bool = True,
) -> Callable:
    """FreeLB-wrapped MCT multitask pre-training step (the reference
    `freelb_pretrain_under_step`, `xtrainer.py:2404-2594`): PGD deltas on the
    masked-token embeddings and raw region features around the full
    ITM+MC-MLM+MC-MRM+MRFR loss.  Masking is fixed across the K adversarial
    steps (same PRNG), so the attack targets a consistent objective."""

    def step(state, batch: Dict[str, jax.Array], rng: jax.Array, **lam):
        batch = S.expand_compact_batch(batch)
        params = state.params
        dim = model.cfg.emb_dim
        lam_kw = dict(
            lambda_rel=lam.get("lambda_rel", 1.0),
            lambda_mlm=lam.get("lambda_mlm", 1.0),
            lambda_mrm=lam.get("lambda_mrm", 1.0),
            lambda_mrfr=lam.get("lambda_mrfr", 1.0),
            lambda_clcm=lam.get("lambda_clcm", 1.0))

        def loss_fn(params, d_text, d_img, key):
            loss, _ = S.mct_pretrain_loss(
                model, params, batch, key, mask_cfg, sample_n,
                refine_image=refine_image,
                text_delta=d_text if adv.free_text else None,
                img_delta=d_img if adv.free_img else None, **lam_kw)
            return loss

        k_init, k_img, k_loss = jax.random.split(rng, 3)
        bn, s = batch["tokens"].shape
        d_text = _init_delta(k_init, (bn, s, dim), batch["text_len"], dim,
                             adv.adv_init_mag, adv.norm_type)
        feat_dim = batch["feats"].shape[-1]
        d_img = _init_delta(
            k_img, batch["feats"].shape, jnp.ones_like(batch["img_len"]),
            feat_dim, adv.adv_init_mag, adv.norm_type).astype(jnp.float32)

        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def body(carry, _):
            d_t, d_i, g_acc, loss_acc = carry
            loss, (g_p, g_dt, g_di) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(params, d_t, d_i, k_loss)
            g_acc = jax.tree.map(
                lambda a, g: a + g / adv.adv_steps, g_acc, g_p)
            d_t = _ascend(d_t, g_dt, adv.adv_lr, adv.adv_max_norm,
                          adv.norm_type)
            d_i = _ascend(d_i, g_di.astype(jnp.float32), adv.adv_lr,
                          adv.adv_max_norm, adv.norm_type)
            return (d_t, d_i, g_acc, loss_acc + loss / adv.adv_steps), None

        (_, _, grads, mean_loss), _ = jax.lax.scan(
            body, (d_text, d_img, zero_grads, 0.0), None,
            length=adv.adv_steps)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": mean_loss}

    out_shardings = (state_shardings, None) if state_shardings is not None \
        else None
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)


def make_freelb_ic_step(
    model,
    adv: FreeLBConfig,
    refine_image: bool = True,
    refine_encoder: bool = False,
    state_shardings: Optional[Any] = None,
    donate: bool = True,
) -> Callable:
    """FreeLB-wrapped captioning step (the reference `free_lb_ic_step`,
    `xtrainer.py:2853-2962`): PGD deltas on the raw region features (encoder
    side) and the decoder-input token embeddings."""

    def step(state, batch: Dict[str, jax.Array], rng: jax.Array, **lam):
        batch = S.expand_compact_batch(batch)
        params = state.params
        dim = model.cfg.emb_dim
        tokens = batch["tokens"]
        x_toks = tokens[:, :-1]
        y = tokens[:, 1:]
        tgt_mask = lengths_to_mask(batch["tgt_len"], tokens.shape[1])
        y_mask = tgt_mask[:, 1:].astype(jnp.float32)
        x_mask = tgt_mask[:, :-1]
        img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])

        def loss_fn(params, d_text, d_img, key):
            feats = batch["feats"] + d_img.astype(batch["feats"].dtype) \
                if adv.free_img else batch["feats"]
            src_enc = model.apply(
                {"params": params}, feats, batch["locs"], img_mask, None,
                refine_image, method=model.encode_image,
                rngs={"dropout": key}, refine_encoder=refine_encoder)
            token_embeds = None
            if adv.free_text:
                token_embeds = model.apply(
                    {"params": params}, x_toks,
                    method=model.embed_tokens) + d_text
            dec, _ = model.apply(
                {"params": params}, x_toks, x_mask, None, None, True,
                src_enc, img_mask, None, True, token_embeds,
                method=model.encode_text, rngs={"dropout": key})
            logits = model.apply({"params": params}, dec,
                                 method=model.word_logits)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y)
            return jnp.sum(ce * y_mask) / jnp.maximum(jnp.sum(y_mask), 1.0)

        k_init, k_img, k_loss = jax.random.split(rng, 3)
        b, sm1 = x_toks.shape
        d_text = _init_delta(k_init, (b, sm1, dim),
                             jnp.maximum(batch["tgt_len"] - 1, 1), dim,
                             adv.adv_init_mag, adv.norm_type)
        feat_dim = batch["feats"].shape[-1]
        d_img = _init_delta(
            k_img, batch["feats"].shape, jnp.ones_like(batch["img_len"]),
            feat_dim, adv.adv_init_mag, adv.norm_type).astype(jnp.float32)

        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def body(carry, _):
            d_t, d_i, g_acc, loss_acc = carry
            loss, (g_p, g_dt, g_di) = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2))(params, d_t, d_i, k_loss)
            g_acc = jax.tree.map(
                lambda a, g: a + g / adv.adv_steps, g_acc, g_p)
            d_t = _ascend(d_t, g_dt, adv.adv_lr, adv.adv_max_norm,
                          adv.norm_type)
            d_i = _ascend(d_i, g_di.astype(jnp.float32), adv.adv_lr,
                          adv.adv_max_norm, adv.norm_type)
            return (d_t, d_i, g_acc, loss_acc + loss / adv.adv_steps), None

        (_, _, grads, mean_loss), _ = jax.lax.scan(
            body, (d_text, d_img, zero_grads, 0.0), None,
            length=adv.adv_steps)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": mean_loss}

    out_shardings = (state_shardings, None) if state_shardings is not None \
        else None
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)
