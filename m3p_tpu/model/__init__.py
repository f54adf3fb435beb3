"""Model construction (the reference `build_model`, `model/__init__.py:85-171`)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from m3p_tpu.config import ModelConfig
from m3p_tpu.model.transformer import M3PModel, lengths_to_mask


def _full_surface_init(model: M3PModel, tokens, text_mask, feats, locs,
                       img_mask, langs):
    """Touch every submodule so init creates the complete parameter tree:
    joint fusion + AoA refiner, text stream with language embeddings,
    causal decode with cross-attention, and all five heads."""
    hidden = model.encode_joint(tokens, text_mask, feats, locs, img_mask,
                                refine_image=True)
    if model.cfg.image_fusion:
        r = feats.shape[1]
        model.encode_text(tokens, text_mask, image_enc=hidden[:, :r],
                          image_mask=img_mask)
    enc, _ = model.encode_text(tokens, text_mask, langs=langs)
    dec, _ = model.encode_text(tokens, text_mask, causal=True, src_enc=enc,
                               src_mask=text_mask)
    r = feats.shape[1]
    return (
        model.word_logits(dec[:, :1]),
        model.obj_logits(hidden[:, :r]),
        model.itm_score(hidden),
        model.clcm_score(hidden),
        model.mrfr_predict(hidden[:, :r]),
    )


def build_model(cfg: ModelConfig, rng: jax.Array) -> Tuple[M3PModel, Dict[str, Any]]:
    """Create the model and initialize the full parameter tree on tiny shapes
    (parameter shapes are sequence-length independent)."""
    model = M3PModel(cfg)
    b, s, r = 2, 4, 2
    tokens = jnp.zeros((b, s), jnp.int32)
    text_mask = jnp.ones((b, s), bool)
    feats = jnp.zeros((b, r, cfg.img_feat_dim), jnp.float32)
    locs = jnp.zeros((b, r, cfg.img_loc_dim), jnp.float32)
    img_mask = jnp.ones((b, r), bool)
    langs = jnp.zeros((b, s), jnp.int32)
    import flax.linen as nn

    # jit the init: unjitted init dispatches thousands of tiny ops (very slow
    # over remote-device transports); one compiled program instead
    init_fn = jax.jit(
        lambda r: model.init(r, tokens, text_mask, feats, locs, img_mask,
                             langs, method=_init_method))
    boxed = init_fn(rng)["params"]
    # params carry nn.Partitioned logical-axis metadata; unbox for plain use
    # (m3p_tpu.parallel.sharding re-derives the specs via eval_shape)
    params = nn.meta.unbox(boxed)
    return model, params


def _init_method(model: M3PModel, tokens, text_mask, feats, locs, img_mask,
                 langs):
    return _full_surface_init(model, tokens, text_mask, feats, locs, img_mask,
                              langs)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def capture_q8(model: M3PModel, params) -> Dict[str, Any]:
    """One-time weight quantization for frozen-weight int8 inference.

    For a model built with ``ffn_quant="int8_infer"`` (and/or
    ``head_quant="int8_infer"``), runs one tiny compiled pass that quantizes
    every eligible GEMM weight (fused self-attn QKV, attention out
    projections, FFN kernels, the tied vocab table) into a "q8" variable
    collection.  Inference then applies with
    ``{"params": params, "q8": q8}`` (every inference entry point accepts the
    full variables dict via ``as_variables``) and pays only per-activation
    quantization in the hot loop — the weight HBM reads halve and the GEMMs
    ride the int8 MXU.  Training measured per-step weight quantization as a
    dead-end (STATUS.md); this exists because inference weights are frozen.
    """
    run = jax.jit(lambda p: model.apply(
        {"params": p}, method=model.capture_q8_pass, mutable=["q8"])[1]["q8"])
    return run(params)


def quantized_inference_model(cfg: ModelConfig) -> M3PModel:
    """The int8-inference variant of a model config: same parameter
    structure/naming (checkpoint-compatible), GEMMs routed through the
    frozen-weight int8 path (pair with ``capture_q8``)."""
    import dataclasses

    return M3PModel(dataclasses.replace(
        cfg, ffn_quant="int8_infer",
        head_quant="int8_infer" if not cfg.asm else cfg.head_quant))
