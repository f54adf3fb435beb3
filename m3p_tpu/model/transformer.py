"""The unified M3P encoder/decoder model.

Capability parity with the reference ``TransformerModel``
(`/root/reference/M3P/src/model/transformer.py:610-1515`) but organised the
TPU-native way: instead of mode-string dispatch over a mutable nn.Module, the
three forward topologies are explicit pure methods on one Flax module —

  * ``encode_text``  — text stream (reference ``crossfwd(stream_='text')``):
    word+pos+lang embeddings -> LN -> encoder stack; optionally causal with
    cross-attention over ``src_enc`` (decoding) and a functional KV cache.
  * ``encode_image`` — image stream (``crossfwd(stream_='img')``): region
    embeddings (no emb-LN, no positions) -> optional AoA refine -> encoder.
  * ``encode_joint`` — single-stream fusion (``jointfwd``): [img; text] concat
    on the sequence axis, shared learned positions over the concat, emb-LN,
    then the shared encoder stack.

All sequences are batch-major, fixed-shape, with boolean padding masks (the
reference's ``lengths``-derived masks, `transformer.py:59-77`).  Heads:
masked-word prediction (tied embeddings), 1600-class region prediction, ITM,
CLCM, MRFR feature regression.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3p_tpu.config import ModelConfig
from m3p_tpu.model.embeddings import AoARefiner, ImageEmbeddings, TextEmbeddings
from m3p_tpu.model.heads import MRFRHead, ObjPredLayer, Pooler, PredLayer
from m3p_tpu.model.layers import EncoderBlock, LayerNorm

Cache = Dict[str, Any]


def lengths_to_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, max_len) bool validity mask (`transformer.py:59-68`)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def as_variables(params):
    """Accept either a bare params tree or a full variables dict (e.g.
    ``{"params": ..., "q8": ...}`` for frozen-weight int8 inference) at any
    inference entry point; ``model.apply`` needs the latter."""
    if isinstance(params, dict) and "params" in params:
        return params
    return {"params": params}


class M3PModel(nn.Module):
    cfg: ModelConfig

    def setup(self) -> None:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        pdtype = jnp.dtype(cfg.param_dtype)
        self._dtype = dtype

        self.text_emb = TextEmbeddings(
            n_words=cfg.n_words, n_langs=cfg.n_langs, dim=cfg.emb_dim,
            max_positions=cfg.max_positions, dropout=cfg.dropout,
            sinusoidal=cfg.sinusoidal_embeddings,
            dtype=dtype, param_dtype=pdtype, name="text_emb")
        self.image_emb = ImageEmbeddings(
            dim=cfg.emb_dim, dropout=cfg.dropout, dtype=dtype,
            param_dtype=pdtype, name="image_emb")
        self.refiner = AoARefiner(
            n_heads=cfg.n_heads, dim=cfg.emb_dim, ffn_dim=cfg.ffn_dim,
            n_layers=cfg.refine_layers, dropout=cfg.dropout,
            attention_dropout=cfg.attention_dropout, dtype=dtype,
            param_dtype=pdtype, use_pallas=cfg.use_pallas_attention,
            name="refiner")

        block = EncoderBlock
        if cfg.remat:
            # static args: causal (3) and deterministic (7); index 0 is self
            block = nn.remat(EncoderBlock, static_argnums=(3, 7))
        def _moe(i: int) -> int:
            # every moe_interval-th block carries the expert-choice MoE FFN
            # (dense blocks in between, Switch/GLaM-style interleaving)
            if cfg.moe_experts > 0 and (i + 1) % cfg.moe_interval == 0:
                return cfg.moe_experts
            return 0

        self.blocks = [
            block(
                n_heads=cfg.n_heads, dim=cfg.emb_dim, ffn_dim=cfg.ffn_dim,
                dropout=cfg.dropout, attention_dropout=cfg.attention_dropout,
                gelu_activation=cfg.gelu_activation, has_cross_attention=True,
                dtype=dtype, param_dtype=pdtype,
                use_pallas=cfg.use_pallas_attention,
                fused_dropout=cfg.use_fused_dropout,
                seq_axis=cfg.seq_axis, ffn_quant=cfg.ffn_quant,
                moe_experts=_moe(i),
                moe_capacity_factor=cfg.moe_capacity_factor,
                name=f"block_{i}")
            for i in range(cfg.n_layers)
        ]

        if cfg.asm:
            from m3p_tpu.model.heads import AdaptiveSoftmax

            self.pred_layer = AdaptiveSoftmax(
                n_words=cfg.n_words, dim=cfg.emb_dim,
                cutoffs=tuple(cfg.asm_cutoffs), div_value=cfg.asm_div_value,
                dtype=dtype, param_dtype=pdtype, name="pred_layer_asm")
        else:
            self.pred_layer = PredLayer(
                n_words=cfg.n_words, dim=cfg.emb_dim, quant=cfg.head_quant,
                dtype=dtype, param_dtype=pdtype, name="pred_layer")
        # BiDAF-style image->text fusion, live in the reference under the
        # ``image_fusion`` crossfwd flag (`transformer.py:838-839,1068-1069`)
        from m3p_tpu.model.misc import CrossAlignMatrix

        self.cross_align = CrossAlignMatrix(dim=cfg.emb_dim, dtype=dtype,
                                            param_dtype=pdtype,
                                            name="cross_align")
        self.obj_pred = ObjPredLayer(
            n_obj_classes=cfg.n_obj_classes, dim=cfg.emb_dim, dtype=dtype,
            param_dtype=pdtype, name="obj_pred")
        self.itm_pooler = Pooler(dim=cfg.emb_dim, dtype=dtype,
                                 param_dtype=pdtype, name="itm_pooler")
        self.clcm_pooler = Pooler(dim=cfg.emb_dim, dtype=dtype,
                                  param_dtype=pdtype, name="clcm_pooler")
        self.mrfr_head = MRFRHead(feat_dim=cfg.img_feat_dim, dtype=dtype,
                                  param_dtype=pdtype, name="mrfr_head")
        self.emb_dropout = nn.Dropout(rate=cfg.dropout)

    # ------------------------------------------------------------------
    # forward topologies
    # ------------------------------------------------------------------

    def _run_blocks(self, x, pad_mask, causal=False, src_enc=None,
                    src_mask=None, cache=None, deterministic=True):
        new_cache: Cache = {}
        for i, blk in enumerate(self.blocks):
            layer_cache = cache.get(f"layer_{i}") if cache is not None else None
            x, c = blk(x, pad_mask, causal, src_enc, src_mask, layer_cache,
                       deterministic)
            if c is not None:
                new_cache[f"layer_{i}"] = c
        return x, (new_cache if cache is not None else None)

    def embed_text(
        self,
        tokens: jax.Array,
        text_mask: jax.Array,
        langs: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        deterministic: bool = True,
        token_embeds: Optional[jax.Array] = None,
        image_enc: Optional[jax.Array] = None,
        image_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """The pre-block half of ``encode_text`` (embeddings + mask +
        optional BiDAF fusion) — split out so sequence/pipeline parallelism
        can run the block stack sharded (`m3p_tpu.parallel.sp/pipeline`)."""
        x = self.text_emb(tokens, positions=positions, langs=langs,
                          deterministic=deterministic,
                          token_embeds=token_embeds)
        x = x * text_mask[..., None].astype(x.dtype)
        if image_enc is not None and image_mask is not None:
            x = self.cross_align(x, image_enc, image_mask)
        return x

    def encode_text(
        self,
        tokens: jax.Array,                    # (B, S) int32
        text_mask: jax.Array,                 # (B, S) bool
        langs: Optional[jax.Array] = None,    # (B, S) int32
        positions: Optional[jax.Array] = None,
        causal: bool = False,
        src_enc: Optional[jax.Array] = None,  # (B, Ss, D) encoder output
        src_mask: Optional[jax.Array] = None,
        cache: Optional[Cache] = None,
        deterministic: bool = True,
        token_embeds: Optional[jax.Array] = None,
        image_enc: Optional[jax.Array] = None,   # (B, R, D) image encoding
        image_mask: Optional[jax.Array] = None,  # (B, R)
    ) -> Tuple[jax.Array, Optional[Cache]]:
        """``image_enc``/``image_mask`` engage the BiDAF image->text fusion
        before the encoder stack (the reference ``image_fusion`` path)."""
        x = self.embed_text(tokens, text_mask, langs, positions,
                            deterministic, token_embeds, image_enc,
                            image_mask)
        return self._run_blocks(x, text_mask, causal=causal, src_enc=src_enc,
                                src_mask=src_mask, cache=cache,
                                deterministic=deterministic)

    def encode_image(
        self,
        feats: jax.Array,                     # (B, R, 2048)
        locs: jax.Array,                      # (B, R, 5)
        img_mask: jax.Array,                  # (B, R) bool
        dist: Optional[jax.Array] = None,     # (B, R, 1600)
        refine_image: bool = False,
        deterministic: bool = True,
        feats_embeds: Optional[jax.Array] = None,
        refine_encoder: bool = False,
    ) -> jax.Array:
        # image stream: no emb-LN, no positions (`transformer.py:1060-1066`)
        if feats_embeds is None:
            x = self.image_emb(feats, locs, dist, deterministic=deterministic)
        else:
            x = feats_embeds
        x = x * img_mask[..., None].astype(x.dtype)
        if refine_image:
            x = self.refiner(x, img_mask, deterministic=deterministic)
        x, _ = self._run_blocks(x, img_mask, deterministic=deterministic)
        if refine_encoder:
            # AoA refine AFTER the encoder stack — the reference's
            # `refine_encoder` path (`transformer.py:869-870`, driven by
            # `ic_step` `xtrainer.py:1495` and FreeLB IC `:2741`)
            x = self.refiner(x, img_mask, deterministic=deterministic)
        return x

    def embed_image_regions(
        self,
        feats: jax.Array,
        locs: jax.Array,
        img_mask: jax.Array,
        dist: Optional[jax.Array] = None,
        refine_image: bool = True,
        deterministic: bool = True,
    ) -> jax.Array:
        """Region embedding (+ optional AoA refine) without the encoder stack —
        the reference ``ImageEmbedding`` mode (`transformer.py:1117-1137`)."""
        x = self.image_emb(feats, locs, dist, deterministic=deterministic)
        x = x * img_mask[..., None].astype(x.dtype)
        if refine_image:
            x = self.refiner(x, img_mask, deterministic=deterministic)
        return x

    def encode_joint(
        self,
        tokens: jax.Array,                    # (B, S)
        text_mask: jax.Array,                 # (B, S)
        feats: jax.Array,                     # (B, R, 2048)
        locs: jax.Array,                      # (B, R, 5)
        img_mask: jax.Array,                  # (B, R)
        refine_image: bool = False,
        deterministic: bool = True,
        token_embeds: Optional[jax.Array] = None,
        feats_embeds: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Single-stream fusion over the [img; text] concat (`jointfwd`,
        `transformer.py:878-968`).  Returns (B, R+S, D); image part first.

        Deviation from the reference (documented): the reference derives the
        joint mask from len_img+len_text assuming contiguous validity
        (`transformer.py:916-919`); we use the exact per-segment masks, which
        is identical whenever regions are densely packed (always true in the
        reference data pipeline, num_boxes == max_region_num).
        """
        if feats_embeds is None:
            img = self.image_emb(feats, locs, deterministic=deterministic)
        else:
            img = feats_embeds
        r = img.shape[1]
        img_pad = img_mask[..., None].astype(img.dtype)
        img = img * img_pad
        if refine_image:
            img = self.refiner(img, img_mask, deterministic=deterministic)

        txt = (self.text_emb.embed_tokens(tokens)
               if token_embeds is None else token_embeds)

        x = jnp.concatenate([img, txt.astype(img.dtype)], axis=1)
        s_total = x.shape[1]
        positions = jnp.arange(s_total)[None, :]
        x = x + self.text_emb.position(positions)

        joint_mask = jnp.concatenate([img_mask, text_mask], axis=1)
        x = x * joint_mask[..., None].astype(x.dtype)
        x = self.text_emb.ln_emb(x)
        x = self.emb_dropout(x, deterministic=deterministic)

        x, _ = self._run_blocks(x, joint_mask, deterministic=deterministic)
        return x

    def embed_joint(
        self,
        tokens: jax.Array,
        text_mask: jax.Array,
        feats: jax.Array,
        locs: jax.Array,
        img_mask: jax.Array,
        refine_image: bool = False,
        deterministic: bool = True,
        token_embeds: Optional[jax.Array] = None,
        feats_embeds: Optional[jax.Array] = None,
    ):
        """The embedding half of encode_joint (everything before the encoder
        stack) — used by the sequence-parallel path, which shards the
        resulting (B, R+S, D) activations over the seq axis and runs
        `run_blocks_only` inside shard_map."""
        if feats_embeds is None:
            img = self.image_emb(feats, locs, deterministic=deterministic)
        else:
            img = feats_embeds
        img = img * img_mask[..., None].astype(img.dtype)
        if refine_image:
            img = self.refiner(img, img_mask, deterministic=deterministic)
        txt = (self.text_emb.embed_tokens(tokens)
               if token_embeds is None else token_embeds)
        x = jnp.concatenate([img, txt.astype(img.dtype)], axis=1)
        positions = jnp.arange(x.shape[1])[None, :]
        x = x + self.text_emb.position(positions)
        joint_mask = jnp.concatenate([img_mask, text_mask], axis=1)
        x = x * joint_mask[..., None].astype(x.dtype)
        x = self.text_emb.ln_emb(x)
        x = self.emb_dropout(x, deterministic=deterministic)
        return x, joint_mask

    def run_blocks_only(self, x: jax.Array, pad_mask: jax.Array,
                        deterministic: bool = True) -> jax.Array:
        """Encoder stack without cache — the shard_map body for SP."""
        x, _ = self._run_blocks(x, pad_mask, deterministic=deterministic)
        return x

    def decode_image(
        self,
        feats: jax.Array,
        locs: jax.Array,
        img_mask: jax.Array,
        src_enc: jax.Array,
        src_mask: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """Causal image-stream decoding with cross-attention over a text
        encoding — the TIFG text-to-image-feature generator topology
        (`tifg_step`, `xtrainer.py:1840-1852`)."""
        x = self.image_emb(feats, locs, deterministic=deterministic)
        x = x * img_mask[..., None].astype(x.dtype)
        x, _ = self._run_blocks(x, img_mask, causal=True, src_enc=src_enc,
                                src_mask=src_mask,
                                deterministic=deterministic)
        return x

    # ------------------------------------------------------------------
    # heads (reference ``predict`` mode, `transformer.py:1183-1214`)
    # ------------------------------------------------------------------

    def word_logits(self, hidden: jax.Array) -> jax.Array:
        """(…, D) -> (…, n_words) via the tied word embedding + bias, or
        normalized adaptive-softmax log-probs when cfg.asm (plug-compatible:
        logsumexp == 0 makes CE/argmax/log_softmax behave identically)."""
        if self.cfg.asm:
            return self.pred_layer(hidden)
        emb = self.text_emb.word.embedding if self.cfg.share_inout_emb else None
        return self.pred_layer(hidden, embedding=emb)

    def obj_logits(self, hidden: jax.Array) -> jax.Array:
        return self.obj_pred(hidden)

    def itm_score(self, hidden: jax.Array) -> jax.Array:
        """(B, S, D) -> (B, 1) image-text matching score (token 0 pooled)."""
        return self.itm_pooler(hidden)

    def clcm_score(self, hidden: jax.Array) -> jax.Array:
        return self.clcm_pooler(hidden)

    def mrfr_predict(self, hidden: jax.Array) -> jax.Array:
        return self.mrfr_head(hidden)

    def embed_tokens(self, tokens: jax.Array) -> jax.Array:
        return self.text_emb.embed_tokens(tokens)

    # ------------------------------------------------------------------
    # decode cache
    # ------------------------------------------------------------------

    def init_cache(self, batch_size: int, max_len: int) -> Cache:
        cfg = self.cfg
        dh = cfg.head_dim
        dtype = jnp.dtype(cfg.dtype)
        cache: Cache = {}
        for i in range(cfg.n_layers):
            cache[f"layer_{i}"] = {
                "self": {
                    "k": jnp.zeros((batch_size, cfg.n_heads, max_len, dh), dtype),
                    "v": jnp.zeros((batch_size, cfg.n_heads, max_len, dh), dtype),
                    "pos": jnp.array(0, jnp.int32),
                },
                "cross": {},
            }
        return cache

    def init_decode_cache(self, src_enc: jax.Array, max_len: int,
                          batch_size: Optional[int] = None) -> Cache:
        """Self-attention KV cache + precomputed cross-attention K/V over the
        encoder output (the incremental-decode equivalent of the reference
        cache reuse, `transformer.py:181-184`).  Precomputing here keeps the
        scan carry structure fixed and avoids reprojecting the source K/V at
        every decode step.

        ``batch_size`` (default: src rows) sizes the self-attention cache;
        beam search passes batch*beam while keeping ``src_enc`` UNREPLICATED —
        cross-attention then beam-folds its queries so each row's K/V is
        read once per step (`layers.py::MultiHeadAttention`)."""
        b = batch_size if batch_size is not None else src_enc.shape[0]
        cache = self.init_cache(b, max_len)
        for i, blk in enumerate(self.blocks):
            attn = blk.encoder_attn
            k = attn._split(attn.k_lin(src_enc))
            v = attn._split(attn.v_lin(src_enc))
            cache[f"layer_{i}"]["cross"] = {"k": k, "v": v}
        return cache

    def capture_q8_pass(self):
        """Touch every ``int8_infer``-quantizable GEMM once on dummy inputs so
        an apply with ``mutable=["q8"]`` captures all frozen-weight int8
        tables in one pass (`m3p_tpu.model.capture_q8`).  The dummy shapes are
        tiny — the work is the one-time weight quantization itself."""
        cfg = self.cfg
        b, s, r = 1, 2, 1
        tokens = jnp.zeros((b, s), jnp.int32)
        tmask = jnp.ones((b, s), bool)
        feats = jnp.zeros((b, r, cfg.img_feat_dim), jnp.float32)
        locs = jnp.zeros((b, r, cfg.img_loc_dim), jnp.float32)
        imask = jnp.ones((b, r), bool)
        # encoder path: fused self-attn QKV + out projections, FFN GEMMs
        hidden = self.encode_joint(tokens, tmask, feats, locs, imask, False)
        # vocab head: the tied (V, D) table
        _ = self.word_logits(hidden[:, 0])
        # decoder path: cross-attention out projection (a distinct module)
        cache = self.init_decode_cache(hidden, 2)
        smask = jnp.ones((b, hidden.shape[1]), bool)
        _ = self.encode_text(tokens[:, :1], jnp.ones((b, 1), bool), None,
                             jnp.zeros((b, 1), jnp.int32), True, hidden,
                             smask, cache, True)
        return ()

    def __call__(self, tokens, text_mask, feats, locs, img_mask,
                 deterministic: bool = True):
        """Joint forward + ITM score — the canonical single entry used for
        parameter init and compile checks."""
        hidden = self.encode_joint(tokens, text_mask, feats, locs, img_mask,
                                   deterministic=deterministic)
        logits = self.word_logits(hidden[:, feats.shape[1]:])
        itm = self.itm_score(hidden)
        return hidden, logits, itm
