"""Input embeddings: text (word + position + language) and image regions
(feature / bbox-geometry / class-distribution projections), plus the AoA
(attention-on-attention) region refiner.

Reference semantics:
  * text:  word emb + learned positions + optional lang emb -> LN(1e-12) ->
    dropout (`transformer.py:1050-1059`)
  * image: Linear(2048->d) + Linear(5->d) [+ Linear(1600->d)] summed -> LN ->
    dropout (`BertImageEmbeddings`, `transformer.py:231-269`); no positions
  * AoA refiner: pre-LN sublayers with GLU-gated attention-on-attention
    (`transformer.py:274-422`)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3p_tpu.model.layers import LayerNorm, TransformerFFN, _dense
from m3p_tpu.ops.attention import attention

Dtype = Any


def _embed(num: int, dim: int, dtype, param_dtype, name: str, axes):
    return nn.Embed(
        num, dim, dtype=dtype, param_dtype=param_dtype,
        embedding_init=nn.with_logical_partitioning(
            nn.initializers.normal(stddev=dim ** -0.5), axes),
        name=name,
    )


def sinusoidal_table(n_pos: int, dim: int):
    """Fixed sin/cos position table (`create_sinusoidal_embeddings`,
    `transformer.py:37-46`): sin on even dims, cos on odd, frequency
    10000^(2*(j//2)/dim)."""
    import numpy as np

    j = np.arange(dim)
    inv_freq = 1.0 / np.power(10000.0, 2 * (j // 2) / dim)
    enc = np.arange(n_pos)[:, None] * inv_freq[None, :]
    out = np.empty((n_pos, dim), np.float32)
    out[:, 0::2] = np.sin(enc[:, 0::2])
    out[:, 1::2] = np.cos(enc[:, 1::2])
    return jnp.asarray(out)


class TextEmbeddings(nn.Module):
    """Word + learned-position + optional language embeddings."""

    n_words: int
    n_langs: int
    dim: int
    max_positions: int
    dropout: float = 0.0
    sinusoidal: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.word = _embed(self.n_words, self.dim, self.dtype,
                           self.param_dtype, "word", ("vocab", "embed"))
        if self.sinusoidal:
            # fixed, non-learned table (`--sinusoidal_embeddings`)
            table = sinusoidal_table(self.max_positions, self.dim)
            self.position = lambda pos: table[pos].astype(self.dtype)
        else:
            self.position = _embed(self.max_positions, self.dim, self.dtype,
                                   self.param_dtype, "position",
                                   (None, "embed"))
        self.lang = _embed(self.n_langs, self.dim, self.dtype,
                           self.param_dtype, "lang", (None, "embed"))
        self.ln_emb = LayerNorm(dtype=self.dtype, name="ln_emb")
        self.emb_dropout = nn.Dropout(rate=self.dropout)

    def embed_tokens(self, tokens: jax.Array) -> jax.Array:
        return self.word(tokens)

    def __call__(
        self,
        tokens: jax.Array,                    # (B, S) int32
        positions: Optional[jax.Array] = None,
        langs: Optional[jax.Array] = None,    # (B, S) int32
        deterministic: bool = True,
        token_embeds: Optional[jax.Array] = None,  # freeLB embedding override
    ) -> jax.Array:
        b, s = tokens.shape
        x = self.word(tokens) if token_embeds is None else token_embeds
        if positions is None:
            positions = jnp.arange(s)[None, :]
        x = x + self.position(positions)
        if langs is not None:
            x = x + self.lang(langs)
        x = self.ln_emb(x)
        return self.emb_dropout(x, deterministic=deterministic)


class ImageEmbeddings(nn.Module):
    """Region-feature embedding: 2048-d feature + 5-d geometry
    [+ 1600-d class distribution] projections, summed -> LN -> dropout."""

    dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,                  # (B, R, 2048)
        locs: jax.Array,                   # (B, R, 5)
        dist: Optional[jax.Array] = None,  # (B, R, 1600)
        deterministic: bool = True,
    ) -> jax.Array:
        d, pd = self.dtype, self.param_dtype
        x = _dense(self.dim, d, pd, "img_proj", (None, "embed"))(feats)
        x = x + _dense(self.dim, d, pd, "loc_proj", (None, "embed"))(locs)
        if dist is not None:
            x = x + _dense(self.dim, d, pd, "dist_proj", (None, "embed"))(dist)
        x = LayerNorm(dtype=d, name="ln")(x)
        return nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)


class AoAAttention(nn.Module):
    """Multi-head attention with attention-on-attention GLU gate: the attended
    context is concatenated with the query and gated, replacing the output
    projection (`MultiHeadedDotAttention(project_k_v=1, do_aoa=1)`)."""

    n_heads: int
    dim: int
    dropout: float = 0.0
    dropout_aoa: float = 0.1
    # attention-WEIGHT dropout: separate from the residual dropout so the
    # fused-attention fast path engages when it is 0 (the slow branch
    # materializes fp32 (B,H,R,R) scores + a per-weight random mask)
    attention_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = True
    quant: str = "none"   # int8 path for the 2d->2d AoA gate GEMM

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        d, pd = self.dtype, self.param_dtype
        b, s, _ = x.shape
        h, dh = self.n_heads, self.dim // self.n_heads

        def split(t):
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        qp = _dense(self.dim, d, pd, "q_lin", ("embed", "qkv"))(x)
        kp = _dense(self.dim, d, pd, "k_lin", ("embed", "qkv"))(x)
        vp = _dense(self.dim, d, pd, "v_lin", ("embed", "qkv"))(x)

        if (self.use_pallas and jax.default_backend() == "tpu" and s <= 512):
            # layout-native packed kernel: same rationale as the encoder
            # self-attention (model/layers.py) — the projections feed the
            # pallas_call in (B, S, H*Dh) with no head transpose; dropout,
            # when active, uses the in-kernel hardware PRNG
            from m3p_tpu.ops.attention import attention_packed

            if not deterministic and self.attention_dropout > 0.0:
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(self.make_rng("dropout"), (),
                                    jnp.uint32), jnp.int32)
                rate = self.attention_dropout
            else:
                seed, rate = None, 0.0
            ctx = attention_packed(qp, kp, vp, pad_mask, seed, h, False,
                                   None, rate)
        elif not deterministic and self.attention_dropout > 0.0:
            q, k, v = split(qp), split(kp), split(vp)
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(dh))
            neg = jnp.finfo(jnp.float32).min * 0.7
            scores = jnp.where(pad_mask[:, None, None, :], scores, neg)
            w = jax.nn.softmax(scores, axis=-1)
            w = nn.Dropout(rate=self.attention_dropout)(w, deterministic=False)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.dim)
        else:
            q, k, v = split(qp), split(kp), split(vp)
            ctx = attention(q, k, v, pad_mask, use_pallas=self.use_pallas)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, self.dim)

        gate_in = jnp.concatenate([ctx, x], axis=-1)
        gate_in = nn.Dropout(rate=self.dropout_aoa)(
            gate_in, deterministic=deterministic)
        if self.quant in ("int8", "int8_bwd", "int8_all"):
            from m3p_tpu.model.layers import QuantDense

            g = QuantDense(2 * self.dim, d, pd, (None, "embed"),
                           self.quant in ("int8_bwd", "int8_all"),
                           name="aoa")(gate_in)
        else:
            g = _dense(2 * self.dim, d, pd, "aoa", (None, "embed"))(gate_in)
        a, gate = jnp.split(g, 2, axis=-1)
        return a * jax.nn.sigmoid(gate)


class AoARefinerLayer(nn.Module):
    """Pre-LN sublayers: x = x + drop(aoa(LN(x))); x = x + drop(ffn(LN(x)))."""

    n_heads: int
    dim: int
    ffn_dim: int
    dropout: float = 0.1
    attention_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = True
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        drop = nn.Dropout(rate=self.dropout)
        h = LayerNorm(dtype=self.dtype, name="ln_attn")(x)
        h = AoAAttention(
            n_heads=self.n_heads, dim=self.dim, dropout=self.dropout,
            dropout_aoa=self.dropout,
            attention_dropout=self.attention_dropout, dtype=self.dtype,
            param_dtype=self.param_dtype, use_pallas=self.use_pallas,
            name="aoa_attn")(h, pad_mask, deterministic)
        x = x + drop(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="ln_ffn")(x)
        h = TransformerFFN(
            dim=self.dim, hidden_dim=self.ffn_dim, dropout=self.dropout,
            gelu_activation=True, dtype=self.dtype, quant=self.quant,
            param_dtype=self.param_dtype, name="ffn")(h, deterministic)
        return x + drop(h, deterministic=deterministic)


class AoARefiner(nn.Module):
    """Stack of AoA refiner layers + final LN (`AoA_Refiner_Core`)."""

    n_heads: int
    dim: int
    ffn_dim: int
    n_layers: int = 3
    dropout: float = 0.1
    attention_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = True
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        for i in range(self.n_layers):
            x = AoARefinerLayer(
                n_heads=self.n_heads, dim=self.dim, ffn_dim=self.ffn_dim,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout, dtype=self.dtype,
                param_dtype=self.param_dtype, use_pallas=self.use_pallas,
                quant=self.quant, name=f"layer_{i}")(x, pad_mask,
                                                     deterministic)
        return LayerNorm(dtype=self.dtype, name="ln_out")(x)
