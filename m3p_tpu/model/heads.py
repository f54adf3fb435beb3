"""Prediction heads.

Reference parity:
  * PredLayer — tied-embedding vocab projection + bias (`transformer.py:81-124`,
    tying at `:728-729`)
  * ObjPredLayer — 1600-class region classifier (`transformer.py:562-591`)
  * BertPooler + seq_relationship — ITM score from token 0 (`:546-558,712-713`)
  * pooled_layer2 + seq_relationship2 — CLCM score (`:715-716`)
  * mrfr_dense — d -> 2048 feature regression (`:718`)
  * BertPredictionHeadTransform — dense+gelu+LN before the obj classifier
    (`:595-606,721`)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3p_tpu.model.layers import LayerNorm, _dense
from m3p_tpu.ops.activations import gelu_erf

Dtype = Any


class AdaptiveSoftmax(nn.Module):
    """Adaptive softmax (`nn.AdaptiveLogSoftmaxWithLoss` semantics,
    `transformer.py:93-100`): the head scores the ``cutoffs[0]`` most
    frequent words plus one slot per tail cluster; each tail cluster i
    projects down by ``div_value^(i+1)`` before scoring its word range.

    Returns FULL normalized log-probabilities (..., n_words): because they
    are normalized (logsumexp == 0), ``softmax_cross_entropy`` on them equals
    -log p[target] and ``log_softmax`` is the identity — so the output is
    plug-compatible with the dense PredLayer logits everywhere (losses,
    generation, scoring).  Shapes are static; the FLOP savings come from the
    reduced tail projection dims, the TPU-friendly part of ASM.
    """

    n_words: int
    dim: int
    cutoffs: tuple = (8000, 20000)
    div_value: float = 4.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, pd = self.dtype, self.param_dtype
        edges = list(self.cutoffs) + [self.n_words]
        n_clusters = len(edges) - 1
        head = _dense(edges[0] + n_clusters, d, pd, "head",
                      ("embed", "vocab"))(x)
        head_lp = jax.nn.log_softmax(head.astype(jnp.float32), axis=-1)
        parts = [head_lp[..., :edges[0]]]
        for i in range(n_clusters):
            lo, hi = edges[i], edges[i + 1]
            proj_dim = max(int(self.dim / self.div_value ** (i + 1)), 1)
            h = _dense(proj_dim, d, pd, f"tail_{i}_proj",
                       ("embed", None), use_bias=False)(x)
            logits = _dense(hi - lo, d, pd, f"tail_{i}_out",
                            (None, "vocab"), use_bias=False)(h)
            tail_lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            parts.append(head_lp[..., edges[0] + i:edges[0] + i + 1]
                         + tail_lp)
        return jnp.concatenate(parts, axis=-1).astype(d)


class PredLayer(nn.Module):
    """Vocab scores via the (tied) word-embedding matrix + per-word bias.

    ``quant="int8_bwd"`` routes the (tokens, D) x (V, D)^T GEMM — the single
    largest matmul in the MCT step at V=250k — through the v5e int8 MXU
    (2x the bf16 rate), forward and dgrad/wgrad, with straight-through
    gradients (`m3p_tpu.ops.quant.int8_matmul_nt`)."""

    n_words: int
    dim: int
    quant: str = "none"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 embedding: Optional[jax.Array] = None) -> jax.Array:
        """x: (..., D) -> logits (..., n_words).  ``embedding`` is the
        (n_words, D) word table for weight tying; None -> untied projection."""
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(), ("vocab",)),
            (self.n_words,), self.param_dtype)
        use_q8 = False
        if self.quant == "int8_infer" and not self.is_initializing():
            # frozen-weight int8 (inference): the (V, D) table quantizes ONCE
            # into the "q8" collection.  Unlike the FFN/attention GEMMs the
            # vocab head wins at EVERY shape (v5e, tools/bench_prequant.py:
            # 1.11x at decode's M=320, 1.90x at M=83968 — V=250k makes the
            # GEMM large enough that the int8 MXU rate dominates and the
            # activation-quantize pass amortizes), so no M gate here.
            from m3p_tpu.ops.quant import (
                int8_matmul_nt_pre, prequantize_nt)

            x2d = x.reshape(-1, x.shape[-1])
            if embedding is None:
                kernel = self.param(
                    "kernel",
                    nn.with_logical_partitioning(
                        nn.initializers.lecun_normal(), ("embed", "vocab")),
                    (self.dim, self.n_words), self.param_dtype)
                embedding = kernel.T
            table = embedding.astype(self.dtype)
            if (self.is_mutable_collection("q8")
                    and not self.has_variable("q8", "emb_wq")):
                wq, sw = prequantize_nt(table)
                self.put_variable("q8", "emb_wq", wq)
                self.put_variable("q8", "emb_sw", sw)
            use_q8 = self.has_variable("q8", "emb_wq")
            if use_q8:
                logits = int8_matmul_nt_pre(
                    x2d.astype(self.dtype), self.get_variable("q8", "emb_wq"),
                    self.get_variable("q8", "emb_sw"))
                logits = logits.reshape(*x.shape[:-1], self.n_words)
        if use_q8:
            pass
        elif self.quant == "int8_bwd":
            from m3p_tpu.ops.quant import int8_matmul, int8_matmul_nt

            x2d = x.reshape(-1, x.shape[-1])
            if embedding is None:
                kernel = self.param(
                    "kernel",
                    nn.with_logical_partitioning(
                        nn.initializers.lecun_normal(), ("embed", "vocab")),
                    (self.dim, self.n_words), self.param_dtype)
                logits = int8_matmul(x2d, kernel.astype(self.dtype))
            else:
                logits = int8_matmul_nt(x2d, embedding.astype(self.dtype))
            logits = logits.reshape(*x.shape[:-1], self.n_words)
        elif embedding is None:
            kernel = self.param(
                "kernel",
                nn.with_logical_partitioning(
                    nn.initializers.lecun_normal(), ("embed", "vocab")),
                (self.dim, self.n_words), self.param_dtype)
            logits = jnp.einsum("...d,dv->...v", x, kernel.astype(self.dtype))
        else:
            logits = jnp.einsum("...d,vd->...v", x,
                                embedding.astype(self.dtype))
        return logits + bias.astype(self.dtype)


class ObjPredLayer(nn.Module):
    """BertPredictionHeadTransform (dense+gelu+LN) -> Linear(d -> 1600)."""

    n_obj_classes: int
    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = _dense(self.dim, self.dtype, self.param_dtype,
                   "transform_dense", ("embed", None))(x)
        h = gelu_erf(h)
        h = LayerNorm(dtype=self.dtype, name="transform_ln")(h)
        return _dense(self.n_obj_classes, self.dtype, self.param_dtype,
                      "proj", ("embed", None))(h)


class Pooler(nn.Module):
    """BertPooler: dense+tanh over the first token, then a 1-d score head."""

    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jax.Array) -> jax.Array:
        """hidden: (B, S, D) -> score (B, 1)."""
        first = hidden[:, 0]
        pooled = _dense(self.dim, self.dtype, self.param_dtype,
                        "dense", ("embed", None))(first)
        pooled = jnp.tanh(pooled)
        return _dense(1, self.dtype, self.param_dtype,
                      "score", ("embed", None))(pooled)


class MRFRHead(nn.Module):
    """Masked-region feature regression: Linear(d -> 2048)."""

    feat_dim: int = 2048
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _dense(self.feat_dim, self.dtype, self.param_dtype,
                      "dense", ("embed", None))(x)
