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


class PredLayer(nn.Module):
    """Vocab scores via the (tied) word-embedding matrix + per-word bias."""

    n_words: int
    dim: int
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
        if embedding is None:
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
