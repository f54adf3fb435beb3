"""Auxiliary model surface: BiDAF-style image-text fusion and the latent
(VAE) transforms.

Reference components kept for capability parity (`/root/reference/M3P/src/
model/transformer.py:425-543`): `CrossAlignMatrix` (used under the
``image_fusion`` flag in crossfwd) and `VaeEncoder`/`LatentDecoder` (the
``is_latent`` joint-space path).  They are available to compose with the main
model but are not part of the default forward topologies.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from m3p_tpu.model.layers import LayerNorm, _dense

Dtype = Any


class CrossAlignMatrix(nn.Module):
    """BiDAF-style context-to-query attention fusing image features into the
    text stream (`transformer.py:425-473`): similarity
    s_ij = w_c·c_i + w_q·q_j + w_cq·(c_i ∘ q_j), clamped to ±15, softmax over
    the query (image) axis, output projected."""

    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c: jax.Array, q: jax.Array,
                 q_mask: Optional[jax.Array] = None) -> jax.Array:
        """c: (B, Sc, D) text; q: (B, Sq, D) image; q_mask: (B, Sq)."""
        d, pd = self.dtype, self.param_dtype
        w_c = _dense(1, d, pd, "att_weight_c", ("embed", None))
        w_q = _dense(1, d, pd, "att_weight_q", ("embed", None))
        # elementwise term: w_cq · (c_i ∘ q_j) == ((c ∘ w_cq) @ q^T)
        cq = jnp.einsum("bcd,bqd->bcq", c * self._cq_weight(d, pd), q)
        s = w_c(c) + jnp.swapaxes(w_q(q), 1, 2) + cq
        s = jnp.clip(s, -15.0, 15.0)
        if q_mask is not None:
            s = jnp.where(q_mask[:, None, :], s,
                          jnp.finfo(jnp.float32).min * 0.7)
        a = jax.nn.softmax(s.astype(jnp.float32), axis=2).astype(c.dtype)
        fused = jnp.einsum("bcq,bqd->bcd", a, q)
        return _dense(self.dim, d, pd, "align_output",
                      ("embed", None))(fused)

    def _cq_weight(self, d, pd):
        w = self.param("cq_weight",
                       nn.initializers.lecun_normal(), (self.dim, 1), pd)
        return w[:, 0].astype(d)


class VaeEncoder(nn.Module):
    """Reparameterized latent transform (`transformer.py:500-528`)."""

    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array, rng: Optional[jax.Array],
                 deterministic: bool = True
                 ) -> Tuple[jax.Array, Optional[jax.Array]]:
        d, pd = self.dtype, self.param_dtype
        mu = _dense(self.dim, d, pd, "x_to_mu", ("embed", None))(x)
        if deterministic or rng is None:
            z = mu
            kld = None
        else:
            logvar = _dense(self.dim, d, pd, "x_to_logvar",
                            ("embed", None))(x)
            eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)
            kld = -0.5 * jnp.sum(
                1 + logvar - mu.astype(jnp.float32) ** 2
                - jnp.exp(logvar.astype(jnp.float32)), axis=-1)
        out = _dense(self.dim, d, pd, "out_dense", (None, "embed"))(
            jnp.concatenate([z, c], axis=-1))
        return out, kld


class LatentDecoder(nn.Module):
    """dense -> dense -> LN -> tanh reconstruction head
    (`transformer.py:530-543`)."""

    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, pd = self.dtype, self.param_dtype
        h = _dense(self.dim, d, pd, "dense", ("embed", None))(x)
        h = _dense(self.dim, d, pd, "dense_mu", ("embed", None))(h)
        h = LayerNorm(dtype=d, name="ln")(h)
        return jnp.tanh(h)
