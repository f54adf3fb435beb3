"""Ring attention: sequence-parallel attention over a mesh axis.

The reference never scales sequence length (hard cap 514, SURVEY.md §5.7); the
scale-up configs require context parallelism.  This implements ring attention
(the bandwidth-optimal scheme): K/V blocks rotate around the mesh axis via
`jax.lax.ppermute` (point-to-point over ICI neighbors) while each device
accumulates online-softmax statistics for its local queries — communication
overlaps compute, total traffic equals one all-gather but never materializes
the full K/V on any chip.

Usage: call INSIDE `shard_map` with q/k/v sharded on the sequence axis:

    out = shard_map(
        lambda q, k, v, m: ring_attention(q, k, v, m, axis_name="seq"),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None),) * 3 + (P(None, "seq"),),
        out_specs=P(None, None, "seq", None),
    )(q, k, v, kv_mask)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from m3p_tpu.ops.attention import DEFAULT_MASK_VALUE


def ring_attention(
    q: jax.Array,                  # (B, H, Sq_local, D) local query block
    k: jax.Array,                  # (B, H, Sk_local, D) local key block
    v: jax.Array,                  # (B, H, Sk_local, D)
    kv_mask: Optional[jax.Array],  # (B, Sk_local) local key validity
    axis_name: str,
    causal: bool = False,
    sm_scale: Optional[float] = None,
) -> jax.Array:
    """Blockwise attention with ring-rotated K/V; numerically equal to full
    attention over the gathered sequence."""
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / (d ** 0.5)
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, h, sq, _ = q.shape
    sk = k.shape[2]

    if kv_mask is None:
        kv_mask = jnp.ones((b, sk), bool)

    q_pos = my_idx * sq + jnp.arange(sq)                       # global q rows

    # mark the accumulators as varying over the ring axis so the fori_loop
    # carry types match (shard_map vma tracking)
    def _vary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    m0 = _vary(jnp.full((b, h, sq, 1), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, sq, 1), jnp.float32))
    o0 = _vary(jnp.zeros((b, h, sq, d), jnp.float32))

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(step, carry):
        o, m, l, kb, vb, maskb = carry
        src = (my_idx - step) % n                               # block origin
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kb,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(maskb[:, None, None, :], s, DEFAULT_MASK_VALUE)
        if causal:
            k_pos = src * sk + jnp.arange(sk)
            allowed = k_pos[None, :] <= q_pos[:, None]          # (sq, sk)
            s = jnp.where(allowed[None, None], s, DEFAULT_MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o = alpha * o + jnp.einsum("bhqk,bhkd->bhqd", p.astype(vb.dtype), vb
                                   ).astype(jnp.float32)

        # rotate K/V/mask to the next device (skipped after the last block)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        maskb = jax.lax.ppermute(maskb, axis_name, perm)
        return o, m_new, l, kb, vb, maskb

    o, m, l, _, _, _ = jax.lax.fori_loop(
        0, n, body, (o0, m0, l0, k, v, kv_mask))
    l = jnp.where(l == 0.0, 1.0, l)
    return (o / l).astype(q.dtype)
