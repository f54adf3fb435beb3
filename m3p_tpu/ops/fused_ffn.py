"""Fused encoder FFN sub-block: LN2(x + b2 + gelu(x@W1 + b1)@W2).

One Pallas kernel per M-tile computes the whole post-attention half of an
encoder block (`model/layers.py` EncoderBlock: ``x = ln2(x + ffn(x))``,
reference `transformer.py:842-864`): both FFN GEMMs ride the MXU with f32
accumulation from bf16 operands, and the gelu / residual / LayerNorm ride
the VPU on the f32 accumulators while they are still in VMEM — the (M, H)
hidden activation and the pre-LN sum are never written to HBM (XLA
materializes the bf16 hidden between its two GEMM fusions: 2 x M x H x 2
bytes of HBM traffic per layer it never pays here).

This is the round-3 timeboxed "fused encoder block" attempt the round-2
profile called for; see tools/bench_fused_ffn.py for the measured verdict
against the XLA lowering at the bench operating point.

Weights are loaded whole per kernel instance (W1 + W2 = 9 MiB bf16 at
768/3072) with constant index maps, so Mosaic keeps them resident in VMEM
across the M-tile grid instead of re-streaming them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from m3p_tpu.ops.activations import gelu_erf

DEFAULT_TM = 512


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, beta_ref, o_ref,
            *, eps: float):
    x = x_ref[:]                                          # (TM, D) bf16
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = gelu_erf(h + b1_ref[:].astype(jnp.float32))       # (TM, H) f32, VMEM
    y = jnp.dot(h.astype(x.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32) + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + eps)
    out = out * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tm"))
def fused_ffn_ln(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
                 b2: jax.Array, gamma: jax.Array, beta: jax.Array,
                 eps: float = 1e-12, tm: int = DEFAULT_TM) -> jax.Array:
    """x: (M, D); w1: (D, H); w2: (H, D).  Returns LN(x + FFN(x)), (M, D).

    Rows are tiled at ``tm``; a ragged final tile is handled by Pallas block
    padding (LayerNorm is per-row, so padded rows never leak into real ones).
    """
    m, d = x.shape
    h = w1.shape[1]
    grid = (pl.cdiv(m, tm),)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * h,
            bytes_accessed=(m * d * 2 * x.dtype.itemsize
                            + 2 * d * h * w1.dtype.itemsize),
            transcendentals=m * h,
        ),
    )(x, w1, b1, w2, b2, gamma, beta)


def reference_ffn_ln(x, w1, b1, w2, b2, gamma, beta, eps=1e-12):
    """The XLA lowering of the same computation (parity + bench baseline)."""
    h = gelu_erf(jnp.dot(x, w1, preferred_element_type=jnp.float32)
                 + b1.astype(jnp.float32))
    y = jnp.dot(h.astype(x.dtype), w2, preferred_element_type=jnp.float32)
    y = y + b2.astype(jnp.float32) + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + eps)
    return (out * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32)).astype(x.dtype)
