"""int8 dynamic-quantized matmul for the v5e int8 MXU path.

v5e executes int8 matmuls at 2x the bf16 rate; this provides a drop-in
quantized GEMM with AQT-style dynamic scaling — per-row activation scales,
per-column weight scales, int32 accumulation, dequantized output — and a
straight-through-estimator backward (gradients flow through the full-precision
operands, the standard recipe for quantized training).

Measured (v5e, 20992x768x3072): int8 1.74ms vs bf16 2.69ms (same dispatch
overhead) — a ~1.5-2x kernel-level speedup for quantization-tolerant layers.
Enabled per-module via ModelConfig.ffn_quant="int8" (off by default; affects
numerics, documented as a training-mode choice with no reference equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _quantize_rows(x: jax.Array):
    """Per-row symmetric int8: x (..., K) -> (int8, scale (..., 1) f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quantize_cols(w: jax.Array):
    """Per-column symmetric int8: w (K, N) -> (int8, scale (1, N) f32)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """x (..., K) @ w (K, N) through the int8 MXU; returns x.dtype."""
    return _int8_matmul_fwd(x, w)[0]


def _int8_forward(x, w):
    xq, sx = _quantize_rows(x)
    wq, sw = _quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw).astype(x.dtype)


def _int8_matmul_fwd(x, w):
    return _int8_forward(x, w), (x, w)


def _int8_matmul_bwd(res, g):
    # straight-through: full-precision gradients
    x, w = res
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x2d = x.reshape(-1, x.shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(
        x2d, g2d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# ---------------------------------------------------------------------------
# fully-quantized variant: int8 dgrad/wgrad as well (2/3 of GEMM FLOPs are in
# the backward — the fwd-only variant measured perf-neutral end-to-end)
# ---------------------------------------------------------------------------


def _quantize_axis(x: jax.Array, axis: int):
    """Symmetric int8 along ``axis`` (scales on the complementary dims)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-6) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


@jax.custom_vjp
def int8_matmul_qbwd(x: jax.Array, w: jax.Array) -> jax.Array:
    """int8 forward AND int8 dgrad/wgrad (straight-through w.r.t. the
    quantizers).  x must be 2-D (callers flatten leading dims)."""
    return _int8_forward(x, w)


def _int8_qbwd_fwd(x, w):
    return _int8_forward(x, w), (x, w)


def _int8_qbwd_bwd(res, g):
    x, w = res
    # dx[m,k] = sum_n g[m,n] w[k,n] : quantize g per-row, w per-row (axis 1)
    gq, sg = _quantize_axis(g, 1)          # (M,N), scale (M,1)
    wq_r, sw_r = _quantize_axis(w, 1)      # (K,N), scale (K,1)
    dx = jax.lax.dot_general(gq, wq_r, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dx = (dx.astype(jnp.float32) * sg * sw_r.T).astype(x.dtype)
    # dw[k,n] = sum_m x[m,k] g[m,n] : quantize both along the batch dim
    xq_c, sx_c = _quantize_axis(x, 0)      # (M,K), scale (1,K)
    gq_c, sg_c = _quantize_axis(g, 0)      # (M,N), scale (1,N)
    dw = jax.lax.dot_general(xq_c, gq_c, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dw = (dw.astype(jnp.float32) * sx_c.T * sg_c).astype(w.dtype)
    return dx, dw


int8_matmul_qbwd.defvjp(_int8_qbwd_fwd, _int8_qbwd_bwd)


# ---------------------------------------------------------------------------
# transposed-weight variant for the tied vocab head: x (M,K) @ w (N,K)^T
# without materializing w^T (the word embedding stays (V, D) in HBM)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def int8_matmul_nt(x: jax.Array, w: jax.Array) -> jax.Array:
    """x (M, K) @ w (N, K)^T -> (M, N), int8 forward and int8 dgrad/wgrad
    (straight-through quantizers).  Built for the 250k-vocab tied prediction
    head — the single largest GEMM in the MCT step."""
    return _nt_forward(x, w)


def _nt_forward(x, w):
    xq, sx = _quantize_axis(x, 1)          # (M,K), scale (M,1)
    wq, sw = _quantize_axis(w, 1)          # (N,K), scale (N,1)
    acc = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw.T).astype(x.dtype)


def _nt_fwd(x, w):
    return _nt_forward(x, w), (x, w)


def _nt_bwd(res, g):
    x, w = res
    # dx[m,k] = sum_n g[m,n] w[n,k]
    gq, sg = _quantize_axis(g, 1)          # (M,N), scale (M,1)
    wq_c, sw_c = _quantize_axis(w, 0)      # (N,K), scale (1,K)
    dx = jax.lax.dot_general(gq, wq_c, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dx = (dx.astype(jnp.float32) * sg * sw_c).astype(x.dtype)
    # dw[n,k] = sum_m g[m,n] x[m,k]
    gq_c, sg_c = _quantize_axis(g, 0)      # (M,N), scale (1,N)
    xq_c, sx_c = _quantize_axis(x, 0)      # (M,K), scale (1,K)
    dw = jax.lax.dot_general(gq_c, xq_c, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dw = (dw.astype(jnp.float32) * sg_c.T * sx_c).astype(w.dtype)
    return dx, dw


int8_matmul_nt.defvjp(_nt_fwd, _nt_bwd)


# ---------------------------------------------------------------------------
# frozen-weight (pre-quantized) inference variants: at inference the weights
# never change, so their quantization hoists OUT of the hot loop entirely —
# the hot path pays only the activation quantization, the int8 MXU GEMM
# (2x bf16 on v5e) reads HALF the weight HBM bytes.  Training measured
# per-step weight quantization as a dead-end for attention/vocab-head GEMMs
# (STATUS.md); these exist because eval/serving don't pay that cost.
# Inference-only: no custom_vjp.
# ---------------------------------------------------------------------------


# Engage pre-quantized GEMMs only below this (static) row count.  Measured
# on v5e (tools/bench_prequant.py): at eval-grid shapes (M=83968) int8 is
# neutral-to-worse (ffn1 1.11x, qkv 1.00x, ffn2 0.74x — the activation
# quantize/dequant HBM passes eat the MXU gain on compute-bound GEMMs);
# at decode shapes (M=320, weight-HBM-bound) it wins modestly (head 1.11x)
# and halves the weight bytes read.  Above the threshold the int8_infer
# modules fall back to the plain bf16 GEMM, so the mode never regresses.
PREQUANT_MAX_M = 2048


def prequantize_nn(w: jax.Array):
    """One-time weight quantization for ``int8_matmul_pre``: w (K, N) ->
    (int8 (K, N), f32 scale (1, N))."""
    return _quantize_cols(w)


def prequantize_nt(w: jax.Array):
    """One-time weight quantization for ``int8_matmul_nt_pre``: w (V, K) ->
    (int8 (V, K), f32 scale (V, 1))."""
    return _quantize_axis(w, 1)


def int8_matmul_pre(x: jax.Array, wq: jax.Array, sw: jax.Array) -> jax.Array:
    """x (..., K) @ dequant(wq (K, N), sw (1, N)); per-row dynamic activation
    quantization.  Bit-identical to ``int8_matmul(x, w)`` for the same w."""
    xq, sx = _quantize_rows(x)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw).astype(x.dtype)


def int8_matmul_nt_pre(x: jax.Array, wq: jax.Array,
                       sw: jax.Array) -> jax.Array:
    """x (M, K) @ dequant(wq (V, K), sw (V, 1))^T -> (M, V).  Bit-identical
    to ``int8_matmul_nt(x, w)`` for the same w (the tied vocab head: the
    (V, K) int8 table halves the dominant HBM read of every decode step)."""
    xq, sx = _quantize_axis(x, 1)
    acc = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * sx * sw.T).astype(x.dtype)
