"""On-chip microbench: bf16 vs dynamic-int8 vs PRE-quantized int8 GEMMs at
the inference hot shapes.

Hypothesis: training measured int8 attention/vocab-head as dead-ends because
weights are re-quantized every step; at inference the weights are FROZEN, so
quantizing them ONCE outside the loop leaves only the activation quantization
in the hot path — and on v5e the int8 MXU runs 2x bf16, with half the weight
HBM traffic (decisive for the skinny-M decode GEMM against the 250k x 768
tied vocab head).

Shapes measured:
  * ffn1   (83968, 768)  @ (768, 3072)    eval-grid FFN up-proj (512 pairs x 164)
  * ffn2   (83968, 3072) @ (3072, 768)    eval-grid FFN down-proj
  * qkv    (83968, 768)  @ (768, 2304)    fused self-attention projections
  * head   (320, 768)    @ (250002, 768)^T   beam decode vocab logits (B=64 x beam 5)
"""
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def _time(fn, *args, reps=20):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])   # sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from m3p_tpu.ops.quant import (
        _quantize_axis, _quantize_cols, _quantize_rows)

    rng = np.random.RandomState(0)

    def run_nn(name, m, k, n):
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n) * 0.02, jnp.bfloat16)

        @jax.jit
        def bf16(x, w):
            return (x @ w).sum()

        @jax.jit
        def dyn(x, w):
            xq, sx = _quantize_rows(x)
            wq, sw = _quantize_cols(w)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return ((acc.astype(jnp.float32) * sx * sw)
                    .astype(jnp.bfloat16).sum())

        wq, sw = jax.jit(_quantize_cols)(w)

        @jax.jit
        def pre(x, wq, sw):
            xq, sx = _quantize_rows(x)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return ((acc.astype(jnp.float32) * sx * sw)
                    .astype(jnp.bfloat16).sum())

        t_bf = _time(bf16, x, w)
        t_dyn = _time(dyn, x, w)
        t_pre = _time(pre, x, wq, sw)
        print(f"{name:5s} ({m}x{k}x{n}): bf16 {t_bf:6.2f} ms | "
              f"dyn-int8 {t_dyn:6.2f} ms | pre-int8 {t_pre:6.2f} ms "
              f"({t_bf / t_pre:.2f}x vs bf16)")

    def run_nt(name, m, k, v):
        """x (M,K) @ w (V,K)^T — the tied vocab head."""
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(v, k) * 0.02, jnp.bfloat16)

        @jax.jit
        def bf16(x, w):
            return jax.lax.dot_general(
                x, w, (((1,), (1,)), ((), ()))).sum()

        wq, sw = jax.jit(lambda w: _quantize_axis(w, 1))(w)

        @jax.jit
        def pre(x, wq, sw):
            xq, sx = _quantize_axis(x, 1)
            acc = jax.lax.dot_general(xq, wq, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return ((acc.astype(jnp.float32) * sx * sw.T)
                    .astype(jnp.bfloat16).sum())

        t_bf = _time(bf16, x, w)
        t_pre = _time(pre, x, wq, sw)
        print(f"{name:5s} ({m}x{k}x{v}^T): bf16 {t_bf:6.2f} ms | "
              f"pre-int8 {t_pre:6.2f} ms ({t_bf / t_pre:.2f}x vs bf16)")

    print(f"backend: {jax.default_backend()}")
    run_nn("ffn1", 83968, 768, 3072)
    run_nn("ffn2", 83968, 3072, 768)
    run_nn("qkv", 83968, 768, 2304)
    run_nt("head", 320, 768, 250002)
    run_nt("headL", 83968, 768, 250002)


if __name__ == "__main__":
    main()
