"""Isolated flash-attention op benchmark: fwd+bwd wall time vs XLA attention
at long sequence, sweeping Pallas block sizes.

The full-model long-seq bench (tools/bench_longseq.py) showed XLA ahead of
the flash path end-to-end at S=2048 when memory fits; this isolates the
attention op itself (jit'd loss -> grad) so block-size effects are visible
without a 12L compile per point.
"""
import functools
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import importlib

A = importlib.import_module("m3p_tpu.ops.attention")

B = int(_os.environ.get("FB_BATCH", 4))
H = int(_os.environ.get("FB_HEADS", 12))
S = int(_os.environ.get("FB_SEQ", 2048))
D = int(_os.environ.get("FB_DIM", 64))
CAUSAL = bool(int(_os.environ.get("FB_CAUSAL", 0)))
WARMUP, STEPS = 3, 20


def timeit(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / STEPS * 1e3  # ms


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    mask = jnp.ones((B, S), bool)
    scale = 1.0 / (D ** 0.5)

    def pallas_loss(q, k, v, bq, bk):
        out, l_res, m_res = A.flash_attention(
            q, k, v, mask, causal=CAUSAL, sm_scale=scale,
            block_q=bq, block_k=bk, return_residuals=True)
        return out, l_res, m_res

    def pallas_fwdbwd(q, k, v, bq, bk):
        out, l_res, m_res = pallas_loss(q, k, v, bq, bk)
        do = out  # arbitrary cotangent of matching dtype/shape
        return A.flash_attention_bwd(q, k, v, mask, out, l_res, m_res, do,
                                     causal=CAUSAL, sm_scale=scale,
                                     block_q=bq, block_k=bk)

    def xla_fwdbwd(q, k, v):
        def loss(q, k, v):
            o = A.mha_reference(q, k, v, mask, causal=CAUSAL, sm_scale=scale)
            return jnp.sum(o.astype(jnp.float32) * o.astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    t_xla = timeit(jax.jit(xla_fwdbwd), q, k, v)
    print(f"xla fwd+bwd: {t_xla:.2f} ms", flush=True)

    for bq, bk in [(128, 128), (256, 128), (128, 256), (256, 256),
                   (512, 256), (256, 512), (512, 512), (1024, 512)]:
        if bq > S or bk > S:
            continue
        try:
            f = jax.jit(functools.partial(pallas_fwdbwd, bq=bq, bk=bk))
            t = timeit(f, q, k, v)
            # separate fwd-only timing
            ffwd = jax.jit(functools.partial(pallas_loss, bq=bq, bk=bk))
            tf = timeit(ffwd, q, k, v)
            print(f"pallas bq={bq} bk={bk}: fwd+bwd {t:.2f} ms "
                  f"(fwd {tf:.2f} ms)  vs xla {t_xla:.2f}", flush=True)
        except Exception as e:
            print(f"pallas bq={bq} bk={bk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
