"""Isolated small-kernel attention-dropout benchmark (VERDICT r4 item 1).

Measures the op grad (loss -> dq,dk,dv wall time) at the flagship shape
B=80, H=12, S=164, D=64 for:

  * xla_rate0       — XLA attention, no dropout (the 2.44 ms anchor)
  * xla_mask        — XLA attention + explicit (B,H,S,S) mask dropout
  * small_rate0     — single-tile Pallas kernel, no dropout
  * small_drop      — single-tile Pallas kernel, in-kernel PRNG dropout

The last ~2% of the >=5x headline at attention_dropout 0.1 lives in
small_drop minus xla_rate0 (~0.39 ms x 12 layers at round 4); kernel
variants are evaluated here before they touch ops/attention.py.
"""
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import importlib

A = importlib.import_module("m3p_tpu.ops.attention")

B = int(_os.environ.get("SD_BATCH", 80))
H = int(_os.environ.get("SD_HEADS", 12))
S = int(_os.environ.get("SD_SEQ", 164))
D = int(_os.environ.get("SD_DIM", 64))
RATE = float(_os.environ.get("SD_RATE", 0.1))
WARMUP, STEPS = 5, 50


def timeit(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.perf_counter() - t0) / STEPS * 1e3  # ms


def main():
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    mask = jnp.ones((B, S), bool)
    scale = 1.0 / (D ** 0.5)
    seed = jnp.asarray(1234, jnp.int32)
    key = jax.random.key(0, impl="rbg")

    def grad_of(loss):
        g = jax.jit(jax.grad(lambda qkv: loss(*qkv)))
        return lambda: g((q, k, v))

    def xla_rate0(q, k, v):
        out = A.mha_reference(q, k, v, mask, sm_scale=scale)
        return jnp.sum(out.astype(jnp.float32))

    def xla_mask(q, k, v):
        # the layers.py off-TPU fallback: explicit (B,H,S,S) keep mask
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
        w = jax.nn.softmax(scores, axis=-1)
        keep = jax.random.bernoulli(key, 1.0 - RATE, w.shape)
        w = jnp.where(keep, w / (1.0 - RATE), 0.0)
        out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)
        return jnp.sum(out.astype(jnp.float32))

    def small_rate0(q, k, v):
        out = A._attention_pallas_small(q, k, v, mask, None, False, scale,
                                        0.0, False)
        return jnp.sum(out.astype(jnp.float32))

    def small_drop(q, k, v):
        out = A._attention_pallas_small(q, k, v, mask, seed, False, scale,
                                        RATE, False)
        return jnp.sum(out.astype(jnp.float32))

    for name, loss in [("xla_rate0", xla_rate0), ("xla_mask", xla_mask),
                       ("small_rate0", small_rate0),
                       ("small_drop", small_drop)]:
        try:
            ms = timeit(grad_of(loss))
            print(f"{name:14s} {ms:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
