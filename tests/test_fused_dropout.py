"""Fused dropout kernels: distribution, determinism, vjp.

The TPU hardware PRNG (pltpu.prng_seed/prng_random_bits) has no CPU interpret
lowering, so the kernel tests only run on a TPU backend (they were validated
on-chip; see ops/dropout.py docstring).  The dispatcher fallback test runs
everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.ops.dropout import dropout_add, dropout_scale, fused_dropout_add

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="TPU hardware PRNG required")


@tpu_only

def test_dropout_add_interpret():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 32, 128) + 3.0, jnp.float32)
    res = jnp.zeros_like(x)
    seed = jnp.asarray(7, jnp.int32)
    out = dropout_add(x, res, seed, 0.25)
    kept = np.asarray(jnp.abs(out) > 1e-8)
    assert 0.6 < kept.mean() < 0.9          # ~0.75 keep rate
    np.testing.assert_allclose(np.asarray(out)[kept],
                               (np.asarray(x) / 0.75)[kept], rtol=1e-5)
    # deterministic per seed
    out2 = dropout_add(x, res, seed, 0.25)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = dropout_add(x, res, jnp.asarray(8, jnp.int32), 0.25)
    assert (np.asarray(out) != np.asarray(out3)).any()


@tpu_only
def test_dropout_add_vjp_interpret():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 128) + 3.0, jnp.float32)
    res = jnp.zeros_like(x)
    seed = jnp.asarray(3, jnp.int32)
    out, vjp = jax.vjp(lambda x_, r_: dropout_add(x_, r_, seed, 0.5),
                       x, res)
    g = jnp.full_like(out, 2.0)
    dx, dres = vjp(g)
    kept = np.asarray(jnp.abs(out) > 1e-8)
    # bwd regenerates the identical mask from the seed
    np.testing.assert_array_equal(np.asarray(jnp.abs(dx) > 1e-8), kept)
    np.testing.assert_allclose(np.asarray(dx)[kept], 4.0, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dres), np.asarray(g))


@tpu_only
def test_dropout_scale():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 128) + 3.0, jnp.float32)
    out = dropout_scale(x, jnp.asarray(1, jnp.int32), 0.5)
    kept = np.asarray(jnp.abs(out) > 1e-8)
    np.testing.assert_allclose(np.asarray(out)[kept],
                               (np.asarray(x) * 2.0)[kept], rtol=1e-5)


def test_dispatcher_fallbacks():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 128) + 3.0, jnp.float32)
    res = jnp.ones_like(x)
    # deterministic path is a plain add
    out_det = fused_dropout_add(x, res, 0, 0.5, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_det), np.asarray(x + res))
    # CPU fallback uses jax PRNG
    out = fused_dropout_add(x, res, 3, 0.5)
    kept = np.asarray(jnp.abs(out - res) > 1e-8)
    assert 0.2 < kept.mean() < 0.8
