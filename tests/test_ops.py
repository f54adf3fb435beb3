"""Pallas flash-attention kernel vs the fp32 XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.ops.attention import flash_attention, mha_reference


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 2, 96, 64
    q = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    mask = jnp.array(np.arange(S)[None, :] < np.array([96, 57])[:, None])
    return q, k, v, mask


def test_flash_matches_reference(qkv):
    q, k, v, mask = qkv
    ref = mha_reference(q, k, v, mask)
    out = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_causal(qkv):
    q, k, v, mask = qkv
    ref = mha_reference(q, k, v, mask, causal=True)
    out = flash_attention(q, k, v, mask, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_decode_shape(qkv):
    """Single-query decode against a longer KV (diagonal aligned at the end)."""
    q, k, v, mask = qkv
    q1 = q[:, :, -1:, :]
    ref = mha_reference(q1, k, v, mask, causal=True)
    out = flash_attention(q1, k, v, mask, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_reference_padding_rows_ignore_masked_keys():
    """Scores of masked keys must not leak into valid queries."""
    rng = np.random.RandomState(1)
    B, H, S, D = 1, 1, 8, 4
    q = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    mask = jnp.array(np.arange(S)[None, :] < 5)
    out1 = mha_reference(q, k, v, mask)
    k2 = k.at[:, :, 5:].set(99.0)
    v2 = v.at[:, :, 5:].set(-99.0)
    out2 = mha_reference(q, k2, v2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_flash_bwd_matches_xla(qkv):
    """Fused Pallas dq/dkv kernels vs XLA autodiff (interpret mode)."""
    from m3p_tpu.ops.attention import flash_attention_bwd

    q, k, v, mask = qkv

    for causal in (False, True):
        out, l_res, m_res = flash_attention(q, k, v, mask, causal=causal,
                                            interpret=True,
                                            return_residuals=True)
        g = jnp.ones_like(out) * 0.1
        dq, dk, dv = flash_attention_bwd(q, k, v, mask, out, l_res, m_res, g,
                                         causal=causal, interpret=True)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: mha_reference(q_, k_, v_, mask, causal=causal),
            q, k, v)
        dq_r, dk_r, dv_r = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_r),
                                   atol=2e-5, err_msg=f"dq causal={causal}")
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                                   atol=2e-5, err_msg=f"dk causal={causal}")
        np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_r),
                                   atol=2e-5, err_msg=f"dv causal={causal}")


def test_attention_bshd_matches_bhsd():
    """Batch-major attention (no head transpose) matches mha_reference in
    both masked and causal modes."""
    import numpy as np
    import jax.numpy as jnp
    from m3p_tpu.ops.attention import mha_reference, mha_reference_bshd

    rng = np.random.RandomState(0)
    B, H, S, D = 2, 3, 10, 8
    q = rng.randn(B, H, S, D).astype(np.float32)
    k = rng.randn(B, H, S, D).astype(np.float32)
    v = rng.randn(B, H, S, D).astype(np.float32)
    mask = rng.rand(B, S) > 0.3
    mask[:, 0] = True
    for causal in (False, True):
        ref = mha_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(mask), causal=causal)
        out = mha_reference_bshd(
            jnp.asarray(q.transpose(0, 2, 1, 3)),
            jnp.asarray(k.transpose(0, 2, 1, 3)),
            jnp.asarray(v.transpose(0, 2, 1, 3)),
            jnp.asarray(mask), causal=causal)
        np.testing.assert_allclose(np.asarray(out.transpose(0, 2, 1, 3)),
                                   np.asarray(ref), atol=1e-6)


def test_flash_bwd_bf16_parity():
    """bf16 operands (the training dtype): the fused backward's bf16-GEMM
    formulation must match autodiff-through-reference within bf16 noise."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from m3p_tpu.ops.attention import (_attention_pallas, mha_reference)

    rng = np.random.RandomState(3)
    B, H, S, D = 1, 2, 16, 8
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.bfloat16)
    mask = jnp.ones((B, S), bool)
    scale = 1.0 / (D ** 0.5)

    def loss_pallas(q, k, v):
        return jnp.sum(_attention_pallas(q, k, v, mask, None, False, scale,
                                         0.0, True).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, mask,
                                     sm_scale=scale).astype(jnp.float32) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_p, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.15, rtol=0.1,
                                   err_msg=f"d{name}")


# ---------------------------------------------------------------------------
# Small-sequence fused kernel (interpret mode; dropout paths are TPU-only —
# see tests/test_flash_dropout.py)
# ---------------------------------------------------------------------------


def test_small_attention_matches_reference(qkv):
    from m3p_tpu.ops.attention import small_attention

    q, k, v, mask = qkv
    ref = mha_reference(q, k, v, mask)
    out = small_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    ref_c = mha_reference(q, k, v, mask, causal=True)
    out_c = small_attention(q, k, v, mask, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               atol=2e-5)


def test_small_attention_vjp_matches_xla(qkv):
    """The single-call recompute backward against XLA autodiff, including a
    cross-attention shape (sq != sk) and the masked tail."""
    from m3p_tpu.ops.attention import _attention_pallas_small

    q, k, v, mask = qkv
    scale = 1.0 / (q.shape[-1] ** 0.5)
    for sq_slice in (slice(None), slice(0, 32)):   # self- and cross-shape
        qs = q[:, :, sq_slice]
        g = jnp.asarray(np.random.RandomState(3).randn(*qs.shape),
                        jnp.float32)

        def loss_small(q_, k_, v_):
            return jnp.sum(_attention_pallas_small(
                q_, k_, v_, mask, None, False, scale, 0.0, True) * g)

        def loss_ref(q_, k_, v_):
            return jnp.sum(mha_reference(q_, k_, v_, mask, causal=False,
                                         sm_scale=scale) * g)

        gs = jax.grad(loss_small, argnums=(0, 1, 2))(qs, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qs, k, v)
        for name, a, b in zip("dq dk dv".split(), gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, err_msg=name)


@pytest.mark.parametrize("shape,dtype", [
    ((2, 16, 512, 512, 64), jnp.float32),    # fp32 many-head full tile
    ((2, 24, 384, 384, 64), jnp.bfloat16),   # head count forcing group split
    ((1, 12, 512, 512, 128), jnp.float32),   # wide head dim
])
def test_small_attention_dispatch_extremes(shape, dtype):
    """Shapes at the edge of the `_small_fits` gate (length-only since the
    VMEM bound moved into `_small_heads_per_block`): fwd parity and a finite
    recompute backward, so the dispatch predicate can never admit a shape the
    kernel mishandles."""
    from m3p_tpu.ops.attention import (_small_fits, small_attention,
                                       small_attention_bwd)

    b, h, sq, sk, d = shape
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, sq, d), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, sk, d), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, sk, d), dtype)
    mask = jnp.ones((b, sk), jnp.int32).at[:, -7:].set(0)
    assert _small_fits(q.shape, k.shape)
    out = small_attention(q, k, v, mask, interpret=True)
    ref = mha_reference(q, k, v, mask)
    atol = 5e-2 if dtype == jnp.bfloat16 else 1e-4
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=atol)
    do = jax.random.normal(jax.random.PRNGKey(3), out.shape, dtype)
    grads = small_attention_bwd(q, k, v, mask, do, interpret=True)
    for name, g_arr in zip("dq dk dv".split(), grads):
        assert bool(jnp.isfinite(g_arr.astype(jnp.float32)).all()), name
