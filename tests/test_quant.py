"""int8 quantized matmul: accuracy, gradients, FFN integration."""

import jax
import jax.numpy as jnp
import numpy as np

from m3p_tpu.ops.quant import int8_matmul


def test_int8_matmul_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128), jnp.float32)
    w = jnp.asarray(rng.randn(128, 96) * 0.1, jnp.float32)
    ref = x @ w
    out = int8_matmul(x, w)
    # int8 dynamic quantization: ~1% relative error at these scales
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_matmul_gradients_are_straight_through():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(8, 16), jnp.float32)
    w = jnp.asarray(rng.randn(16, 4), jnp.float32)
    g = jnp.ones((8, 4), jnp.float32)
    _, vjp = jax.vjp(int8_matmul, x, w)
    dx, dw = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(g @ w.T), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(x.T @ g), atol=1e-5)


def test_quant_ffn_param_compatibility():
    """QuantDense must create the same parameter tree as the regular FFN."""
    from m3p_tpu.model.layers import TransformerFFN

    x = jnp.ones((2, 4, 32))
    ffn = TransformerFFN(dim=32, hidden_dim=64, dropout=0.0)
    ffn_q = TransformerFFN(dim=32, hidden_dim=64, dropout=0.0, quant="int8")
    p = ffn.init(jax.random.PRNGKey(0), x)["params"]
    p_q = ffn_q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p) == jax.tree.structure(p_q)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_q)):
        assert a.shape == b.shape
    # quantized forward approximates the exact forward with shared params
    from flax import linen as nn

    p_unboxed = nn.meta.unbox(p)
    out = ffn.apply({"params": p_unboxed}, x)
    out_q = ffn_q.apply({"params": p_unboxed}, x)
    rel = float(jnp.linalg.norm(out_q - out)
                / jnp.maximum(jnp.linalg.norm(out), 1e-6))
    assert rel < 0.05, rel


def test_int8_qbwd_matmul():
    from m3p_tpu.ops.quant import int8_matmul_qbwd

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(32, 24), jnp.float32)
    w = jnp.asarray(rng.randn(24, 16) * 0.2, jnp.float32)
    out = int8_matmul_qbwd(x, w)
    rel = float(jnp.linalg.norm(out - x @ w) / jnp.linalg.norm(x @ w))
    assert rel < 0.02, rel
    g = jnp.asarray(rng.randn(32, 16), jnp.float32)
    _, vjp = jax.vjp(int8_matmul_qbwd, x, w)
    dx, dw = vjp(g)
    rel_dx = float(jnp.linalg.norm(dx - g @ w.T) / jnp.linalg.norm(g @ w.T))
    rel_dw = float(jnp.linalg.norm(dw - x.T @ g) / jnp.linalg.norm(x.T @ g))
    assert rel_dx < 0.03, rel_dx
    assert rel_dw < 0.03, rel_dw


def test_int8_matmul_nt_parity():
    """Transposed-weight int8 GEMM (vocab head): fwd/bwd close to fp32."""
    from m3p_tpu.ops.quant import int8_matmul_nt

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 32), jnp.float32)
    w = jnp.asarray(rng.randn(64, 32), jnp.float32)

    out = int8_matmul_nt(x, w)
    ref = x @ w.T
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel

    def loss_q(x, w):
        return jnp.sum(int8_matmul_nt(x, w) ** 2)

    def loss_f(x, w):
        return jnp.sum((x @ w.T) ** 2)

    gx_q, gw_q = jax.grad(loss_q, argnums=(0, 1))(x, w)
    gx_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(x, w)
    for a, b in ((gx_q, gx_f), (gw_q, gw_f)):
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
        assert rel < 0.12, rel


def test_pred_layer_int8_head():
    """PredLayer quant='int8_bwd' matches the dense head within int8 noise."""
    from m3p_tpu.model.heads import PredLayer

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 3, 32), jnp.float32)
    emb = jnp.asarray(rng.randn(128, 32), jnp.float32)
    dense = PredLayer(n_words=128, dim=32)
    qhead = PredLayer(n_words=128, dim=32, quant="int8_bwd")
    params = dense.init(jax.random.PRNGKey(0), x, emb)
    out_d = dense.apply(params, x, emb)
    out_q = qhead.apply(params, x, emb)
    rel = float(jnp.max(jnp.abs(out_q - out_d))
                / jnp.max(jnp.abs(out_d)))
    assert out_q.shape == (4, 3, 128)
    assert rel < 0.05, rel
