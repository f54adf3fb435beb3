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


# ---------------------------------------------------------------------------
# frozen-weight int8 inference (the "q8" collection)
# ---------------------------------------------------------------------------


def test_prequant_matmul_bit_identical_to_dynamic():
    """Hoisting the weight quantization must not change a single bit."""
    from m3p_tpu.ops.quant import (
        int8_matmul, int8_matmul_nt, int8_matmul_nt_pre, int8_matmul_pre,
        prequantize_nn, prequantize_nt)

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(6, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 24) * 0.1, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(int8_matmul_pre(x, *prequantize_nn(w))),
        np.asarray(int8_matmul(x, w)))
    wt = jnp.asarray(rng.randn(50, 32) * 0.1, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(int8_matmul_nt_pre(x, *prequantize_nt(wt))),
        np.asarray(int8_matmul_nt(x, wt)))


def _tiny_infer_models():
    from m3p_tpu.config import ModelConfig
    from m3p_tpu.model import build_model, quantized_inference_model

    cfg = ModelConfig(
        n_words=120, mask_index=119, n_langs=2, emb_dim=32, n_layers=2,
        n_dec_layers=2, n_heads=2, dropout=0.0, attention_dropout=0.0,
        max_region_num=3, refine_layers=1, dtype="float32",
        use_pallas_attention=False)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    qmodel = quantized_inference_model(cfg)
    return cfg, model, qmodel, params


def test_capture_q8_and_joint_forward():
    """q8-provided apply == dynamic-int8 apply exactly; both track fp32."""
    from m3p_tpu.model import capture_q8

    cfg, model, qmodel, params = _tiny_infer_models()
    q8 = capture_q8(qmodel, params)
    # the tied vocab table and at least one FFN + attention table captured
    leaves = jax.tree.leaves(q8)
    assert any(a.dtype == jnp.int8 for a in leaves)
    assert "pred_layer" in q8

    rng = np.random.RandomState(3)
    b, s, r = 2, 5, 3
    tokens = jnp.asarray(rng.randint(4, 100, (b, s)), jnp.int32)
    tmask = jnp.ones((b, s), bool)
    feats = jnp.asarray(rng.randn(b, r, 2048), jnp.float32)
    locs = jnp.asarray(rng.rand(b, r, 5), jnp.float32)
    imask = jnp.ones((b, r), bool)
    args = (tokens, tmask, feats, locs, imask, True)

    h_fp = model.apply({"params": params}, *args, method=model.encode_joint)
    # without a q8 collection the int8_infer model falls back to the plain
    # GEMMs — identical computation to the unquantized model
    h_dyn = qmodel.apply({"params": params}, *args,
                         method=qmodel.encode_joint)
    np.testing.assert_allclose(np.asarray(h_dyn), np.asarray(h_fp),
                               atol=1e-5, rtol=1e-4)
    h_q8 = qmodel.apply({"params": params, "q8": q8}, *args,
                        method=qmodel.encode_joint)
    rel = float(jnp.linalg.norm(h_q8 - h_fp) / jnp.linalg.norm(h_fp))
    assert 0 < rel < 0.05, rel  # int8 engaged (skinny shapes) and accurate

    # vocab head through the pre-quantized tied table
    lg_fp = model.apply({"params": params}, h_fp[:, 0],
                        method=model.word_logits)
    lg_q8 = qmodel.apply({"params": params, "q8": q8}, h_fp[:, 0],
                         method=qmodel.word_logits)
    rel = float(jnp.linalg.norm(lg_q8 - lg_fp) / jnp.linalg.norm(lg_fp))
    assert rel < 0.05, rel


def test_q8_beam_search_and_grid_scores():
    """Generation + eval-grid entry points accept the q8 variables dict."""
    from m3p_tpu.eval.retrieval import retrieval_grid_scores
    from m3p_tpu.model import capture_q8
    from m3p_tpu.model.generation import beam_search

    cfg, model, qmodel, params = _tiny_infer_models()
    q8 = capture_q8(qmodel, params)
    variables = {"params": params, "q8": q8}

    rng = np.random.RandomState(4)
    src = jnp.asarray(rng.randn(2, 4, cfg.emb_dim), jnp.float32)
    smask = jnp.ones((2, 4), bool)
    toks, lens = beam_search(qmodel, variables, src, smask, beam_size=2,
                             max_len=6, tgt_lang_id=0)
    assert toks.shape == (2, 6) and lens.shape == (2,)

    n_cap, n_img, r = 4, 3, 3
    cap_tokens = np.asarray(rng.randint(4, 100, (n_cap, 5)), np.int32)
    cap_len = np.full((n_cap,), 5, np.int32)
    img_feats = rng.randn(n_img, r, 2048).astype(np.float32)
    img_locs = rng.rand(n_img, r, 5).astype(np.float32)
    img_len = np.full((n_img,), r, np.int32)
    grid_q8 = retrieval_grid_scores(qmodel, variables, cap_tokens, cap_len,
                                    img_feats, img_locs, img_len,
                                    chunk_size=4)
    grid_fp = retrieval_grid_scores(model, params, cap_tokens, cap_len,
                                    img_feats, img_locs, img_len,
                                    chunk_size=4)
    assert grid_q8.shape == grid_fp.shape == (n_img, n_cap)
    # quantization perturbs scores but must preserve the broad structure
    c = np.corrcoef(grid_q8.ravel(), grid_fp.ravel())[0, 1]
    assert c > 0.95, c


def test_q8_gate_large_m_falls_back_to_bf16():
    """Above PREQUANT_MAX_M rows the int8_infer GEMM must be the plain one
    (int8 measured neutral-to-worse on compute-bound shapes)."""
    from m3p_tpu.model.layers import QuantDense
    from m3p_tpu.ops.quant import PREQUANT_MAX_M

    rng = np.random.RandomState(5)
    dense = QuantDense(16, jnp.float32, jnp.float32, ("embed", "mlp"),
                       False, True)
    x_small = jnp.asarray(rng.randn(4, 8), jnp.float32)
    v = dense.init(jax.random.PRNGKey(0), x_small)
    p = {"params": __import__("flax.linen", fromlist=["nn"]).meta.unbox(
        v["params"])}
    _, q8 = dense.apply(p, x_small, mutable=["q8"])
    x_big = jnp.asarray(rng.randn(PREQUANT_MAX_M + 1, 8), jnp.float32)
    out_big = dense.apply({**p, **q8}, x_big)
    kernel, bias = p["params"]["kernel"], p["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out_big),
                               np.asarray(x_big @ kernel + bias),
                               atol=1e-5, rtol=1e-5)
    # small M engages int8: output differs from the exact GEMM
    out_small = dense.apply({**p, **q8}, x_small)
    assert float(jnp.abs(out_small - (x_small @ kernel + bias)).max()) > 1e-6
