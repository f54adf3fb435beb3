"""Model topology tests: shapes, padding invariance, KV-cache decode parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import small_test_config
from m3p_tpu.model import build_model, param_count
from m3p_tpu.model.transformer import lengths_to_mask


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    return cfg, model, params


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    B, S, R = 4, 10, 8
    tokens = jnp.array(rng.randint(4, 500, (B, S)), jnp.int32)
    tmask = lengths_to_mask(jnp.array([10, 7, 5, 10]), S)
    feats = jnp.array(rng.randn(B, R, 2048), jnp.float32)
    locs = jnp.array(rng.rand(B, R, 5), jnp.float32)
    imask = jnp.ones((B, R), bool)
    return tokens, tmask, feats, locs, imask


def test_param_tree_complete(model_and_params):
    _, _, params = model_and_params
    top = set(params.keys())
    for name in ["text_emb", "image_emb", "refiner", "pred_layer", "obj_pred",
                 "itm_pooler", "clcm_pooler", "mrfr_head", "block_0", "block_1"]:
        assert name in top, f"missing {name}"
    # decoder cross-attention must be initialized
    assert "encoder_attn" in params["block_0"]
    assert param_count(params) > 0


def test_joint_forward_shapes(model_and_params, batch):
    cfg, model, params = model_and_params
    tokens, tmask, feats, locs, imask = batch
    B, S = tokens.shape
    R = feats.shape[1]
    h = model.apply({"params": params}, tokens, tmask, feats, locs, imask,
                    method=model.encode_joint)
    assert h.shape == (B, R + S, cfg.model.emb_dim)
    itm = model.apply({"params": params}, h, method=model.itm_score)
    assert itm.shape == (B, 1)
    obj = model.apply({"params": params}, h[:, :R], method=model.obj_logits)
    assert obj.shape == (B, R, cfg.model.n_obj_classes)
    mrfr = model.apply({"params": params}, h[:, :R], method=model.mrfr_predict)
    assert mrfr.shape == (B, R, 2048)


def test_padding_invariance(model_and_params, batch):
    """Changing padded token ids must not change outputs at valid positions."""
    _, model, params = model_and_params
    tokens, tmask, feats, locs, imask = batch
    R = feats.shape[1]
    h1 = model.apply({"params": params}, tokens, tmask, feats, locs, imask,
                     method=model.encode_joint)
    tokens2 = tokens.at[1, 8:].set(123)
    h2 = model.apply({"params": params}, tokens2, tmask, feats, locs, imask,
                     method=model.encode_joint)
    np.testing.assert_allclose(np.asarray(h1[1, :R + 7]),
                               np.asarray(h2[1, :R + 7]), atol=1e-5)


def test_region_padding_invariance(model_and_params, batch):
    _, model, params = model_and_params
    tokens, tmask, feats, locs, _ = batch
    imask = lengths_to_mask(jnp.array([8, 6, 8, 8]), feats.shape[1])
    h1 = model.apply({"params": params}, tokens, tmask, feats, locs, imask,
                     method=model.encode_joint)
    feats2 = feats.at[1, 6:].set(42.0)
    h2 = model.apply({"params": params}, tokens, tmask, feats2, locs, imask,
                     method=model.encode_joint)
    np.testing.assert_allclose(np.asarray(h1[1, :6]), np.asarray(h2[1, :6]),
                               atol=1e-5)


def test_tied_embeddings(model_and_params, batch):
    """Output projection must share the word-embedding matrix."""
    cfg, model, params = model_and_params
    tokens, tmask, *_ = batch
    enc, _ = model.apply({"params": params}, tokens, tmask,
                         method=model.encode_text)
    logits = model.apply({"params": params}, enc, method=model.word_logits)
    emb = params["text_emb"]["word"]["embedding"]
    expected = np.asarray(enc) @ np.asarray(emb).T \
        + np.asarray(params["pred_layer"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), expected, atol=1e-4)


def test_incremental_decode_matches_full(model_and_params, batch):
    _, model, params = model_and_params
    tokens, tmask, *_ = batch
    B, S = 2, tokens.shape[1]
    toks = tokens[:B]
    full_mask = jnp.ones((B, S), bool)
    enc, _ = model.apply({"params": params}, toks, full_mask,
                         method=model.encode_text)
    full, _ = model.apply({"params": params}, toks, full_mask, None, None,
                          True, enc, full_mask, method=model.encode_text)
    cache = model.apply({"params": params}, B, S, method=model.init_cache)
    outs = []
    for t in range(S):
        o, cache = model.apply(
            {"params": params}, toks[:, t:t + 1], jnp.ones((B, 1), bool),
            None, jnp.full((B, 1), t), True, enc, full_mask, cache,
            method=model.encode_text)
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=1e-5)


def test_image_stream_and_refiner(model_and_params, batch):
    cfg, model, params = model_and_params
    _, _, feats, locs, imask = batch
    h = model.apply({"params": params}, feats, locs, imask, None, True,
                    method=model.encode_image)
    assert h.shape == (feats.shape[0], feats.shape[1], cfg.model.emb_dim)
    emb = model.apply({"params": params}, feats, locs, imask,
                      method=model.embed_image_regions)
    assert emb.shape == h.shape


def test_remat_path_matches_no_remat():
    """remat=True must produce identical outputs and valid gradients."""
    import dataclasses

    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    mcfg = dataclasses.replace(cfg.model, remat=True)
    model_r = type(model)(mcfg)

    rng = np.random.RandomState(0)
    B, S, R = 2, 8, 4
    tokens = jnp.asarray(rng.randint(4, 500, (B, S)), jnp.int32)
    feats = jnp.asarray(rng.randn(B, R, 2048), jnp.float32)
    locs = jnp.asarray(rng.rand(B, R, 5), jnp.float32)
    args = (tokens, jnp.ones((B, S), bool), feats, locs,
            jnp.ones((B, R), bool))
    h = model.apply({"params": params}, *args, method=model.encode_joint)
    h_r = model_r.apply({"params": params}, *args,
                        method=model_r.encode_joint)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_r), atol=1e-6)

    def loss(p):
        out = model_r.apply({"params": p}, *args, method=model_r.encode_joint)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_sinusoidal_embeddings():
    """--sinusoidal_embeddings: fixed sin/cos table, no learned position
    param (`create_sinusoidal_embeddings`, `transformer.py:37-46`)."""
    import dataclasses

    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.model.embeddings import sinusoidal_table

    cfg = dataclasses.replace(small_test_config().model,
                              sinusoidal_embeddings=True)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    assert "position" not in params["text_emb"]
    table = np.asarray(sinusoidal_table(8, cfg.emb_dim))
    # row 0: sin(0)=0 on even dims, cos(0)=1 on odd dims
    np.testing.assert_allclose(table[0, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(table[0, 1::2], 1.0, atol=1e-7)

    tokens = jnp.asarray(np.random.RandomState(0).randint(4, 500, (2, 8)),
                         jnp.int32)
    mask = jnp.ones((2, 8), bool)
    out, _ = model.apply({"params": params}, tokens, mask,
                         method=model.encode_text)
    assert np.isfinite(np.asarray(out)).all()


def test_adaptive_softmax():
    """cfg.asm: word_logits returns NORMALIZED log-probs (logsumexp == 0) so
    CE == -log p[y]; generation works unchanged
    (`AdaptiveLogSoftmaxWithLoss`, `transformer.py:93-100`)."""
    import dataclasses

    import optax

    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model

    cfg = dataclasses.replace(small_test_config().model, asm=True,
                              asm_cutoffs=(64, 256), asm_div_value=4.0)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    assert "pred_layer_asm" in params
    assert "head" in params["pred_layer_asm"]
    assert "tail_0_proj" in params["pred_layer_asm"]

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, cfg.emb_dim),
                    jnp.float32)
    lp = model.apply({"params": params}, x, method=model.word_logits)
    assert lp.shape == (2, 3, cfg.n_words)
    lse = np.asarray(jax.nn.logsumexp(lp.astype(jnp.float32), axis=-1))
    np.testing.assert_allclose(lse, 0.0, atol=1e-4)
    # CE on normalized log-probs == -log p[target]
    y = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        lp.astype(jnp.float32), y)
    direct = -jnp.take_along_axis(lp.astype(jnp.float32), y[..., None],
                                  axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(ce), np.asarray(direct), atol=1e-4)


def test_image_fusion_path():
    """encode_text with image_enc engages the CrossAlign fusion (the
    reference ``image_fusion`` flag, `transformer.py:838-839,1068-1069`)."""
    import dataclasses

    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model

    cfg = dataclasses.replace(small_test_config().model, image_fusion=True)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    assert "cross_align" in params

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(4, 500, (2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), bool)
    img_enc = jnp.asarray(rng.randn(2, 4, cfg.emb_dim), jnp.float32)
    img_mask = jnp.ones((2, 4), bool)
    fused, _ = model.apply({"params": params}, tokens, mask,
                           image_enc=img_enc, image_mask=img_mask,
                           method=model.encode_text)
    plain, _ = model.apply({"params": params}, tokens, mask,
                           method=model.encode_text)
    assert np.isfinite(np.asarray(fused)).all()
    assert float(jnp.max(jnp.abs(fused - plain))) > 1e-4
