"""Sequence-parallel joint encoder == single-device encoder (4-way seq mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from m3p_tpu.config import small_test_config
from m3p_tpu.model import build_model
from m3p_tpu.parallel.sp import seq_parallel_encode_joint


def test_sp_encode_joint_matches(eight_devices):
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    mesh = Mesh(np.array(eight_devices[:4]), ("seq",))

    rng = np.random.RandomState(0)
    B, S, R = 2, 12, 8           # R + S = 20 -> divisible by 4
    tokens = jnp.asarray(rng.randint(4, 500, (B, S)), jnp.int32)
    text_mask = jnp.asarray(np.arange(S)[None, :]
                            < np.array([12, 9])[:, None])
    feats = jnp.asarray(rng.randn(B, R, 2048), jnp.float32)
    locs = jnp.asarray(rng.rand(B, R, 5), jnp.float32)
    img_mask = jnp.ones((B, R), bool)

    ref = model.apply({"params": params}, tokens, text_mask, feats, locs,
                      img_mask, method=model.encode_joint)
    sp = seq_parallel_encode_joint(model, params, tokens, text_mask, feats,
                                   locs, img_mask, mesh)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref), atol=2e-5)


def test_sp_train_step_parity(eight_devices):
    """Loss and gradients through the sequence-parallel train step match the
    unsharded ITM train step (VERDICT item 6)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from m3p_tpu.config import small_test_config
    from m3p_tpu.data import synthetic
    from m3p_tpu.model import build_model
    from m3p_tpu.model.transformer import lengths_to_mask
    from m3p_tpu.parallel.sp import (make_sp_itm_train_step,
                                     seq_parallel_encode_joint)
    from m3p_tpu.train import steps as S
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state

    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    tx, _ = build_optimizer("adam,lr=0.01")
    rng = np.random.RandomState(0)
    batch_np = synthetic.make_pretrain_batch(
        rng, 4, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    mesh = Mesh(np.array(eight_devices[:2]), ("seq",))

    def ref_loss(p):
        return S.itm_finetune_loss(model, p, batch, key, cfg.data.sample_n,
                                   deterministic=True)[0]

    sp_step = make_sp_itm_train_step(model, mesh, cfg.data.sample_n)
    _, sp_m = sp_step(create_train_state(params, tx), batch, key)
    np.testing.assert_allclose(float(sp_m["loss"]), float(ref_loss(params)),
                               rtol=1e-5)

    def sp_loss(p):
        tm = lengths_to_mask(batch["text_len"], batch["tokens"].shape[1])
        im = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
        hidden = seq_parallel_encode_joint(
            model, p, batch["tokens"], tm, batch["feats"], batch["locs"],
            im, mesh, refine_image=True)
        scores = model.apply({"params": p}, hidden, method=model.itm_score)
        ce, bce = S.itm_grid_losses(scores, batch["pos_label"],
                                    cfg.data.sample_n)
        return ce + bce

    g_ref = jax.grad(ref_loss)(params)
    g_sp = jax.grad(sp_loss)(params)

    def check(a, b):
        tol = 1e-6 + 1e-3 * float(np.max(np.abs(np.asarray(a))))
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) <= tol

    jax.tree.map(check, g_ref, g_sp)


def test_long_context_sp_training(eight_devices):
    """End-to-end long-sequence training config: joint stream far beyond the
    reference's 514-position cap, sharded over a 4-way seq axis, full train
    step (loss+grad) — the SURVEY §5.7 long-context axis exercised."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from m3p_tpu.config import long_context_config
    from m3p_tpu.data import synthetic
    from m3p_tpu.parallel.sp import make_sp_itm_train_step
    from m3p_tpu.model import build_model
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state

    cfg = long_context_config()
    # CPU-sized model, genuine long sequence: 8 regions + 1016 tokens = 1024
    mcfg = dataclasses.replace(
        cfg.model, n_words=512, mask_index=511, emb_dim=32, n_layers=2,
        n_heads=2, max_region_num=8, refine_layers=1, dropout=0.0,
        attention_dropout=0.0, dtype="float32", max_positions=1100,
        use_pallas_attention=False, remat=False, seq_axis=None)
    model, params = build_model(mcfg, jax.random.PRNGKey(0))
    mesh = Mesh(np.array(eight_devices[:4]), ("seq",))

    rng = np.random.RandomState(0)
    b = synthetic.make_pretrain_batch(rng, 2, 2, 1016, 8, mcfg.n_words)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    step = make_sp_itm_train_step(model, mesh, sample_n=2)
    state = create_train_state(
        params, build_optimizer("adam,lr=0.001")[0])
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1
