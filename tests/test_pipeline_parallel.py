"""SPMD pipeline parallelism: forward parity and gradient flow (4-stage CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from m3p_tpu.parallel.pipeline import spmd_pipeline, stack_stage_params


@pytest.fixture(scope="module")
def pp_mesh(eight_devices):
    return Mesh(np.array(eight_devices[:4]), ("pp",))


def _stage_fn(params, x):
    """One MLP stage: x @ w1 -> gelu -> @ w2, residual.

    shard_map delivers this stage's params with a leading length-1 stage dim.
    """
    w1, w2 = params["w1"][0], params["w2"][0]
    h = jax.nn.gelu(x @ w1)
    return x + h @ w2


def _make_params(rng, n_stages, d, hidden):
    return [
        {"w1": jnp.asarray(rng.randn(d, hidden) * 0.1, jnp.float32),
         "w2": jnp.asarray(rng.randn(hidden, d) * 0.1, jnp.float32)}
        for _ in range(n_stages)
    ]


def _sequential(per_stage, x):
    for p in per_stage:
        h = jax.nn.gelu(x @ p["w1"])
        x = x + h @ p["w2"]
    return x


def test_pipeline_matches_sequential(pp_mesh):
    rng = np.random.RandomState(0)
    n_stages, d, hidden = 4, 16, 32
    n_micro, micro_bs = 8, 2
    per_stage = _make_params(rng, n_stages, d, hidden)
    stacked = stack_stage_params(per_stage)
    x = jnp.asarray(rng.randn(n_micro, micro_bs, d), jnp.float32)

    pp_fn = shard_map(
        lambda p, xs: spmd_pipeline(_stage_fn, p, xs, axis_name="pp"),
        mesh=pp_mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
    )
    out = pp_fn(stacked, x)
    ref = jnp.stack([_sequential(per_stage, x[i]) for i in range(n_micro)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_gradients(pp_mesh):
    """jax.grad through the pipeline equals grad of the sequential model."""
    rng = np.random.RandomState(1)
    n_stages, d, hidden = 4, 8, 16
    n_micro, micro_bs = 4, 2
    per_stage = _make_params(rng, n_stages, d, hidden)
    stacked = stack_stage_params(per_stage)
    x = jnp.asarray(rng.randn(n_micro, micro_bs, d), jnp.float32)
    y = jnp.asarray(rng.randn(n_micro, micro_bs, d), jnp.float32)

    pp_fn = shard_map(
        lambda p, xs: spmd_pipeline(_stage_fn, p, xs, axis_name="pp"),
        mesh=pp_mesh,
        in_specs=(P("pp"), P()),
        out_specs=P(),
    )

    def pp_loss(stacked, x):
        return jnp.mean((pp_fn(stacked, x) - y) ** 2)

    def seq_loss(per_stage, x):
        out = jnp.stack([_sequential(per_stage, x[i]) for i in range(n_micro)])
        return jnp.mean((out - y) ** 2)

    g_pp = jax.grad(pp_loss)(stacked, x)
    g_seq = jax.grad(seq_loss)(per_stage, x)
    g_seq_stacked = stack_stage_params(g_seq)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(np.asarray(g_pp[k]),
                                   np.asarray(g_seq_stacked[k]), atol=1e-5)


def test_pipelined_encode_joint_matches(pp_mesh):
    """The PP-sliced M3P encoder must equal the plain joint encoder."""
    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.parallel.pipeline import pipelined_encode_joint

    cfg = small_test_config()  # 2 layers
    # 4-stage mesh needs n_layers % 4 == 0 -> use a 4-layer variant
    import dataclasses

    mcfg = dataclasses.replace(cfg.model, n_layers=4)
    model, params = build_model(mcfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    B, S, R = 8, 12, 8
    tokens = jnp.asarray(rng.randint(4, 500, (B, S)), jnp.int32)
    text_mask = jnp.asarray(
        np.arange(S)[None, :] < rng.randint(6, S + 1, (B, 1)))
    feats = jnp.asarray(rng.randn(B, R, 2048), jnp.float32)
    locs = jnp.asarray(rng.rand(B, R, 5), jnp.float32)
    img_mask = jnp.ones((B, R), bool)

    ref = model.apply({"params": params}, tokens, text_mask, feats, locs,
                      img_mask, method=model.encode_joint)
    out = pipelined_encode_joint(model, params, tokens, text_mask, feats,
                                 locs, img_mask, pp_mesh,
                                 n_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pp_train_step_parity(pp_mesh):
    """Loss and gradients through the pipelined train step match the
    unsharded ITM train step (VERDICT item 6)."""
    import jax

    from m3p_tpu.config import small_test_config
    from m3p_tpu.data import synthetic
    from m3p_tpu.model import build_model
    from m3p_tpu.parallel.pipeline import make_pp_itm_train_step
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

    def ref_loss(p):
        return S.itm_finetune_loss(model, p, batch, key, cfg.data.sample_n,
                                   deterministic=True)[0]

    # pp_mesh has 4 stages but the small model has 2 layers -> 2-stage mesh
    mesh2 = Mesh(np.array(pp_mesh.devices.flatten()[:2]), ("pp",))
    pp_step = make_pp_itm_train_step(model, mesh2, cfg.data.sample_n,
                                     n_microbatches=2)
    state = create_train_state(params, tx)
    _, pp_m = pp_step(state, batch, key)
    np.testing.assert_allclose(float(pp_m["loss"]), float(ref_loss(params)),
                               rtol=1e-5)

    # gradient parity: an optimizer step sign-normalizes and amplifies float
    # noise on analytically-zero leaves (k_lin biases), so compare raw grads
    from m3p_tpu.model.transformer import lengths_to_mask
    from m3p_tpu.parallel.pipeline import pipelined_encode_joint

    def pp_loss(p):
        tm = lengths_to_mask(batch["text_len"], batch["tokens"].shape[1])
        im = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
        hidden = pipelined_encode_joint(
            model, p, batch["tokens"], tm, batch["feats"], batch["locs"],
            im, mesh2, n_microbatches=2, refine_image=True)
        scores = model.apply({"params": p}, hidden, method=model.itm_score)
        ce, bce = S.itm_grid_losses(scores, batch["pos_label"],
                                    cfg.data.sample_n)
        return ce + bce

    g_ref = jax.grad(ref_loss)(params)
    g_pp = jax.grad(pp_loss)(params)

    def check(a, b):
        tol = 1e-6 + 1e-3 * float(np.max(np.abs(np.asarray(a))))
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) <= tol

    jax.tree.map(check, g_ref, g_pp)


class TestPPDropout:
    """PP training forwards apply real dropout (VERDICT r3 item 2): masks
    vary per microbatch and per layer, runs are reproducible under one key,
    and a missing rng with nonzero dropout refuses loudly."""

    def _setup(self, pp_mesh, dropout=0.5):
        import dataclasses

        from m3p_tpu.config import small_test_config
        from m3p_tpu.model import build_model

        cfg = small_test_config()
        mcfg = dataclasses.replace(cfg.model, n_layers=2, dropout=dropout,
                                   attention_dropout=0.0)
        model, params = build_model(mcfg, jax.random.PRNGKey(0))
        mesh2 = Mesh(np.array(pp_mesh.devices.flatten()[:2]), ("pp",))
        rng = np.random.RandomState(0)
        B, S, D = 4, 8, mcfg.emb_dim
        # identical rows across the two microbatches: rows 0/1 == rows 2/3
        half = rng.randn(B // 2, S, D).astype(np.float32)
        x = jnp.asarray(np.concatenate([half, half], 0))
        mask = jnp.ones((B, S), bool)
        return model, params, mesh2, x, mask

    def test_dropout_reproducible_and_active(self, pp_mesh):
        from m3p_tpu.parallel.pipeline import pp_run_blocks

        model, params, mesh2, x, mask = self._setup(pp_mesh)
        key = jax.random.PRNGKey(7)
        det = pp_run_blocks(model, params, x, mask, mesh2,
                            n_microbatches=2)
        a = pp_run_blocks(model, params, x, mask, mesh2, n_microbatches=2,
                          deterministic=False, dropout_rng=key)
        b = pp_run_blocks(model, params, x, mask, mesh2, n_microbatches=2,
                          deterministic=False, dropout_rng=key)
        c = pp_run_blocks(model, params, x, mask, mesh2, n_microbatches=2,
                          deterministic=False,
                          dropout_rng=jax.random.PRNGKey(8))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(det)))) > 1e-3
        assert float(np.max(np.abs(np.asarray(a) - np.asarray(c)))) > 1e-3

    def test_masks_vary_per_microbatch(self, pp_mesh):
        """Identical inputs in different microbatches draw different masks
        (the microbatch id is folded into the key)."""
        from m3p_tpu.parallel.pipeline import pp_run_blocks

        model, params, mesh2, x, mask = self._setup(pp_mesh)
        out = np.asarray(pp_run_blocks(
            model, params, x, mask, mesh2, n_microbatches=2,
            deterministic=False, dropout_rng=jax.random.PRNGKey(3)))
        # microbatch 0 = rows 0:2, microbatch 1 = rows 2:4, same inputs
        assert float(np.max(np.abs(out[:2] - out[2:]))) > 1e-3
        # ... while the deterministic path keeps them identical
        det = np.asarray(pp_run_blocks(model, params, x, mask, mesh2,
                                       n_microbatches=2))
        np.testing.assert_allclose(det[:2], det[2:], atol=1e-5)

    def test_masks_vary_per_stage(self, pp_mesh):
        """Two stages holding IDENTICAL layer params on identity-preserving
        input produce different dropout masks (global layer index folded)."""
        from m3p_tpu.parallel.pipeline import pp_run_blocks, \
            stack_block_params

        model, params, mesh2, x, mask = self._setup(pp_mesh)
        # copy block_0's params into block_1 so both stages are identical fns
        params = dict(params)
        params["block_1"] = params["block_0"]
        out1 = np.asarray(pp_run_blocks(
            model, params, x, mask, mesh2, n_microbatches=2,
            deterministic=False, dropout_rng=jax.random.PRNGKey(3)))
        # if stage 1 reused stage 0's keys, applying the stack twice with
        # the same key sequence would equal applying each layer's mask
        # twice; instead compare against a 1-stage run of the same 2-layer
        # stack (same key schedule iff global layer index is folded)
        mesh1 = Mesh(np.array(pp_mesh.devices.flatten()[:1]), ("pp",))
        out_seq = np.asarray(pp_run_blocks(
            model, params, x, mask, mesh1, n_microbatches=2,
            deterministic=False, dropout_rng=jax.random.PRNGKey(3)))
        # key schedule is topology-invariant: 2-stage == 1-stage exactly
        np.testing.assert_allclose(out1, out_seq, atol=1e-5)

    def test_missing_rng_refuses(self, pp_mesh):
        from m3p_tpu.parallel.pipeline import pp_run_blocks

        model, params, mesh2, x, mask = self._setup(pp_mesh)
        with pytest.raises(ValueError, match="dropout rng"):
            pp_run_blocks(model, params, x, mask, mesh2, n_microbatches=2,
                          deterministic=False, dropout_rng=None)

    def test_ppmodel_trains_with_dropout(self, pp_mesh):
        """End-to-end: the Trainer-style PPModel handle runs a training
        forward (deterministic=False) with dropout active and finite loss."""
        import dataclasses

        from m3p_tpu.config import small_test_config
        from m3p_tpu.data import synthetic
        from m3p_tpu.model import build_model
        from m3p_tpu.parallel.pipeline import PPModel
        from m3p_tpu.train import steps as S

        cfg = small_test_config()
        mcfg = dataclasses.replace(cfg.model, dropout=0.2)
        model, params = build_model(mcfg, jax.random.PRNGKey(0))
        mesh2 = Mesh(np.array(pp_mesh.devices.flatten()[:2]), ("pp",))
        pp_model = PPModel(model, mesh2, n_microbatches=2)
        rng = np.random.RandomState(0)
        batch_np = synthetic.make_pretrain_batch(
            rng, 4, cfg.data.sample_n, cfg.data.max_len,
            cfg.data.max_region_num, mcfg.n_words)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        key = jax.random.PRNGKey(0)
        loss_a, _ = S.itm_finetune_loss(pp_model, params, batch, key,
                                        cfg.data.sample_n,
                                        deterministic=False)
        loss_b, _ = S.itm_finetune_loss(pp_model, params, batch,
                                        jax.random.PRNGKey(1),
                                        cfg.data.sample_n,
                                        deterministic=False)
        det, _ = S.itm_finetune_loss(pp_model, params, batch, key,
                                     cfg.data.sample_n, deterministic=True)
        assert np.isfinite(float(loss_a))
        assert float(loss_a) != float(det)    # dropout is actually applied
        assert float(loss_a) != float(loss_b)  # and key-dependent
