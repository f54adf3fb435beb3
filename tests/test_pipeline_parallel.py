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
