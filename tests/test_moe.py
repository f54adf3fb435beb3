"""Mixture-of-experts FFN (expert-choice routing) + expert parallelism.

TPU-native scale-up feature with no reference equivalent (the reference is a
dense 12L encoder, `transformer.py:610-729`); SURVEY.md §2.3 requires the
layer API not preclude EP — these tests pin the routing semantics, the
dense-equivalence degenerate case, training behavior, and the expert-axis
sharding parity on an 8-device mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import MeshConfig, small_test_config
from m3p_tpu.data import synthetic
from m3p_tpu.model import build_model
from m3p_tpu.model.layers import MoEFFN
from m3p_tpu.ops.activations import gelu_erf
from m3p_tpu.parallel.mesh import make_mesh
from m3p_tpu.parallel.sharding import (batch_sharding, get_param_pspecs,
                                       shard_train_state)
from m3p_tpu.train.optim import build_optimizer
from m3p_tpu.train.state import create_train_state
from m3p_tpu.train import steps as S


def _moe_cfg(n_experts=4, interval=1):
    cfg = small_test_config()
    model = dataclasses.replace(cfg.model, moe_experts=n_experts,
                                moe_interval=interval)
    return cfg.replace(model=model)


def test_single_expert_full_capacity_equals_dense():
    """E=1 with capacity >= T routes every token to the one expert with
    gate softmax(1 logit) == 1, so MoEFFN reduces to its dense expert MLP."""
    d, h = 8, 16
    mod = MoEFFN(dim=d, hidden_dim=h, n_experts=1, capacity_factor=4.0,
                 dropout=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, d), jnp.float32)
    from flax import linen as nn
    params = nn.unbox(mod.init(jax.random.PRNGKey(0), x))["params"]
    y = mod.apply({"params": params}, x)

    w1, b1 = params["w1"][0], params["b1"][0]
    w2, b2 = params["w2"][0], params["b2"][0]
    ref = gelu_erf(x @ w1 + b1) @ w2 + b2
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_expert_choice_capacity_and_mixing():
    """Each expert processes exactly C = capacity_factor*T/E tokens; a token
    chosen by several experts mixes their gated outputs; unselected tokens
    output exactly zero (the residual stream carries them)."""
    d, h, e = 8, 16, 4
    b, s = 2, 8
    t = b * s
    mod = MoEFFN(dim=d, hidden_dim=h, n_experts=e, capacity_factor=1.0,
                 dropout=0.0)
    x = jnp.asarray(np.random.RandomState(1).randn(b, s, d), jnp.float32)
    from flax import linen as nn
    params = nn.unbox(mod.init(jax.random.PRNGKey(0), x))["params"]
    y = np.asarray(mod.apply({"params": params}, x)).reshape(t, d)

    # reproduce the routing on the host
    xt = np.asarray(x).reshape(t, d)
    router = np.asarray(params["router"])
    logits = xt @ router
    aff = np.exp(logits - logits.max(-1, keepdims=True))
    aff = aff / aff.sum(-1, keepdims=True)
    cap = int(1.0 * t / e)
    selected = set()
    for ei in range(e):
        top = np.argsort(-aff[:, ei])[:cap]
        selected.update(int(i) for i in top)
    unselected = [i for i in range(t) if i not in selected]
    # with capacity_factor=1.0 the experts can't cover everything twice;
    # routing must leave the unselected tokens at exactly zero
    assert np.abs(y[unselected]).max() == 0.0
    assert np.abs(y[sorted(selected)]).sum() > 0.0


def test_moe_model_trains():
    """A 4-expert MoE flagship config optimizes the MCT pretrain loss."""
    cfg = _moe_cfg(n_experts=4, interval=2)
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    # MoE params exist only on every 2nd block
    assert "moe_ffn" in params["block_1"] and "ffn" in params["block_0"]
    assert params["block_1"]["moe_ffn"]["w1"].shape[0] == 4

    tx, _ = build_optimizer("adam,lr=0.001", clip_grad_norm=5.0)
    state = create_train_state(params, tx)
    from m3p_tpu.data.masking import MaskingConfig

    mask_cfg = MaskingConfig(max_pred=4, n_words=cfg.model.n_words,
                             mask_index=cfg.model.mask_index)
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_pretrain_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words).items()}

    def loss_fn(p, b, key):
        return S.mct_pretrain_loss(
            model, p, b, key, mask_cfg, cfg.data.sample_n,
            lambda_rel=1.0, lambda_mlm=1.0, lambda_mrm=1.0, lambda_mrfr=1.0,
            lambda_clcm=1.0, refine_image=True)

    step = S.make_train_step(loss_fn, donate=False)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_moe_rejects_causal():
    cfg = _moe_cfg(n_experts=2, interval=1)
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    toks = jnp.zeros((2, 4), jnp.int32)
    mask = jnp.ones((2, 4), bool)
    with pytest.raises(AssertionError, match="causal"):
        model.apply({"params": params}, toks, mask, causal=True,
                    method=model.encode_text)


def test_expert_parallel_train_step(eight_devices):
    """EP: expert weights shard over the 'expert' mesh axis; the sharded ITM
    train step matches the unsharded loss."""
    cfg = _moe_cfg(n_experts=4, interval=2)
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    tx, _ = build_optimizer("adam,lr=0.001")
    rng = np.random.RandomState(0)
    batch_np = synthetic.make_retrieval_batch(
        rng, 4, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words)

    def loss_fn(p, b, key):
        return S.itm_finetune_loss(model, p, b, key, cfg.data.sample_n,
                                   deterministic=True)

    # unsharded reference
    ref_step = S.make_train_step(loss_fn, donate=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, ref_m = ref_step(create_train_state(params, tx), batch,
                        jax.random.PRNGKey(0))

    mesh = make_mesh(MeshConfig(data=-1, tensor=2, expert=2), eight_devices)
    from m3p_tpu.model import _init_method
    from m3p_tpu.model.transformer import M3PModel

    def abstract_init():
        m = M3PModel(cfg.model)
        b, s, r = 2, 4, 2
        return m.init(jax.random.PRNGKey(0), jnp.zeros((b, s), jnp.int32),
                      jnp.ones((b, s), bool),
                      jnp.zeros((b, r, 2048), jnp.float32),
                      jnp.zeros((b, r, 5), jnp.float32),
                      jnp.ones((b, r), bool), jnp.zeros((b, s), jnp.int32),
                      method=_init_method)

    pspecs = get_param_pspecs(abstract_init)
    state = create_train_state(params, tx)
    sharded_state, shardings = shard_train_state(state, mesh, pspecs)
    # the expert dim of the MoE weights is sharded over the expert axis
    w1 = sharded_state.params["block_1"]["moe_ffn"]["w1"]
    assert w1.sharding.spec[0] == "expert", w1.sharding.spec

    bsh = batch_sharding(mesh)
    sharded_batch = {k: jax.device_put(jnp.asarray(v), bsh)
                     for k, v in batch_np.items()}
    step = S.make_train_step(loss_fn, donate=False, state_shardings=shardings)
    new_state, m = step(sharded_state, sharded_batch, jax.random.PRNGKey(0))
    assert abs(float(m["loss"]) - float(ref_m["loss"])) < 1e-4, (
        float(m["loss"]), float(ref_m["loss"]))
    assert int(new_state.step) == 1
