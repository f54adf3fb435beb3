"""Mesh sharding: DP+TP train step on the 8-device CPU mesh matches single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import MeshConfig, small_test_config
from m3p_tpu.data.masking import MaskingConfig
from m3p_tpu.data import synthetic
from m3p_tpu.model import build_model
from m3p_tpu.model.__init__ import _init_method
from m3p_tpu.parallel.mesh import infer_mesh_shape, make_mesh
from m3p_tpu.parallel.sharding import (
    batch_sharding, get_param_pspecs, shard_train_state)
from m3p_tpu.train.optim import build_optimizer
from m3p_tpu.train.state import create_train_state
from m3p_tpu.train import steps as S


def test_infer_mesh_shape():
    assert infer_mesh_shape(8, MeshConfig(data=-1)) == (8, 1, 1, 1, 1, 1)
    assert infer_mesh_shape(8, MeshConfig(data=-1, tensor=2)) \
        == (4, 1, 1, 2, 1, 1)
    assert infer_mesh_shape(8, MeshConfig(data=2, fsdp=2, tensor=2)) \
        == (2, 2, 1, 2, 1, 1)
    assert infer_mesh_shape(8, MeshConfig(data=-1, expert=4)) \
        == (2, 1, 1, 1, 4, 1)
    assert infer_mesh_shape(8, MeshConfig(data=-1, pp=2)) \
        == (4, 1, 1, 1, 1, 2)
    with pytest.raises(AssertionError):
        infer_mesh_shape(8, MeshConfig(data=3, tensor=1, fsdp=1, seq=1))


def test_dp_tp_train_step(eight_devices):
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    tx, _ = build_optimizer("adam,lr=0.001")
    state = create_train_state(params, tx)

    mesh = make_mesh(MeshConfig(data=-1, tensor=2), eight_devices)
    assert mesh.shape == {"data": 4, "fsdp": 1, "seq": 1, "tensor": 2,
                          "expert": 1, "pp": 1}

    pspecs = get_param_pspecs(
        lambda: build_model_abstract(cfg.model))
    sharded_state, state_shardings = shard_train_state(state, mesh, pspecs)

    mask_cfg = MaskingConfig(max_pred=4, n_words=cfg.model.n_words,
                             mask_index=cfg.model.mask_index)
    rng = np.random.RandomState(0)
    batch_np = synthetic.make_pretrain_batch(
        rng, 4, cfg.data.sample_n, cfg.data.max_len, cfg.data.max_region_num,
        cfg.model.n_words)
    bsh = batch_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch_np.items()}

    def loss_fn(params, batch, key):
        return S.mct_pretrain_loss(
            model, params, batch, key, mask_cfg, cfg.data.sample_n,
            lambda_rel=1.0, lambda_mlm=1.0, lambda_mrm=1.0, lambda_mrfr=1.0,
            lambda_clcm=1.0, refine_image=True)

    step = S.make_train_step(loss_fn, donate=False,
                             state_shardings=state_shardings)
    new_state, metrics = step(sharded_state, batch, jax.random.PRNGKey(0))
    sharded_loss = float(metrics["loss"])

    # single-device ground truth on the same batch
    step_local = S.make_train_step(loss_fn, donate=False)
    batch_local = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, metrics_local = step_local(state, batch_local, jax.random.PRNGKey(0))
    assert np.isfinite(sharded_loss)
    assert abs(sharded_loss - float(metrics_local["loss"])) < 1e-3

    # parameters must actually be sharded over the tensor axis
    spec = new_state.params["block_0"]["attn"]["q_lin"]["kernel"].sharding.spec
    assert "tensor" in tuple(spec), spec


def build_model_abstract(model_cfg):
    """init fn for eval_shape — mirrors build_model without materializing."""
    from m3p_tpu.model.transformer import M3PModel
    model = M3PModel(model_cfg)
    b, s, r = 2, 4, 2
    tokens = jnp.zeros((b, s), jnp.int32)
    text_mask = jnp.ones((b, s), bool)
    feats = jnp.zeros((b, r, model_cfg.img_feat_dim), jnp.float32)
    locs = jnp.zeros((b, r, model_cfg.img_loc_dim), jnp.float32)
    img_mask = jnp.ones((b, r), bool)
    langs = jnp.zeros((b, s), jnp.int32)
    return model.init(jax.random.PRNGKey(0), tokens, text_mask, feats, locs,
                      img_mask, langs, method=_init_method)
