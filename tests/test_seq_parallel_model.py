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
