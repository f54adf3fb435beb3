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
    """One MLP stage: x @ w1 -> gelu -> @ w2, residual."""
    h = jax.nn.gelu(x @ params["w1"])
    return x + h @ params["w2"]


def _make_params(rng, n_stages, d, hidden):
    return [
        {"w1": jnp.asarray(rng.randn(d, hidden) * 0.1, jnp.float32),
         "w2": jnp.asarray(rng.randn(hidden, d) * 0.1, jnp.float32)}
        for _ in range(n_stages)
    ]


def _sequential(per_stage, x):
    for p in per_stage:
        x = _stage_fn(p, x)
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
