"""Ring attention over the seq mesh axis == full attention (8 CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from m3p_tpu.ops.attention import mha_reference
from m3p_tpu.ops.ring_attention import ring_attention


@pytest.fixture(scope="module")
def seq_mesh(eight_devices):
    import numpy as onp

    return Mesh(onp.array(eight_devices[:4]), ("seq",))


def _run_ring(mesh, q, k, v, mask, causal):
    fn = shard_map(
        lambda q_, k_, v_, m_: ring_attention(q_, k_, v_, m_, "seq",
                                              causal=causal),
        mesh=mesh,
        in_specs=(P(None, None, "seq", None), P(None, None, "seq", None),
                  P(None, None, "seq", None), P(None, "seq")),
        out_specs=P(None, None, "seq", None),
    )
    return fn(q, k, v, mask)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(seq_mesh, causal):
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 2, 32, 16   # S divisible by 4 devices
    q = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    mask = jnp.array(np.arange(S)[None, :] < np.array([32, 25])[:, None])

    ref = mha_reference(q, k, v, mask, causal=causal)
    out = _run_ring(seq_mesh, q, k, v, mask, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_fully_masked_rows_are_finite(seq_mesh):
    rng = np.random.RandomState(1)
    B, H, S, D = 1, 1, 16, 8
    q = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.array(rng.randn(B, H, S, D), jnp.float32)
    mask = jnp.zeros((B, S), bool)  # nothing to attend to
    out = _run_ring(seq_mesh, q, k, v, mask, False)
    assert np.isfinite(np.asarray(out)).all()
