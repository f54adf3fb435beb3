"""Activation functions.

The reference uses the exact-erf GELU (`transformer.py:48-56`), not the tanh
approximation — checkpoint-parity-sensitive, so pinned here.
"""

import jax
import jax.numpy as jnp


def gelu_erf(x: jax.Array) -> jax.Array:
    """0.5 * x * (1 + erf(x / sqrt(2))) — exact GELU."""
    return jax.nn.gelu(x, approximate=False)
