"""Pipeline parallelism: SPMD collective pipelining over a mesh axis.

The reference has no PP (SURVEY.md §2.3); this provides the TPU-native
mechanism: layers are sliced into S stages (one per device along the ``pp``
axis), the batch into M microbatches, and activations flow stage-to-stage via
`jax.lax.ppermute` (neighbor point-to-point over ICI) in the standard
GPipe-style schedule — step t runs every stage in parallel on its in-flight
microbatch, S-1 bubble steps at fill/drain.  The whole pipeline is one jitted,
differentiable function (ppermute is linear, so jax.grad produces the reverse
schedule automatically).

Use inside `shard_map`:

    out = shard_map(
        lambda p, x: spmd_pipeline(stage_fn, p, x, axis_name="pp"),
        mesh=mesh,
        in_specs=(P("pp"), P()),     # stage-sliced params, replicated input
        out_specs=P(),
    )(stacked_params, microbatches)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def spmd_pipeline(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    microbatches: jax.Array,     # (n_micro, micro_bs, ...) same on all stages
    axis_name: str = "pp",
) -> jax.Array:
    """Run ``stage_fn`` as a pipeline over the ``axis_name`` mesh axis.

    ``stage_params`` are this device's stage parameters (slice the stacked
    layer params over the axis in shard_map's in_specs; a leading length-1
    stage dim is squeezed).  Activations must have the same shape/dtype at
    every stage boundary.  Returns (n_micro, micro_bs, ...) final outputs
    (identical on all stages).
    """
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)
    # shard_map delivers the stage slice with a leading length-1 axis dim
    stage_params = jax.tree.map(
        lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 and
        x.shape[0] == 1 else x, stage_params)

    n_micro = microbatches.shape[0]
    total_steps = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def _vary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    state = _vary(jnp.zeros_like(microbatches[0]))
    outputs = _vary(jnp.zeros_like(microbatches))

    def body(t, carry):
        state, outputs = carry
        feed_idx = jnp.clip(t, 0, n_micro - 1)
        inp = jnp.where(stage == 0, microbatches[feed_idx], state)
        out = stage_fn(stage_params, inp)
        # the last stage finishes microbatch (t - (n_stages - 1)) at step t
        out_t = t - (n_stages - 1)
        valid = jnp.logical_and(stage == n_stages - 1,
                                jnp.logical_and(out_t >= 0, out_t < n_micro))
        write_idx = jnp.clip(out_t, 0, n_micro - 1)
        current = jax.lax.dynamic_index_in_dim(outputs, write_idx, 0,
                                               keepdims=False)
        new_row = jnp.where(valid, out, current)
        outputs = jax.lax.dynamic_update_index_in_dim(outputs, new_row,
                                                      write_idx, 0)
        state = jax.lax.ppermute(out, axis_name, perm)
        return state, outputs

    state, outputs = jax.lax.fori_loop(0, total_steps, body, (state, outputs))
    # outputs live on the last stage only (zeros elsewhere): broadcast by
    # rotating them one hop (last -> 0) is wrong for >2 stages, so sum over
    # the axis — all other stages contribute zeros.
    zero_elsewhere = jnp.where(stage == n_stages - 1, 1.0, 0.0)
    outputs = outputs * zero_elsewhere.astype(outputs.dtype)
    return jax.lax.psum(outputs, axis_name)


def stack_stage_params(per_stage_params) -> Any:
    """[stage0_params, stage1_params, ...] -> stacked pytree with a leading
    stage dim (shard over the pp axis with in_specs=P('pp'))."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)
