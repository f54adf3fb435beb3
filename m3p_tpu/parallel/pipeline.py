"""Pipeline parallelism: SPMD collective pipelining over a mesh axis.

The reference has no PP (SURVEY.md §2.3); this provides the TPU-native
mechanism: layers are sliced into S stages (one per device along the ``pp``
axis), the batch into M microbatches, and activations flow stage-to-stage via
`jax.lax.ppermute` (neighbor point-to-point over ICI) in the standard
GPipe-style schedule — step t runs every stage in parallel on its in-flight
microbatch, S-1 bubble steps at fill/drain.  The whole pipeline is one jitted,
differentiable function (ppermute is linear, so jax.grad produces the reverse
schedule automatically).

Payloads are pytrees: anything the stage function needs to thread through the
pipe (activations + masks + whatever) flows together.

Use inside `shard_map`:

    out = shard_map(
        lambda p, x: spmd_pipeline(stage_fn, p, x, axis_name="pp"),
        mesh=mesh,
        in_specs=(P("pp"), P()),     # stage-sliced params, replicated input
        out_specs=P(),
    )(stacked_params, microbatches)

`pipelined_encode_joint` applies this to the M3P encoder: blocks stage-slice
over the axis, the [img; text] embedding runs replicated, and each microbatch
streams through the stages.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def spmd_pipeline(
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    microbatches: Any,           # pytree; leaves (n_micro, micro_bs, ...)
    axis_name: str = "pp",
) -> Any:
    """Run ``stage_fn`` as a pipeline over the ``axis_name`` mesh axis.

    ``stage_params`` is this device's stage slice (leading stage dim from
    shard_map's P(axis) spec is kept — stage_fn decides how to use it).
    ``stage_fn(stage_params, payload) -> payload`` must preserve the payload
    structure/shapes (thread constants through unchanged).  Returns the
    (n_micro, ...) outputs, identical on all stages.
    """
    n_stages = jax.lax.psum(1, axis_name)
    stage = jax.lax.axis_index(axis_name)

    leaves = jax.tree.leaves(microbatches)
    n_micro = leaves[0].shape[0]
    total_steps = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def _vary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    state = jax.tree.map(lambda mb: _vary(jnp.zeros_like(mb[0])),
                         microbatches)
    outputs = jax.tree.map(lambda mb: _vary(jnp.zeros_like(mb)),
                           microbatches)

    def body(t, carry):
        state, outputs = carry
        feed_idx = jnp.clip(t, 0, n_micro - 1)
        inp = jax.tree.map(
            lambda mb, st: jnp.where(stage == 0, mb[feed_idx], st),
            microbatches, state)
        out = stage_fn(stage_params, inp)
        # the last stage finishes microbatch (t - (n_stages - 1)) at step t
        out_t = t - (n_stages - 1)
        valid = jnp.logical_and(stage == n_stages - 1,
                                jnp.logical_and(out_t >= 0, out_t < n_micro))
        write_idx = jnp.clip(out_t, 0, n_micro - 1)

        def write(acc, o):
            current = jax.lax.dynamic_index_in_dim(acc, write_idx, 0,
                                                   keepdims=False)
            new_row = jnp.where(valid, o, current)
            return jax.lax.dynamic_update_index_in_dim(acc, new_row,
                                                       write_idx, 0)

        outputs = jax.tree.map(write, outputs, out)
        state = jax.tree.map(
            lambda o: jax.lax.ppermute(o, axis_name, perm), out)
        return state, outputs

    state, outputs = jax.lax.fori_loop(0, total_steps, body, (state, outputs))
    # outputs live on the last stage only (zeros elsewhere) -> psum broadcast
    gate = jnp.where(stage == n_stages - 1, 1.0, 0.0)
    outputs = jax.tree.map(
        lambda o: jax.lax.psum(o * gate.astype(o.dtype), axis_name), outputs)
    return outputs


def stack_stage_params(per_stage_params) -> Any:
    """[stage0_params, stage1_params, ...] -> stacked pytree with a leading
    stage dim (shard over the pp axis with in_specs=P('pp'))."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)


# ---------------------------------------------------------------------------
# M3P integration: stage-sliced encoder blocks
# ---------------------------------------------------------------------------


def stack_block_params(params, n_layers: int):
    """Stack the per-layer ``block_i`` parameter subtrees into one pytree with
    a leading (n_layers,) dim, ready to shard over the pp axis."""
    return stack_stage_params([params[f"block_{i}"] for i in range(n_layers)])


def pp_run_blocks(
    model,
    params,
    x: jax.Array,                 # (B, S, D)
    mask: jax.Array,              # (B, S)
    mesh,
    axis: str = "pp",
    n_microbatches: int = 2,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the encoder stack pipelined over the ``axis`` mesh axis.

    Each stage holds n_layers/S consecutive blocks; microbatches stream
    through in the GPipe schedule.  Requires B % n_microbatches == 0 and
    n_layers % S == 0.  Manual only over ``axis`` (`axis_names={axis}`):
    batch shardings over ``data`` etc. on the other mesh axes compose
    automatically (a pp x data mesh pipelines data-sharded microbatches).

    Dropout (the reference recipe trains with ``--dropout 0.1``,
    `/root/reference/README.md:177-189`) is plumbed per (microbatch, layer):
    the microbatch id rides the pipeline payload, and each layer folds
    (base key, microbatch id, global layer index) into its dropout key, so
    every stage and every in-flight microbatch draws independent masks —
    the PP analogue of the per-shard fold_in in
    `m3p_tpu.parallel.sp.seq_parallel_run_blocks`.  Refusing to train
    silently without regularization: ``deterministic=False`` with a nonzero
    dropout rate and no rng is a hard error.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from m3p_tpu.model.layers import EncoderBlock

    cfg = model.cfg
    b = x.shape[0]
    assert b % n_microbatches == 0, (b, n_microbatches)
    n_stages = mesh.shape[axis]
    assert cfg.n_layers % n_stages == 0, (cfg.n_layers, n_stages)
    layers_per_stage = cfg.n_layers // n_stages

    use_dropout = (not deterministic) and (
        cfg.dropout > 0 or cfg.attention_dropout > 0)
    if use_dropout and dropout_rng is None:
        raise ValueError(
            "pp_run_blocks: training forward (deterministic=False) with "
            f"dropout={cfg.dropout}/attention_dropout={cfg.attention_dropout}"
            " requires a dropout rng (pass rngs={'dropout': key}); refusing"
            " to silently drop regularization")

    stacked = stack_block_params(params, cfg.n_layers)
    mb = x.reshape(n_microbatches, b // n_microbatches, *x.shape[1:])
    mb_mask = mask.reshape(n_microbatches, b // n_microbatches,
                           mask.shape[1])
    mb_ids = jnp.arange(n_microbatches, dtype=jnp.int32)

    block = EncoderBlock(
        n_heads=cfg.n_heads, dim=cfg.emb_dim, ffn_dim=cfg.ffn_dim,
        dropout=cfg.dropout, attention_dropout=cfg.attention_dropout,
        gelu_activation=cfg.gelu_activation, has_cross_attention=True,
        dtype=jnp.dtype(cfg.dtype), param_dtype=jnp.dtype(cfg.param_dtype),
        use_pallas=False)

    if not use_dropout:
        def stage_fn(stage_params, payload):
            h, mask_, mb_id = payload

            def one_layer(h, layer_params):
                out, _ = block.apply({"params": layer_params}, h, mask_,
                                     False, None, None, None, True)
                return out, None

            h, _ = jax.lax.scan(one_layer, h, stage_params)
            return h, mask_, mb_id

        def body(p, payload):
            return spmd_pipeline(stage_fn, p, payload, axis)

        out_mb, _, _ = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), (P(), P(), P())),
            out_specs=(P(), P(), P()),
            axis_names={axis},
            check_vma=False,
        )(stacked, (mb, mb_mask, mb_ids))
    else:
        def body(p, payload, key):
            def stage_fn(stage_params, pl):
                h, mask_, mb_id = pl
                stage = jax.lax.axis_index(axis)
                mb_key = jax.random.fold_in(key, mb_id)

                def one_layer(h, xs):
                    layer_params, li = xs
                    lkey = jax.random.fold_in(
                        mb_key, stage * layers_per_stage + li)
                    out, _ = block.apply(
                        {"params": layer_params}, h, mask_,
                        False, None, None, None, False,
                        rngs={"dropout": lkey})
                    return out, None

                h, _ = jax.lax.scan(
                    one_layer, h,
                    (stage_params,
                     jnp.arange(layers_per_stage, dtype=jnp.int32)))
                return h, mask_, mb_id

            return spmd_pipeline(stage_fn, p, payload, axis)

        out_mb, _, _ = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), (P(), P(), P()), P()),
            out_specs=(P(), P(), P()),
            axis_names={axis},
            check_vma=False,
        )(stacked, (mb, mb_mask, mb_ids), dropout_rng)
    return out_mb.reshape(b, *x.shape[1:])


from m3p_tpu.parallel.sp import ShardedStackModel


class PPModel(ShardedStackModel):
    """Pipeline-parallel model handle: the Trainer swaps this in when the
    mesh has ``pp > 1`` (`--mesh_pp`/`--pp_stages`), so EVERY objective's
    non-causal encoder stack runs the GPipe schedule.  Same duck-typed
    ``apply(method=...)`` dispatch as `m3p_tpu.parallel.sp.ShardedStackModel`
    (of which this is the PP specialisation).  Training forwards apply real
    dropout: per-(microbatch, layer) keys are folded inside the pipeline
    (see `pp_run_blocks`), matching the plain path's regularization
    semantics; embeddings/heads keep their dropout rngs on the replicated
    path."""

    def __init__(self, model, mesh, axis: str = "pp",
                 n_microbatches: int = 2):
        super().__init__(model)
        self.mesh = mesh
        self.axis = axis
        self.n_microbatches = n_microbatches

    def _blocks(self, variables, x, mask, deterministic, rngs):
        params = (variables["params"]
                  if isinstance(variables, dict) and "params" in variables
                  else variables)
        return pp_run_blocks(self.model, params, x, mask, self.mesh,
                             self.axis, self.n_microbatches,
                             deterministic=deterministic,
                             dropout_rng=self._rng(rngs))


def pipelined_encode_joint(
    model,
    params,
    tokens: jax.Array,
    text_mask: jax.Array,
    feats: jax.Array,
    locs: jax.Array,
    img_mask: jax.Array,
    mesh,
    axis: str = "pp",
    n_microbatches: int = 4,
    refine_image: bool = False,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """encode_joint with the encoder stack pipelined over the ``pp`` axis.

    Embedding (incl. [img; text] concat and AoA refine) runs replicated; each
    pipeline stage holds n_layers/S consecutive blocks and microbatches of
    the batch stream through them.
    """
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else None
    x, joint_mask = model.apply(
        {"params": params}, tokens, text_mask, feats, locs, img_mask,
        refine_image, deterministic, method=model.embed_joint, rngs=rngs)
    return pp_run_blocks(model, params, x, joint_mask, mesh, axis,
                         n_microbatches, deterministic=deterministic,
                         dropout_rng=dropout_rng)


# ---------------------------------------------------------------------------
# full train step through the pipeline (loss + grad, not just the encoder)
# ---------------------------------------------------------------------------


def make_pp_itm_train_step(model, mesh, sample_n: int, axis: str = "pp",
                           n_microbatches: int = 2, donate: bool = False):
    """Jitted retrieval train step whose joint encoder runs pipelined over
    the ``pp`` axis: loss and parameter gradients flow through the GPipe
    schedule (ppermute is linear, so jax.grad derives the reverse schedule).
    Deterministic forward for exact loss-parity assertions; the Trainer's
    general `PPModel` path applies real per-(microbatch, layer) dropout.

    Same (state, batch, rng) -> (state, metrics) contract as
    `m3p_tpu.train.steps.make_train_step`; loss/grads match the unsharded
    ITM step exactly (asserted in dryrun_multichip).
    """
    from m3p_tpu.model.transformer import lengths_to_mask
    from m3p_tpu.train import steps as S

    def loss_fn(params, batch, rng):
        tokens = batch["tokens"]
        text_mask = lengths_to_mask(batch["text_len"], tokens.shape[1])
        img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
        hidden = pipelined_encode_joint(
            model, params, tokens, text_mask, batch["feats"], batch["locs"],
            img_mask, mesh, axis=axis, n_microbatches=n_microbatches,
            refine_image=True)
        scores = model.apply({"params": params}, hidden,
                             method=model.itm_score)
        ce, bce = S.itm_grid_losses(scores, batch["pos_label"], sample_n)
        loss = ce + bce
        return loss, {"loss": loss, "ce": ce, "bce": bce}

    return S.make_train_step(lambda p, b, k, **lam: loss_fn(p, b, k),
                             donate=donate)
