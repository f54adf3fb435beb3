"""Sequence parallelism integrated with the model.

Long-sequence configs shard the (B, S, D) encoder activations over a ``seq``
mesh axis: projections, LayerNorms and FFNs are position-wise (no
communication), and self-attention runs ring attention — K/V blocks rotate
between neighbors over ICI while each device attends for its local queries
(`m3p_tpu.ops.ring_attention`).  Embeddings (including the [img; text] concat
and positions) are computed replicated, then sliced.

**Composition**: the shard_map here is manual over the ``seq`` axis ONLY
(`axis_names={axis}` — JAX 0.9 semantics); every other mesh axis stays
automatic, so the outer jit's data-sharded batch and fsdp/tensor-sharded
parameters pass straight through and XLA inserts their collectives as usual.
One train step can therefore run data x tensor x seq simultaneously
(asserted in ``dryrun_multichip``).

`SPModel` duck-types the ``model.apply(..., method=...)`` surface the loss
functions use, so the Trainer turns sequence parallelism on for EVERY
objective by swapping the model handle (``--mesh_seq > 1``) — not just ITM.
Causal decoding (cross-attention / KV cache) stays on the plain path: decode
sequences are bounded by max_gen_len (~40) while the long dimension is the
joint [img; text] or source side.

The reference never scales sequence length at all (hard cap 514, SURVEY.md
§5.7); this is the mechanism that lifts that cap for the scale-up configs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from m3p_tpu.model.transformer import M3PModel


def seq_parallel_run_blocks(
    model: M3PModel,
    variables,
    x: jax.Array,                 # (B, S, D)
    mask: jax.Array,              # (B, S)
    mesh: Mesh,
    axis: str = "seq",
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the encoder stack with activations sharded over ``axis``.

    Pads S to a multiple of the axis size (padded positions masked out of
    attention, sliced off after).  Manual only over ``axis``: batch / weight
    shardings on other mesh axes compose automatically.
    """
    n = mesh.shape[axis]
    s = x.shape[1]
    pad = (-s) % n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))

    sp_cfg = dataclasses.replace(model.cfg, seq_axis=axis,
                                 use_pallas_attention=False)
    sp_model = M3PModel(sp_cfg)
    if not isinstance(variables, dict) or "params" not in variables:
        variables = {"params": variables}

    if deterministic or dropout_rng is None:
        def body(vars_, x_local, mask_local):
            return sp_model.apply(vars_, x_local, mask_local, True,
                                  method=sp_model.run_blocks_only)

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(), P(None, axis, None), P(None, axis)),
                       out_specs=P(None, axis, None),
                       axis_names={axis})
        out = fn(variables, x, mask)
    else:
        # per-shard dropout keys: fold the shard index into the step key so
        # every position still draws an independent mask
        def body(vars_, x_local, mask_local, key):
            r = {"dropout": jax.random.fold_in(
                key, jax.lax.axis_index(axis))}
            return sp_model.apply(vars_, x_local, mask_local, False,
                                  method=sp_model.run_blocks_only, rngs=r)

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(), P(None, axis, None), P(None, axis),
                                 P()),
                       out_specs=P(None, axis, None),
                       axis_names={axis})
        out = fn(variables, x, mask, dropout_rng)
    return out[:, :s] if pad else out


class ShardedStackModel:
    """Duck-types the ``M3PModel.apply(..., method=...)`` surface used by the
    loss functions (`m3p_tpu.train.steps`): non-causal encoder stacks route
    through a sharded block runner (`_blocks`, SP or PP); embeddings, heads
    and causal decoding delegate to the wrapped model unchanged.

    Method dispatch is by ``method.__name__`` — the losses pass
    ``method=model.encode_joint`` etc., and attribute access falls through to
    the wrapped model, so this object drops in wherever an `M3PModel` is
    used for training."""

    def __init__(self, model: M3PModel):
        self.model = model
        self.cfg = model.cfg

    def __getattr__(self, name):
        if name == "model":          # guard __init__-time recursion
            raise AttributeError(name)
        return getattr(self.model, name)

    # -- the sharded stack (SP/PP specialisation point) -------------------

    def _blocks(self, variables, x, mask, deterministic, rngs):
        raise NotImplementedError

    def _rng(self, rngs):
        return rngs.get("dropout") if rngs else None

    # -- apply dispatch ----------------------------------------------------

    def apply(self, variables, *args, method=None, rngs=None, **kw):
        name = getattr(method, "__name__", None)
        if name == "encode_joint":
            return self._encode_joint(variables, *args, rngs=rngs, **kw)
        if name == "encode_text":
            causal = args[4] if len(args) > 4 else kw.get("causal", False)
            src_enc = args[5] if len(args) > 5 else kw.get("src_enc")
            cache = args[7] if len(args) > 7 else kw.get("cache")
            if not causal and src_enc is None and cache is None:
                return self._encode_text(variables, *args, rngs=rngs, **kw)
        elif name == "encode_image":
            feats_embeds = kw.get("feats_embeds")
            if feats_embeds is None:
                return self._encode_image(variables, *args, rngs=rngs, **kw)
        return self.model.apply(variables, *args, method=method, rngs=rngs,
                                **kw)

    # -- sharded encoder topologies -----------------------------------------

    def _encode_joint(self, variables, tokens, text_mask, feats, locs,
                      img_mask, refine_image=False, deterministic=True,
                      token_embeds=None, feats_embeds=None, rngs=None):
        x, joint_mask = self.model.apply(
            variables, tokens, text_mask, feats, locs, img_mask,
            refine_image, deterministic, token_embeds, feats_embeds,
            method=self.model.embed_joint, rngs=rngs)
        return self._blocks(variables, x, joint_mask, deterministic, rngs)

    def _encode_text(self, variables, tokens, text_mask, langs=None,
                     positions=None, causal=False, src_enc=None,
                     src_mask=None, cache=None, deterministic=True,
                     token_embeds=None, image_enc=None, image_mask=None,
                     rngs=None):
        x = self.model.apply(
            variables, tokens, text_mask, langs, positions, deterministic,
            token_embeds, image_enc, image_mask,
            method=self.model.embed_text, rngs=rngs)
        out = self._blocks(variables, x, text_mask, deterministic, rngs)
        return out, None

    def _encode_image(self, variables, feats, locs, img_mask, dist=None,
                      refine_image=False, deterministic=True,
                      feats_embeds=None, refine_encoder=False, rngs=None):
        x = self.model.apply(
            variables, feats, locs, img_mask, dist, refine_image,
            deterministic, method=self.model.embed_image_regions, rngs=rngs)
        out = self._blocks(variables, x, img_mask, deterministic, rngs)
        if refine_encoder:
            out = self.model.apply(
                variables, out, img_mask,
                method=lambda m, a, b: m.refiner(
                    a, b, deterministic=deterministic), rngs=rngs)
        return out


class SPModel(ShardedStackModel):
    """Sequence-parallel model handle: every non-causal encoder stack runs
    ring-attention-sharded over the mesh ``seq`` axis, composing with
    data/fsdp/tensor sharding on the other axes."""

    def __init__(self, model: M3PModel, mesh: Mesh, axis: str = "seq"):
        super().__init__(model)
        self.mesh = mesh
        self.axis = axis

    def _blocks(self, variables, x, mask, deterministic, rngs):
        return seq_parallel_run_blocks(
            self.model, variables, x, mask, self.mesh, self.axis,
            deterministic=deterministic, dropout_rng=self._rng(rngs))


def seq_parallel_encode_joint(
    model: M3PModel,
    params,
    tokens: jax.Array,
    text_mask: jax.Array,
    feats: jax.Array,
    locs: jax.Array,
    img_mask: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    refine_image: bool = False,
    deterministic: bool = True,
) -> jax.Array:
    """encode_joint with the encoder stack sharded over the sequence axis
    (see `SPModel` for the general mechanism)."""
    return SPModel(model, mesh, axis)._encode_joint(
        {"params": params}, tokens, text_mask, feats, locs, img_mask,
        refine_image=refine_image, deterministic=deterministic)


def make_sp_itm_train_step(model, mesh: Mesh, sample_n: int,
                           axis: str = "seq", donate: bool = False):
    """Jitted retrieval train step with the encoder stack sequence-parallel:
    activations shard over ``axis`` inside shard_map (ring attention for
    self-attention), the ITM loss is computed on the gathered pooled token,
    and gradients flow back through the collectives.  Deterministic forward.

    Loss/grads match the unsharded ITM step (asserted in dryrun_multichip).
    (The general path is `SPModel` + the plain step factory — the Trainer
    uses that; this helper remains the minimal standalone recipe.)
    """
    from m3p_tpu.train import steps as S

    sp_model = SPModel(model, mesh, axis)

    def loss_fn(params, batch, rng, **lam):
        return S.itm_finetune_loss(sp_model, params, batch, rng, sample_n,
                                   deterministic=True)

    return S.make_train_step(loss_fn, donate=donate)
