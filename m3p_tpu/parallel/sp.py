"""Sequence parallelism integrated with the model.

Long-sequence configs shard the (B, R+S, D) joint-stream activations over a
``seq`` mesh axis: projections, LayerNorms and FFNs are position-wise (no
communication), and self-attention runs ring attention — K/V blocks rotate
between neighbors over ICI while each device attends for its local queries
(`m3p_tpu.ops.ring_attention`).  Embeddings (including the [img; text] concat
and positions) are computed replicated, then sliced.

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
    """encode_joint with the encoder stack sharded over the sequence axis.

    Requires (R + S) divisible by the axis size.  Returns the same
    (B, R+S, D) hidden states as `model.encode_joint` (deterministic mode).
    """
    x, joint_mask = model.apply(
        {"params": params}, tokens, text_mask, feats, locs, img_mask,
        refine_image, deterministic, method=model.embed_joint)
    n = mesh.shape[axis]
    assert x.shape[1] % n == 0, (x.shape, n)

    sp_cfg = dataclasses.replace(model.cfg, seq_axis=axis,
                                 use_pallas_attention=False)
    sp_model = M3PModel(sp_cfg)

    def body(params, x_local, mask_local):
        return sp_model.apply({"params": params}, x_local, mask_local,
                              deterministic, method=sp_model.run_blocks_only)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    return fn(params, x, joint_mask)


def make_sp_itm_train_step(model, mesh: Mesh, sample_n: int,
                           axis: str = "seq", donate: bool = False):
    """Jitted retrieval train step with the encoder stack sequence-parallel:
    activations shard over ``axis`` inside shard_map (ring attention for
    self-attention), the ITM loss is computed on the gathered pooled token,
    and gradients flow back through the collectives.  Deterministic forward.

    Loss/grads match the unsharded ITM step (asserted in dryrun_multichip).
    """
    from m3p_tpu.model.transformer import lengths_to_mask
    from m3p_tpu.train import steps as S

    def loss_fn(params, batch, rng):
        tokens = batch["tokens"]
        text_mask = lengths_to_mask(batch["text_len"], tokens.shape[1])
        img_mask = lengths_to_mask(batch["img_len"], batch["feats"].shape[1])
        hidden = seq_parallel_encode_joint(
            model, params, tokens, text_mask, batch["feats"], batch["locs"],
            img_mask, mesh, axis=axis, refine_image=True)
        scores = model.apply({"params": params}, hidden,
                             method=model.itm_score)
        from m3p_tpu.train.steps import itm_grid_losses

        ce, bce = itm_grid_losses(scores, batch["pos_label"], sample_n)
        loss = ce + bce
        return loss, {"loss": loss, "ce": ce, "bce": bce}

    return S.make_train_step(lambda p, b, k, **lam: loss_fn(p, b, k),
                             donate=donate)
