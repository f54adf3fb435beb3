"""Sharding rules: logical parameter axes -> mesh axes.

One mechanism expresses every parallelism strategy (SURVEY.md §2.3):
  * DP   — batch dim sharded over ("data", "fsdp")
  * FSDP — parameter "embed" rows sharded over "fsdp" (ZeRO-3 style; XLA
    inserts all-gathers before use and reduce-scatters on gradients)
  * TP   — Megatron sharding: qkv/mlp output columns over "tensor", the
    following projection's input rows over "tensor"; vocab-parallel embedding
  * SP   — sequence axis available as "seq" for ring/blockwise attention
  * EP   — MoE expert weights ("expert" logical axis) over the "expert"
    mesh axis (see model/layers.py::MoEFFN)

The model annotates parameters with logical names (vocab/embed/qkv/mlp/heads);
these rules map them onto the mesh, and GSPMD propagates everything else.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis -> mesh axis (None = replicate)
LOGICAL_RULES = (
    ("batch", ("data", "fsdp")),
    ("vocab", "tensor"),
    ("embed", "fsdp"),
    ("qkv", "tensor"),
    ("mlp", "tensor"),
    ("heads", "tensor"),
    ("expert", "expert"),
)


def get_param_pspecs(init_fn) -> Any:
    """Abstract-init the model and return the tree of logical PartitionSpecs
    carried by the nn.Partitioned parameter metadata."""
    abs_vars = jax.eval_shape(init_fn)
    specs = nn.get_partition_spec(abs_vars)
    return specs["params"] if "params" in specs else specs


def logical_to_shardings(spec_tree, mesh: Mesh, rules=LOGICAL_RULES):
    return nn.logical_to_mesh_sharding(spec_tree, mesh, rules)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim over (data, fsdp); everything else replicated."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def _shard_like(tree, params_treedef, param_shardings, replicated):
    """Map optimizer-state subtrees that mirror the parameter tree onto the
    parameter shardings; everything else (counts, scalars) is replicated.

    Optax states (e.g. ScaleByAdamState.mu/.nu) reuse the params treedef
    exactly, so structural matching is precise — no shape heuristics.
    """
    if jax.tree.structure(tree) == params_treedef:
        return param_shardings
    # recurse through container nodes (tuples / namedtuples / lists / dicts)
    if isinstance(tree, (tuple, list)):
        mapped = [_shard_like(c, params_treedef, param_shardings, replicated)
                  for c in tree]
        if isinstance(tree, tuple) and hasattr(tree, "_fields"):
            return type(tree)(*mapped)
        return type(tree)(mapped)
    if isinstance(tree, dict):
        return {k: _shard_like(v, params_treedef, param_shardings, replicated)
                for k, v in tree.items()}
    return jax.tree.map(lambda _: replicated, tree)


def train_state_shardings(state, mesh: Mesh, param_pspecs,
                          rules=LOGICAL_RULES):
    """Build a TrainState-shaped tree of NamedShardings."""
    param_shardings = logical_to_shardings(param_pspecs, mesh, rules)
    replicated = NamedSharding(mesh, P())
    params_treedef = jax.tree.structure(state.params)
    opt_shardings = _shard_like(state.opt_state, params_treedef,
                                param_shardings, replicated)
    return state.replace(step=replicated, params=param_shardings,
                         opt_state=opt_shardings)


def shard_train_state(state, mesh: Mesh, param_pspecs, rules=LOGICAL_RULES):
    """Place a TrainState on the mesh.  Returns (sharded_state, shardings)."""
    shardings = train_state_shardings(state, mesh, param_pspecs, rules)
    sharded = jax.tree.map(jax.device_put, state, shardings)
    return sharded, shardings


def model_param_pspecs(model_cfg):
    """Logical PartitionSpecs for a full M3P parameter tree via abstract init
    (no real allocation) — the input `train_state_shardings` needs."""
    import jax.numpy as jnp

    from m3p_tpu.model import _init_method
    from m3p_tpu.model.transformer import M3PModel

    def abstract_init():
        m = M3PModel(model_cfg)
        b, s, r = 2, 4, 2
        return m.init(jax.random.PRNGKey(0), jnp.zeros((b, s), jnp.int32),
                      jnp.ones((b, s), bool),
                      jnp.zeros((b, r, model_cfg.img_feat_dim), jnp.float32),
                      jnp.zeros((b, r, model_cfg.img_loc_dim), jnp.float32),
                      jnp.ones((b, r), bool), jnp.zeros((b, s), jnp.int32),
                      method=_init_method)

    return get_param_pspecs(abstract_init)
