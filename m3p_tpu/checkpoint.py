"""Checkpointing: Orbax state persistence + reference PyTorch ``.pth`` import.

Replaces the reference checkpoint machinery (`xtrainer.py:511-625`,
`model/__init__.py:96-124`):
  * `save_checkpoint` / `restore_checkpoint` — full train state (params +
    optimizer moments + step + data-iterator state), unlike the reference
    which dropped optimizer moments on resume (apex workaround,
    `xtrainer.py:580-592`)
  * `convert_reference_state_dict` — maps the reference `TransformerModel`
    parameter naming onto this framework's tree (transposed Linear kernels,
    `module.` prefix stripping, missing-key backfill)
  * `average_checkpoints` — the `--multi_reload_model` weighted blend
    (`model/__init__.py:107-123`)
"""

from __future__ import annotations

import logging
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("m3p_tpu")


# ---------------------------------------------------------------------------
# Orbax train-state checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None
                    ) -> None:
    """Persist {params, opt_state, step} (+ host-side extras) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state,
               "step": state.step}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    # the Orbax save above is COLLECTIVE in multi-host runs (every process
    # must call it).  Host-side extras: the shared fields are written once
    # (process 0); the Grain loader state is RANK-SPECIFIC (iterators are
    # ShardByJaxProcess-sharded), so each process persists its own file and
    # restores from it.
    if extra:
        import json

        extra = dict(extra)
        loader_state = extra.pop("loader_state", None)
        if jax.process_index() == 0:
            with open(os.path.join(path, "extra.json"), "w") as f:
                json.dump(extra, f, default=str)
        if loader_state:
            rank_file = os.path.join(
                path, f"loader_state.{jax.process_index()}.json")
            with open(rank_file, "w") as f:
                json.dump(loader_state, f, default=str)


def restore_checkpoint(path: str, state):
    """Restore into the shape/sharding of ``state``; returns (state, extra)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    restored = ckptr.restore(path, template)
    new_state = state.replace(params=restored["params"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
    extra: Dict[str, Any] = {}
    extra_path = os.path.join(path, "extra.json")
    if os.path.exists(extra_path):
        import json

        with open(extra_path) as f:
            extra = json.load(f)
    # rank-specific Grain loader state (see save_checkpoint)
    rank_file = os.path.join(
        path, f"loader_state.{jax.process_index()}.json")
    if os.path.exists(rank_file):
        import json

        with open(rank_file) as f:
            extra["loader_state"] = json.load(f)
    return new_state, extra


def load_params_checkpoint(path: str) -> Dict[str, Any]:
    """Weights-only load from an Orbax checkpoint directory: returns the
    ``params`` subtree as host numpy arrays, ignoring optimizer state/step.

    This is the framework-native analogue of the reference's fine-tune
    workflow — pretrain, then `--reload_model <pretrained>` into a fresh
    optimizer (`train_x.py:394-521` passes the pretrained .pth as
    `--reload_model`); here the pretrained artifact is our own checkpoint.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)      # saved structure, no template
    return jax.tree.map(np.asarray, restored["params"])


# ---------------------------------------------------------------------------
# reference .pth import
# ---------------------------------------------------------------------------

def _set(tree: Dict, path: Sequence[str], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


def convert_reference_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_layers: int,
    refine_layers: int = 3,
) -> Dict[str, Any]:
    """Map a reference `TransformerModel` state dict (numpy values) onto this
    framework's parameter tree.

    Name map (reference `transformer.py:610-729` -> m3p_tpu.model):
      embeddings.weight                  -> text_emb/word/embedding
      position_embeddings.weight         -> text_emb/position/embedding
      cross_lang_embeddings.weight       -> text_emb/lang/embedding
      layer_norm_emb.*                   -> text_emb/ln_emb/ln
      attentions.N.{q,k,v,out}_lin       -> block_N/attn/*_lin   (kernel = W.T)
      layer_norm1.N / layer_norm15.N / layer_norm2.N -> block_N/ln1|ln15|ln2
      encoder_attn.N.*                   -> block_N/encoder_attn/*
      ffns.N.lin1|lin2                   -> block_N/ffn/lin1|lin2
      image_embeddings.*                 -> image_emb/{img,loc,dist}_proj, ln
      refine_embeddings.layers.N.*       -> refiner/layer_N/*
      pooled_layer(.2)/seq_relationship(2) -> itm|clcm_pooler/dense|score
      mrfr_dense                         -> mrfr_head/dense
      transformer_obj / pred_obj_layer   -> obj_pred/*
      pred_layer.proj.bias               -> pred_layer/bias (weight is tied)
    """
    params: Dict[str, Any] = {}

    sd = {re.sub(r"^module\.", "", k): np.asarray(v)
          for k, v in state_dict.items()}

    def linear(src: str, dst: Sequence[str]) -> None:
        if f"{src}.weight" in sd:
            _set(params, list(dst) + ["kernel"], sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(params, list(dst) + ["bias"], sd[f"{src}.bias"])

    def lnorm(src: str, dst: Sequence[str]) -> None:
        if f"{src}.weight" in sd:
            _set(params, list(dst) + ["ln", "scale"], sd[f"{src}.weight"])
        if f"{src}.bias" in sd:
            _set(params, list(dst) + ["ln", "bias"], sd[f"{src}.bias"])

    def embed(src: str, dst: Sequence[str]) -> None:
        if f"{src}.weight" in sd:
            _set(params, list(dst) + ["embedding"], sd[f"{src}.weight"])

    embed("embeddings", ["text_emb", "word"])
    embed("position_embeddings", ["text_emb", "position"])
    embed("cross_lang_embeddings", ["text_emb", "lang"])
    lnorm("layer_norm_emb", ["text_emb", "ln_emb"])

    for i in range(n_layers):
        blk = f"block_{i}"
        for lin in ("q_lin", "k_lin", "v_lin", "out_lin"):
            linear(f"attentions.{i}.{lin}", [blk, "attn", lin])
            linear(f"encoder_attn.{i}.{lin}", [blk, "encoder_attn", lin])
        lnorm(f"layer_norm1.{i}", [blk, "ln1"])
        lnorm(f"layer_norm15.{i}", [blk, "ln15"])
        lnorm(f"layer_norm2.{i}", [blk, "ln2"])
        linear(f"ffns.{i}.lin1", [blk, "ffn", "lin1"])
        linear(f"ffns.{i}.lin2", [blk, "ffn", "lin2"])

    linear("image_embeddings.image_embeddings", ["image_emb", "img_proj"])
    linear("image_embeddings.image_location_embeddings",
           ["image_emb", "loc_proj"])
    linear("image_embeddings.image_distbution_embeddings",
           ["image_emb", "dist_proj"])
    lnorm("image_embeddings.LayerNorm", ["image_emb", "ln"])

    for i in range(refine_layers):
        src = f"refine_embeddings.layers.{i}"
        dst = ["refiner", f"layer_{i}"]
        # MultiHeadedDotAttention linears: 0=q, 1=k, 2=v
        linear(f"{src}.self_attn.linears.0", dst + ["aoa_attn", "q_lin"])
        linear(f"{src}.self_attn.linears.1", dst + ["aoa_attn", "k_lin"])
        linear(f"{src}.self_attn.linears.2", dst + ["aoa_attn", "v_lin"])
        linear(f"{src}.self_attn.aoa_layer.0", dst + ["aoa_attn", "aoa"])
        lnorm(f"{src}.sublayer.0.norm", dst + ["ln_attn"])
        lnorm(f"{src}.sublayer.1.norm", dst + ["ln_ffn"])
        linear(f"{src}.feed_forward.lin1", dst + ["ffn", "lin1"])
        linear(f"{src}.feed_forward.lin2", dst + ["ffn", "lin2"])
    lnorm("refine_embeddings.norm", ["refiner", "ln_out"])

    linear("pooled_layer.dense", ["itm_pooler", "dense"])
    linear("seq_relationship", ["itm_pooler", "score"])
    linear("pooled_layer2.dense", ["clcm_pooler", "dense"])
    linear("seq_relationship2", ["clcm_pooler", "score"])
    linear("mrfr_dense", ["mrfr_head", "dense"])
    linear("transformer_obj.dense", ["obj_pred", "transform_dense"])
    lnorm("transformer_obj.LayerNorm", ["obj_pred", "transform_ln"])
    linear("pred_obj_layer.proj", ["obj_pred", "proj"])
    if "pred_layer.proj.bias" in sd:
        _set(params, ["pred_layer", "bias"], sd["pred_layer.proj.bias"])

    return params


def load_reference_checkpoint(pth_path: str, n_layers: int,
                              refine_layers: int = 3,
                              key: str = "model") -> Dict[str, Any]:
    """torch.load a reference checkpoint.pth and convert (CPU-only torch)."""
    import torch

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = blob[key] if isinstance(blob, dict) and key in blob else blob
    sd_np = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in sd.items()}
    return convert_reference_state_dict(sd_np, n_layers, refine_layers)


def export_reference_state_dict(
    params: Dict[str, Any],
    n_layers: int,
    refine_layers: int = 3,
) -> Dict[str, "np.ndarray"]:
    """Inverse of `convert_reference_state_dict`: map this framework's
    parameter tree back onto the reference `TransformerModel` state-dict
    naming (`transformer.py:610-729`), so checkpoints trained here can be
    reloaded by the reference codebase (`model/__init__.py:96-124`).

    Linear kernels transpose back to torch's (out, in) layout; values export
    as float32 numpy.  The tied `pred_layer.proj.weight` is emitted as a copy
    of the word embedding (torch state dicts list tied tensors under both
    names).  Round-trip (export -> convert) is identity — enforced by
    `tests/test_checkpoint.py::test_reference_export_roundtrip`.
    """
    sd: Dict[str, np.ndarray] = {}

    def get(path: Sequence[str]):
        node = params
        for k in path:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return np.asarray(node).astype(np.float32)

    def linear(src: str, dst: Sequence[str]) -> None:
        k = get(list(dst) + ["kernel"])
        b = get(list(dst) + ["bias"])
        if k is not None:
            sd[f"{src}.weight"] = np.ascontiguousarray(k.T)
        if b is not None:
            sd[f"{src}.bias"] = b

    def lnorm(src: str, dst: Sequence[str]) -> None:
        s = get(list(dst) + ["ln", "scale"])
        b = get(list(dst) + ["ln", "bias"])
        if s is not None:
            sd[f"{src}.weight"] = s
        if b is not None:
            sd[f"{src}.bias"] = b

    def embed(src: str, dst: Sequence[str]) -> None:
        e = get(list(dst) + ["embedding"])
        if e is not None:
            sd[f"{src}.weight"] = e

    embed("embeddings", ["text_emb", "word"])
    embed("position_embeddings", ["text_emb", "position"])
    embed("cross_lang_embeddings", ["text_emb", "lang"])
    lnorm("layer_norm_emb", ["text_emb", "ln_emb"])

    for i in range(n_layers):
        blk = f"block_{i}"
        for lin in ("q_lin", "k_lin", "v_lin", "out_lin"):
            linear(f"attentions.{i}.{lin}", [blk, "attn", lin])
            linear(f"encoder_attn.{i}.{lin}", [blk, "encoder_attn", lin])
        lnorm(f"layer_norm1.{i}", [blk, "ln1"])
        lnorm(f"layer_norm15.{i}", [blk, "ln15"])
        lnorm(f"layer_norm2.{i}", [blk, "ln2"])
        linear(f"ffns.{i}.lin1", [blk, "ffn", "lin1"])
        linear(f"ffns.{i}.lin2", [blk, "ffn", "lin2"])

    linear("image_embeddings.image_embeddings", ["image_emb", "img_proj"])
    linear("image_embeddings.image_location_embeddings",
           ["image_emb", "loc_proj"])
    linear("image_embeddings.image_distbution_embeddings",
           ["image_emb", "dist_proj"])
    lnorm("image_embeddings.LayerNorm", ["image_emb", "ln"])

    for i in range(refine_layers):
        src = f"refine_embeddings.layers.{i}"
        dst = ["refiner", f"layer_{i}"]
        linear(f"{src}.self_attn.linears.0", dst + ["aoa_attn", "q_lin"])
        linear(f"{src}.self_attn.linears.1", dst + ["aoa_attn", "k_lin"])
        linear(f"{src}.self_attn.linears.2", dst + ["aoa_attn", "v_lin"])
        linear(f"{src}.self_attn.aoa_layer.0", dst + ["aoa_attn", "aoa"])
        lnorm(f"{src}.sublayer.0.norm", dst + ["ln_attn"])
        lnorm(f"{src}.sublayer.1.norm", dst + ["ln_ffn"])
        linear(f"{src}.feed_forward.lin1", dst + ["ffn", "lin1"])
        linear(f"{src}.feed_forward.lin2", dst + ["ffn", "lin2"])
    lnorm("refine_embeddings.norm", ["refiner", "ln_out"])

    linear("pooled_layer.dense", ["itm_pooler", "dense"])
    linear("seq_relationship", ["itm_pooler", "score"])
    linear("pooled_layer2.dense", ["clcm_pooler", "dense"])
    linear("seq_relationship2", ["clcm_pooler", "score"])
    linear("mrfr_dense", ["mrfr_head", "dense"])
    linear("transformer_obj.dense", ["obj_pred", "transform_dense"])
    lnorm("transformer_obj.LayerNorm", ["obj_pred", "transform_ln"])
    linear("pred_obj_layer.proj", ["obj_pred", "proj"])
    bias = get(["pred_layer", "bias"])
    if bias is not None:
        sd["pred_layer.proj.bias"] = bias
    if "embeddings.weight" in sd:
        sd["pred_layer.proj.weight"] = sd["embeddings.weight"]

    return sd


def save_reference_checkpoint(
    pth_path: str,
    params: Dict[str, Any],
    n_layers: int,
    refine_layers: int = 3,
    extra_params: Optional[Dict[str, Any]] = None,
) -> None:
    """Write a checkpoint the reference codebase can `--reload_model`:
    `{'model': state_dict, 'params': {...}}`, the `save_model` blob layout
    (`xtrainer.py:511-529`).  CPU-only torch."""
    import torch

    sd = export_reference_state_dict(params, n_layers, refine_layers)
    blob = {
        "model": {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in sd.items()},
        "params": dict(extra_params or {}),
    }
    torch.save(blob, pth_path)


def merge_params(base: Dict[str, Any], loaded: Dict[str, Any]
                 ) -> Dict[str, Any]:
    """Overlay loaded params on an initialized tree, backfilling missing keys
    (reference reload semantics, `model/__init__.py:103-105`)."""

    def merge(b, l):
        if isinstance(b, dict):
            out = {}
            for k, v in b.items():
                if isinstance(l, dict) and k in l:
                    out[k] = merge(v, l[k])
                else:
                    out[k] = v
            return out
        if l is not None and tuple(np.shape(l)) == tuple(np.shape(b)):
            return jnp.asarray(l, dtype=b.dtype if hasattr(b, "dtype") else None)
        logger.warning("shape mismatch during reload; keeping initialized value")
        return b

    return merge(base, loaded)


def average_checkpoints(param_trees: List[Dict[str, Any]],
                        weights: Optional[List[float]] = None
                        ) -> Dict[str, Any]:
    """Weighted parameter average (`--multi_reload_model`,
    `model/__init__.py:107-123` — the reference blends two averaged groups
    0.6/0.4; pass explicit weights for that behavior)."""
    if weights is None:
        weights = [1.0 / len(param_trees)] * len(param_trees)
    assert len(weights) == len(param_trees)

    def avg(*leaves):
        return sum(w * l for w, l in zip(weights, leaves))

    return jax.tree.map(avg, *param_trees)
