"""Decompose the MCT step cost: encoder / refiner / heads / optimizer."""
import json
import time

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

GROUPS, SAMPLE_N, MAX_LEN, MAX_REGIONS = 16, 4, 64, 100
WARMUP, STEPS = 2, 10


def main():
    import jax
    import jax.numpy as jnp

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.data.masking import MaskingConfig
    from m3p_tpu.data import synthetic
    from m3p_tpu.model import build_model
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state
    from m3p_tpu.train import steps as S
    from m3p_tpu.model.transformer import lengths_to_mask

    cfg = ModelConfig(
        n_words=250002, mask_index=250001, n_layers=12, emb_dim=768,
        n_heads=12, dropout=0.1, attention_dropout=0.0,
        max_region_num=MAX_REGIONS, dtype="bfloat16", ffn_quant="int8_bwd")
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(
        "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005",
        clip_grad_norm=5.0)
    state = create_train_state(params, tx)
    mask_cfg = MaskingConfig(max_pred=16, n_words=cfg.n_words,
                             mask_index=cfg.mask_index)
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_pretrain_batch(
        rng, GROUPS, SAMPLE_N, MAX_LEN, MAX_REGIONS, cfg.n_words).items()}
    bn = batch["tokens"].shape[0]
    keys = [jax.random.key(i, impl="rbg") for i in range(WARMUP + STEPS)]

    def enc_loss(params, b, key, refine):
        text_mask = lengths_to_mask(b["text_len"], b["tokens"].shape[1])
        img_mask = lengths_to_mask(b["img_len"], b["feats"].shape[1])
        hidden = model.apply(
            {"params": params}, b["tokens"], text_mask, b["feats"],
            b["locs"], img_mask, refine, method=model.encode_joint,
            rngs={"dropout": key}, deterministic=False)
        return jnp.sum(hidden.astype(jnp.float32)) * 1e-9, {}

    def full_loss(params, b, key):
        return S.mct_pretrain_loss(
            model, params, b, key, mask_cfg, SAMPLE_N,
            lambda_rel=1.0, lambda_mlm=1.0, lambda_mrm=1.0,
            lambda_mrfr=1.0, lambda_clcm=1.0, refine_image=True,
            deterministic=False)

    def timed(fn, state_in):
        st = state_in
        out = None
        for i in range(WARMUP):
            st, out = fn(st, batch, keys[i])
        jax.block_until_ready(out)
        float(jax.tree.leaves(out)[0]) if out else None
        t0 = time.perf_counter()
        for i in range(STEPS):
            st, out = fn(st, batch, keys[WARMUP + i])
        float(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / STEPS * 1e3

    import functools

    def grad_only(loss_fn):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def f(st, b, key):
            (l, m), g = jax.value_and_grad(
                lambda p: loss_fn(p, b, key), has_aux=True)(st.params)
            # consume grads cheaply so they aren't dead-code-eliminated
            s = sum(jnp.sum(jnp.abs(x).astype(jnp.float32) > 1e30)
                    for x in jax.tree.leaves(g))
            return st, {"loss": l + s}
        return f

    import sys
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    fns = {
        "enc_ref": grad_only(lambda p, b, k: enc_loss(p, b, k, True)),
        "enc": grad_only(lambda p, b, k: enc_loss(p, b, k, False)),
        "loss": grad_only(full_loss),
        "step": S.make_train_step(full_loss, donate=True),
    }
    t = timed(fns[mode], state)
    print(json.dumps({"mode": mode, "ms": round(t, 2),
                      "samples_per_s": round(bn / t * 1e3, 1)}))


if __name__ == "__main__":
    main()
