"""300-step convergence check: fused-adam bf16 moments vs optax fp32 chain.

Same methodology as the int8_bwd FFN validation (STATUS.md): fixed data/RNG,
flagship config, compare the loss trajectory.
"""
import sys
import time

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

GROUPS, SAMPLE_N, MAX_LEN, MAX_REGIONS = 20, 4, 64, 100
STEPS = 300


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

    mode = sys.argv[1]  # "ref" | "fused_bf16_master"
    spec = "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005"
    if mode == "fused_bf16_master":
        spec += ",fused=1,mu_dtype=bfloat16,nu_dtype=bfloat16,master=1"

    cfg = ModelConfig(
        n_words=250002, mask_index=250001, n_layers=12, emb_dim=768,
        n_heads=12, dropout=0.1, attention_dropout=0.0,
        max_region_num=MAX_REGIONS, dtype="bfloat16", ffn_quant="int8_bwd")
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(spec, clip_grad_norm=5.0)
    state = create_train_state(params, tx)
    mask_cfg = MaskingConfig(max_pred=16, n_words=cfg.n_words,
                             mask_index=cfg.mask_index)

    rng = np.random.RandomState(0)
    batches = [
        {k: jnp.asarray(v) for k, v in synthetic.make_pretrain_batch(
            rng, GROUPS, SAMPLE_N, MAX_LEN, MAX_REGIONS,
            cfg.n_words).items()}
        for _ in range(8)
    ]

    def loss_fn(params, b, key):
        return S.mct_pretrain_loss(
            model, params, b, key, mask_cfg, SAMPLE_N,
            lambda_rel=1.0, lambda_mlm=1.0, lambda_mrm=1.0, lambda_mrfr=1.0,
            lambda_clcm=1.0, refine_image=True, deterministic=False)

    step = S.make_train_step(loss_fn, donate=True)
    keys = [jax.random.key(i, impl="rbg") for i in range(STEPS)]
    t0 = time.time()
    for i in range(STEPS):
        state, metrics = step(state, batches[i % 8], keys[i])
        if i % 50 == 0 or i == STEPS - 1:
            print(f"{mode} step {i}: loss={float(metrics['loss']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
