"""Long-context training throughput: MLM over a 2048-token stream, the
Pallas flash-attention path (engages at KV >= 1024) vs the XLA fallback.

The reference caps sequence length at 514 positions (`transformer.py:16`);
long context is a TPU-native scale axis here (SURVEY.md §5.7).  One chip;
the SP/ring path shards the same step across a seq mesh on real pods.
"""
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

B = int(_os.environ.get("LS_BATCH", 8))
S = int(_os.environ.get("LS_SEQ", 2048))
WARMUP, STEPS = 2, 10


def run(use_pallas: bool) -> float:
    import jax
    import jax.numpy as jnp

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.data.masking import MaskingConfig
    from m3p_tpu.data import synthetic
    from m3p_tpu.model import build_model
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state
    from m3p_tpu.train import steps as St

    cfg = ModelConfig(
        n_words=250002, mask_index=250001, n_layers=12, emb_dim=768,
        n_heads=12, dropout=0.1, attention_dropout=0.0,
        max_positions=S + 2, dtype="bfloat16",
        use_pallas_attention=use_pallas)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(
        "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005,"
        "fused=1,mu_dtype=bfloat16,nu_dtype=bfloat16,master=1",
        clip_grad_norm=5.0)
    state = create_train_state(params, tx)
    mask_cfg = MaskingConfig(max_pred=256, n_words=cfg.n_words,
                             mask_index=cfg.mask_index)
    rng = np.random.RandomState(0)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic.make_stream_batch(rng, B, S,
                                                     cfg.n_words).items()}

    def loss_fn(p, b, key):
        return St.mlm_loss(model, p, b, key, mask_cfg)

    step = St.make_train_step(loss_fn, donate=True)
    keys = [jax.random.key(i, impl="rbg") for i in range(WARMUP + STEPS)]
    for i in range(WARMUP):
        state, m = step(state, batch, keys[i])
        float(m["mlm"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, batch, keys[WARMUP + i])
    float(m["mlm"])
    dt = time.perf_counter() - t0
    return B * STEPS / dt


def main():
    out = {"metric": f"longseq_mlm_samples_per_sec (B={B}, S={S}, 12L/768d)"}
    pallas = run(True)
    out["pallas_flash"] = round(pallas, 2)
    print("pallas_flash:", out["pallas_flash"], flush=True)
    try:
        xla = run(False)
        out["xla_attention"] = round(xla, 2)
        out["speedup"] = round(pallas / xla, 3)
    except Exception as e:  # XLA materializes fp32 (B,H,S,S) scores and
        # OOMs at B=8/S=2048 (21.6G > 15.75G HBM) — the flash kernel's
        # O(S) memory is the point, not just its speed
        out["xla_attention"] = f"OOM ({type(e).__name__})"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
