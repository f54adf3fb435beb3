"""Benchmark: MCT multitask pre-training samples/sec/chip (the BASELINE.json
headline metric).

Runs the full flagship training step — 12L/768d/12H joint [100-region; 64-token]
encoder with AoA refine, ITM + MC-MLM + MC-MRM + MRFR losses, on-device MCT-style
masking, adam_inverse_sqrt — on synthetic data shaped exactly like the CC/SBU
pre-training batches, and reports joint-sequence throughput.

One sample == one (caption, image) candidate pair == one 164-token joint
sequence through the encoder (the reference's ``processed_s`` unit,
`xtrainer.py:2400`).

Precision mode: bf16 activations with int8-quantized FFN GEMMs
(`ffn_quant="int8_bwd"` — dynamic symmetric scales, int32 accumulation,
quantized dgrad/wgrad; the v5e int8 MXU runs at 2x the bf16 rate), bf16
live params with an fp32 master + bf16 Adam moments in the fused
single-pass optimizer (`fused=1,master=1,mu/nu_dtype=bfloat16` — see
`m3p_tpu.train.optim.FusedAdam`), and cross-batch packing of the active
MLM prediction slots before the 250k-vocab head (`pack_ratio=0.25`, see
`mct_pretrain_loss`).  These are documented framework modes analogous to
the reference's apex AMP levels; convergence for each numerics mode is
checked against the fp32-optimizer path over 300 flagship steps (loss
curves statistically indistinguishable — see STATUS.md).
Pure-bf16 throughput is 552 samples/s (vs_baseline 3.68) at BN=128;
bf16+int8 FFN with the unfused optax fp32 chain is 687 at BN=64.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is an analytic estimate of the PyTorch+Apex V100 baseline:
  fwd FLOPs/sample ≈ 24·S·d²·L (proj+FFN) + 4·S²·d·L (attn) + refiner+heads
                   ≈ 42 GFLOPs;  training ≈ 3x fwd ≈ 126 GFLOPs
  V100 fp16 peak 125 TFLOP/s at ~25% MFU (typical for this scale of torch
  model with host-side loss syncs, see SURVEY.md §3.1 D2H wart)
  -> ~150 samples/s/GPU  (BASELINE_EST below)
The ≥5x north-star target therefore corresponds to vs_baseline >= 5.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EST = 150.0  # estimated reference samples/s/GPU (see module docstring)

import os as _os

# experiment knobs (defaults = the shipped configuration)
GROUPS = int(_os.environ.get("BENCH_GROUPS", 20))   # BN=80: v5e sweet spot
SAMPLE_N = 4         # candidates per group -> BN = GROUPS*4 joint sequences
MAX_LEN = 64
MAX_REGIONS = 100
WARMUP = 3
STEPS = 20
REMAT = _os.environ.get("BENCH_REMAT", "0") == "1"
FFN_QUANT = _os.environ.get("BENCH_FFN_QUANT", "int8_bwd")
# reference training default (`/root/reference/M3P/train_x.py` --attention_dropout
# 0.1): the headline matches the reference recipe's regularization, served by
# the layout-native packed Pallas kernel with in-kernel hardware-PRNG dropout
# (852 samples/s round 5, vs 735 with the transposing small kernel and 614
# with the XLA mask path). Set BENCH_ATTN_DROPOUT=0.0 for the no-attn-dropout
# variant (873); both numbers are recorded in STATUS.md.
ATTN_DROPOUT = float(_os.environ.get("BENCH_ATTN_DROPOUT", "0.1"))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from m3p_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()   # repeat benches skip the 5-25 min compile

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.data.masking import MaskingConfig
    from m3p_tpu.data import synthetic
    from m3p_tpu.model import build_model
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state
    from m3p_tpu.train import steps as S

    cfg = ModelConfig(
        n_words=250002, mask_index=250001, n_layers=12, emb_dim=768,
        n_heads=12, dropout=0.1,
        attention_dropout=ATTN_DROPOUT,
        max_region_num=MAX_REGIONS, dtype="bfloat16",
        # int8 FFN GEMMs (see module docstring for the convergence check)
        ffn_quant=FFN_QUANT,
        remat=REMAT,
    )
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    tx, _ = build_optimizer(
        "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005,"
        "fused=1,mu_dtype=bfloat16,nu_dtype=bfloat16,master=1",
        clip_grad_norm=5.0)
    state = create_train_state(params, tx)

    mask_cfg = MaskingConfig(max_pred=16, n_words=cfg.n_words,
                             mask_index=cfg.mask_index)
    rng = np.random.RandomState(0)
    batch_np = synthetic.make_pretrain_batch(
        rng, GROUPS, SAMPLE_N, MAX_LEN, MAX_REGIONS, cfg.n_words)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    bn = batch["tokens"].shape[0]

    def loss_fn(params, b, key):
        return S.mct_pretrain_loss(
            model, params, b, key, mask_cfg, SAMPLE_N,
            lambda_rel=1.0, lambda_mlm=1.0, lambda_mrm=1.0, lambda_mrfr=1.0,
            lambda_clcm=1.0, refine_image=True, deterministic=False,
            pack_ratio=0.25)

    step = S.make_train_step(loss_fn, donate=True)

    # rbg PRNG: hardware RNG path for dropout masks (~7% faster than the
    # default threefry at this model size)
    keys = [jax.random.key(i, impl="rbg") for i in range(WARMUP + STEPS)]

    # NOTE: sync via host transfer (float(...)) — on the tunneled axon
    # platform block_until_ready returns before execution completes.
    for i in range(WARMUP):
        state, metrics = step(state, batch, keys[i])
        float(metrics["loss"])

    # steps chain through the donated state, so ONE final sync bounds the
    # whole timed region (training syncs stats every ~20 iters, not per step)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batch, keys[WARMUP + i])
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    samples_per_s = bn * STEPS / dt
    # hardware-grounded companions to the analytic vs_baseline (round-2
    # VERDICT weak #4): measured TFLOP/s and MFU against the v5e bf16 peak.
    # FLOPs/sample from the module-docstring model (~126 GFLOPs: 3x the
    # 42-GFLOP forward) — these two numbers do not depend on BASELINE_EST.
    flops_per_sample = 126e9
    v5e_bf16_peak = 197e12
    tflops = samples_per_s * flops_per_sample / 1e12
    print(json.dumps({
        "metric": "pretrain_samples_per_sec_per_chip",
        "value": round(samples_per_s, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_s / BASELINE_EST, 3),
        "tflops_per_sec": round(tflops, 1),
        "mfu_vs_bf16_peak": round(tflops * 1e12 / v5e_bf16_peak, 3),
        # self-describing config: the headline runs the REFERENCE recipe's
        # regularization (attention_dropout 0.1); BENCH_ATTN_DROPOUT=0.0
        # reproduces the no-attn-dropout variant (793 samples/s, STATUS.md)
        "config": {"attention_dropout": ATTN_DROPOUT, "dropout": 0.1,
                   "batch": bn, "ffn_quant": FFN_QUANT,
                   "layers": 12, "dim": 768, "joint_seq": MAX_LEN + MAX_REGIONS},
    }))


if __name__ == "__main__":
    main()
