"""Timeboxed round-3 attempt: fused Pallas FFN+LN block vs the XLA lowering.

Measures, at the EXACT bench operating point (BN=80, joint seq 164 ->
M=13120 rows, D=768, H=3072, bf16), forward-only wall time of:
  1. XLA:    ln2(x + ffn(x)) as jitted jnp (what the model runs today)
  2. Pallas: m3p_tpu.ops.fused_ffn.fused_ffn_ln at several M-tile sizes

plus parity.  The round-2 profile showed XLA's GEMM fusions already at
~79% of bf16 peak with <8% structural headroom; this records whether a
hand-fused block changes that.  Decision rule (VERDICT round-2 item 7):
if XLA wins again, record the number and stop.

Usage: python tools/bench_fused_ffn.py [--m 13120] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=30):
    fn(*args)[0].block_until_ready()          # compile
    float(jnp.sum(fn(*args)))                  # tunnel-safe sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=13120)   # 80 x 164
    p.add_argument("--d", type=int, default=768)
    p.add_argument("--h", type=int, default=3072)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from m3p_tpu.ops.fused_ffn import fused_ffn_ln, reference_ffn_ln

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.randn(args.m, args.d), dt)
    w1 = jnp.asarray(rng.randn(args.d, args.h) * 0.02, dt)
    b1 = jnp.zeros((args.h,), dt)
    w2 = jnp.asarray(rng.randn(args.h, args.d) * 0.02, dt)
    b2 = jnp.zeros((args.d,), dt)
    g = jnp.ones((args.d,), dt)
    be = jnp.zeros((args.d,), dt)

    xla = jax.jit(reference_ffn_ln)
    ref = xla(x, w1, b1, w2, b2, g, be)
    t_xla = timed(xla, x, w1, b1, w2, b2, g, be, iters=args.iters)
    flops = 4 * args.m * args.d * args.h
    print(f"XLA    : {t_xla * 1e3:7.3f} ms  "
          f"{flops / t_xla / 1e12:6.1f} TF/s", flush=True)

    results = {"xla_ms": round(t_xla * 1e3, 3)}
    for tm in (256, 512, 1024):
        try:
            fused = jax.jit(lambda *a: fused_ffn_ln(*a, tm=tm))
            out = fused(x, w1, b1, w2, b2, g, be)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t = timed(fused, x, w1, b1, w2, b2, g, be, iters=args.iters)
            print(f"Pallas tm={tm:4d}: {t * 1e3:7.3f} ms  "
                  f"{flops / t / 1e12:6.1f} TF/s  maxerr={err:.2e}  "
                  f"speedup={t_xla / t:.3f}x", flush=True)
            results[f"pallas_tm{tm}_ms"] = round(t * 1e3, 3)
            results[f"pallas_tm{tm}_err"] = err
        except Exception as e:  # noqa: BLE001 — record Mosaic failures
            print(f"Pallas tm={tm}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            results[f"pallas_tm{tm}_ms"] = None
    print(json.dumps(results))
