"""Profile ONE eval-grid chunk forward and print the top ops by self time.

Usage: python tools/profile_eval_chunk.py [chunk]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import glob

    import jax
    import jax.numpy as jnp

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.model import build_model
    from m3p_tpu.eval.retrieval import _score_chunk

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = ModelConfig(
        n_words=250002, mask_index=250001, n_layers=12, emb_dim=768,
        n_heads=12, dropout=0.1, attention_dropout=0.0, max_region_num=100,
        dtype="bfloat16")
    model, params = build_model(cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    n_img, n_cap = 64, 512
    cap_tokens = jnp.asarray(rng.randint(4, 250000, (n_cap, 64)), jnp.int32)
    cap_len = jnp.asarray(rng.randint(8, 64, (n_cap,)), jnp.int32)
    feats = jnp.asarray(rng.randn(n_img, 100, 2048), jnp.float32)
    locs = jnp.asarray(rng.rand(n_img, 100, 5), jnp.float32)
    img_len = jnp.full((n_img,), 100, jnp.int32)
    ci = jnp.asarray(np.arange(chunk) % n_cap, jnp.int32)
    ii = jnp.asarray(np.arange(chunk) % n_img, jnp.int32)

    def run():
        s = _score_chunk(model, params, cap_tokens, cap_len, feats, locs,
                         img_len, ci, ii, refine_image=True)
        return float(s.sum())

    run()  # compile
    import time
    t0 = time.perf_counter()
    for _ in range(5):
        run()
    dt = (time.perf_counter() - t0) / 5
    print(f"chunk={chunk}: {dt*1e3:.1f} ms -> {chunk/dt:.0f} pairs/s")

    trace_dir = "/tmp/eval_chunk_trace"
    with jax.profiler.trace(trace_dir):
        run()
    # newest xplane file
    pb = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(pb)
    totals = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                totals[name] = totals.get(name, 0) + dur
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:25]
    tot = sum(totals.values())
    print(f"total device ns: {tot/1e6:.1f} ms")
    for name, ns in top:
        print(f"{ns/1e6:8.2f} ms  {100*ns/max(tot,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
