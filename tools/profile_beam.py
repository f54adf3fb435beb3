"""Profile ONE beam-search decode call (flagship 12L/768d, 250k vocab) and
print the top device ops by self time — the beam step costs ~27 ms/token
step on v5e while greedy costs ~2.8 ms; this finds the gap.

Usage: python tools/profile_beam.py [--fast] [--q8]
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("PB_BATCH", 64))
BEAM = int(os.environ.get("PB_BEAM", 5))
MAX_LEN = int(os.environ.get("PB_MAXLEN", 20))
R = int(os.environ.get("PB_REGIONS", 100))


def main():
    import jax
    import jax.numpy as jnp

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.model import build_model
    from m3p_tpu.model.generation import beam_search
    from m3p_tpu.model.transformer import as_variables

    cfg = ModelConfig(n_words=250002, mask_index=250001, n_layers=12,
                      emb_dim=768, n_heads=12, dropout=0.0,
                      attention_dropout=0.0, max_region_num=R,
                      dtype="bfloat16")
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    if "--q8" in sys.argv:
        from m3p_tpu.model import capture_q8, quantized_inference_model

        model = quantized_inference_model(cfg)
        params = {"params": params, "q8": capture_q8(model, params)}
    fast = "--fast" in sys.argv

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, R, 2048), jnp.float32)
    locs = jnp.asarray(rng.rand(B, R, 5), jnp.float32)
    img_mask = jnp.ones((B, R), bool)

    @jax.jit
    def encode(params, feats, locs, img_mask):
        return model.apply(as_variables(params), feats, locs, img_mask,
                           None, True, method=model.encode_image)

    @jax.jit
    def beam(params, src_enc, img_mask):
        return beam_search(model, params, src_enc, img_mask, BEAM, MAX_LEN,
                           tgt_lang_id=0, length_penalty=1.0,
                           fast_topk=fast)

    src_enc = encode(params, feats, locs, img_mask)

    def run():
        toks, lens = beam(params, src_enc, img_mask)
        return float(lens.sum())

    run()  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        run()
    dt = (time.perf_counter() - t0) / 3
    print(f"beam{BEAM} B={B} max_len={MAX_LEN} fast={fast}: {dt*1e3:.0f} ms "
          f"-> {B/dt:.1f} captions/s")

    trace_dir = "/tmp/beam_trace"
    with jax.profiler.trace(trace_dir):
        run()
    pb = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))[-1]
    pd = jax.profiler.ProfileData.from_file(pb)
    totals = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                totals[ev.name] = totals.get(ev.name, 0) + ev.duration_ns
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    tot = sum(totals.values())
    print(f"total device ns: {tot/1e6:.1f} ms")
    for name, ns in top:
        print(f"{ns/1e6:8.2f} ms  {100*ns/max(tot,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
