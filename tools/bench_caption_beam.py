"""On-chip image-captioning generation throughput: batched beam search.

The reference decodes captions with beam search at batch size 1 in a
Python loop (`dataset_utils.py:51-140` sets bs=1 for test loaders;
`xevaluator.py:903-1117` loops them).  Here the whole beam search is one
jitted `lax.scan` with a functional KV cache (`model/generation.py`), so a
batch of images decodes in a single device program; this tool measures
captions/s on the flagship 12L/768d model.

Env knobs: CB_BATCH (default 64 images), CB_BEAM (5, the reference's
`--beam_size 5`), CB_MAXLEN (20), CB_REGIONS (100).
"""
import json
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

B = int(_os.environ.get("CB_BATCH", 64))
BEAM = int(_os.environ.get("CB_BEAM", 5))
MAX_LEN = int(_os.environ.get("CB_MAXLEN", 20))
R = int(_os.environ.get("CB_REGIONS", 100))
LAYERS = int(_os.environ.get("CB_LAYERS", 12))
DIM = int(_os.environ.get("CB_DIM", 768))
VOCAB = int(_os.environ.get("CB_VOCAB", 250002))
WARMUP, REPS = 1, 5


def main() -> None:
    import jax
    import jax.numpy as jnp

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.model import build_model
    from m3p_tpu.model.generation import beam_search, greedy_generate

    cfg = ModelConfig(n_words=VOCAB, mask_index=VOCAB - 1, n_layers=LAYERS,
                      emb_dim=DIM, n_heads=DIM // 64, dropout=0.0,
                      attention_dropout=0.0, max_region_num=R,
                      dtype="bfloat16")
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    q8 = "--q8" in _sys.argv
    if q8:
        # frozen-weight int8 decode (skinny GEMMs + halved vocab-table reads)
        from m3p_tpu.model import capture_q8, quantized_inference_model

        model = quantized_inference_model(cfg)
        params = {"params": params, "q8": capture_q8(model, params)}
        print("q8: frozen-weight int8 tables captured")

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, R, 2048).astype(np.float32))
    locs = jnp.asarray(np.abs(rng.rand(B, R, 5)).astype(np.float32))
    img_mask = jnp.ones((B, R), bool)

    @jax.jit
    def encode(params, feats, locs, img_mask):
        from m3p_tpu.model.transformer import as_variables

        return model.apply(as_variables(params), feats, locs, img_mask, None,
                           True, method=model.encode_image)

    fast = "--fast" in _sys.argv

    @jax.jit
    def beam(params, src_enc, img_mask):
        return beam_search(model, params, src_enc, img_mask, BEAM, MAX_LEN,
                           tgt_lang_id=0, length_penalty=1.0,
                           fast_topk=fast)

    @jax.jit
    def greedy(params, src_enc, img_mask):
        return greedy_generate(model, params, src_enc, img_mask, MAX_LEN,
                               tgt_lang_id=0)

    src_enc = encode(params, feats, locs, img_mask)

    results = {}
    for name, fn in (("beam%d" % BEAM, beam), ("greedy", greedy)):
        for _ in range(WARMUP):
            toks, lens = fn(params, src_enc, img_mask)
            float(lens.sum())
        t0 = time.perf_counter()
        for _ in range(REPS):
            toks, lens = fn(params, src_enc, img_mask)
        float(lens.sum())
        dt = (time.perf_counter() - t0) / REPS
        results[name] = B / dt
        print(f"{name}: {B / dt:.1f} captions/s "
              f"({dt * 1e3:.0f} ms / {B}-image batch, max_len {MAX_LEN})")

    print(json.dumps({
        "metric": "caption_beam_captions_per_sec",
        "value": round(results["beam%d" % BEAM], 2),
        "unit": "captions/s",
        "greedy": round(results["greedy"], 2),
        "batch": B, "beam": BEAM, "max_len": MAX_LEN,
    }))


if __name__ == "__main__":
    main()
