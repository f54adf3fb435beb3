"""Retrieval eval-grid throughput: pairs/s for the chunked joint-forward
scorer (`eval/retrieval.py::retrieval_grid_scores`).

Measures the flagship model on a synthetic caption/image pool shaped like
Multi30K test (n_img x n_cap grid, 100-region images, 64-token captions).

Usage: python tools/bench_eval_grid.py [n_img n_cap chunk_size] [--int8|--q8]
       [--bucket] [--once] [--caplen LO:HI]

--int8: dynamic int8 FFN GEMMs (weights re-quantized every chunk)
--q8:   frozen-weight int8 (weights quantized ONCE, attention+FFN GEMMs on
        the int8 MXU — the inference-mode path, `model.capture_q8`)
--bucket: enable caption length bucketing (measured slower at Multi30K
        shapes — see retrieval_grid_scores docstring — default off)
--once: single timed pass incl. compile (for very large grids); default is
        one untimed compile pass + one timed pass at identical pool shapes
--caplen LO:HI: synthetic caption length range (default 8:20 ~ Multi30K)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.model import build_model
    from m3p_tpu.eval.retrieval import retrieval_grid_scores

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_img = int(args[0]) if args else 100
    n_cap = int(args[1]) if len(args) > 1 else 500
    chunk = int(args[2]) if len(args) > 2 else 512
    int8 = "--int8" in sys.argv
    q8 = "--q8" in sys.argv

    cfg = ModelConfig(
        n_words=250002, mask_index=250001, n_layers=12, emb_dim=768,
        n_heads=12, dropout=0.1, attention_dropout=0.0, max_region_num=100,
        dtype="bfloat16", ffn_quant="int8_bwd" if int8 else "none")
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    if q8:
        from m3p_tpu.model import capture_q8, quantized_inference_model

        model = quantized_inference_model(cfg)
        t0 = time.perf_counter()
        params = {"params": params, "q8": capture_q8(model, params)}
        print({"q8_capture_secs": round(time.perf_counter() - t0, 1)})

    bucket = "--bucket" in sys.argv
    once = "--once" in sys.argv
    lo, hi = 8, 20
    for i, a in enumerate(sys.argv):
        if a == "--caplen":
            lo, hi = (int(x) for x in sys.argv[i + 1].split(":"))

    rng = np.random.RandomState(0)
    cap_tokens = np.ones((n_cap, 64), np.int32)  # pad=1
    cap_len = rng.randint(lo, hi + 1, (n_cap,)).astype(np.int32)
    for i, l in enumerate(cap_len):
        cap_tokens[i, :l] = rng.randint(4, 250000, l)
    img_feats = rng.randn(n_img, 100, 2048).astype(np.float32)
    img_locs = rng.rand(n_img, 100, 5).astype(np.float32)
    img_len = np.full((n_img,), 100, np.int32)

    def run():
        return retrieval_grid_scores(model, params, cap_tokens, cap_len,
                                     img_feats, img_locs, img_len,
                                     chunk_size=chunk, length_bucket=bucket)

    if not once:
        t0 = time.perf_counter()
        run()  # compile pass at identical pool shapes
        print({"compile_pass_secs": round(time.perf_counter() - t0, 1)})
    t0 = time.perf_counter()
    scores = run()
    dt = time.perf_counter() - t0
    pairs = n_img * n_cap
    print({"pairs": pairs, "chunk": chunk, "int8": int8, "q8": q8,
           "bucket": bucket, "caplen": f"{lo}:{hi}",
           "secs": round(dt, 1), "pairs_per_s": round(pairs / dt, 1)})
    assert np.isfinite(scores).all()


if __name__ == "__main__":
    main()
