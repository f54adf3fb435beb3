"""On-chip serving benchmark: InferenceEngine throughput + latency on the
flagship model.

Measures the deployment surface the reference lacks (`m3p_tpu/serve/`):
  * score  — ITM pair scoring throughput at the largest batch bucket
  * retrieve — single-query latency against a device-resident gallery
    (p50/p99 over repeated queries; the production interactive path)
  * http   — end-to-end HTTP round-trip through the stdlib server +
    MicroBatcher with concurrent clients (protocol + batching overhead)

Random weights (throughput is weight-independent), real tokenizer over a
synthetic unigram vocab sized like XLM-R.

Env knobs: SB_GALLERY (default 1000 images), SB_REGIONS (100), SB_LAYERS
(12), SB_DIM (768), SB_VOCAB (250002), SB_CLIENTS (8 concurrent HTTP
clients).
"""
import json
import os as _os
import sys as _sys
import threading
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

GALLERY = int(_os.environ.get("SB_GALLERY", 1000))
R = int(_os.environ.get("SB_REGIONS", 100))
LAYERS = int(_os.environ.get("SB_LAYERS", 12))
DIM = int(_os.environ.get("SB_DIM", 768))
VOCAB = int(_os.environ.get("SB_VOCAB", 250002))
CLIENTS = int(_os.environ.get("SB_CLIENTS", 8))


def _sync(x):
    # tunneled-TPU-safe sync: materialize a scalar
    return float(np.asarray(x).ravel()[0])


def main() -> None:
    import jax

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.model import build_model
    from m3p_tpu.serve.engine import InferenceEngine
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer
    from m3p_tpu.tokenization.unigram import train_unigram

    import tempfile

    corpus = ["a dog runs on the beach near the blue water",
              "two cats sleep on the red sofa in the house",
              "a man rides a bicycle down the long street"] * 10
    tok_path = tempfile.mktemp(suffix=".tsv")
    train_unigram(corpus, vocab_size=300).save(tok_path)
    tok = XLMRTokenizer(tok_path)

    cfg = ModelConfig(n_words=VOCAB, mask_index=VOCAB - 1, n_layers=LAYERS,
                      emb_dim=DIM, n_heads=DIM // 64, dropout=0.0,
                      attention_dropout=0.0, max_region_num=R,
                      dtype="bfloat16")
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(model, params, tokenizer=tok, max_regions=R,
                             beam_size=5, max_gen_len=20,
                             lang2id={"en": 0, "de": 1})

    rng = np.random.RandomState(0)

    def image():
        return {"feats": rng.randn(R, 2048).astype(np.float32),
                "locs": rng.rand(R, 5).astype(np.float32)}

    texts = [corpus[i % len(corpus)] for i in range(64)]
    images = [image() for _ in range(64)]

    # --- score throughput (largest bucket) -------------------------------
    engine.score(texts[:1], images[:1])          # compile small bucket
    engine.score(texts, images)                  # compile 64 bucket
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        s = engine.score(texts, images)
    dt = time.perf_counter() - t0
    score_ps = reps * len(texts) / dt
    print(f"score: {score_ps:.1f} pairs/s (batch 64, seq bucket auto)")

    # --- retrieval latency over the gallery ------------------------------
    n = engine.load_gallery([image() for _ in range(GALLERY)])
    engine.retrieve(texts[0], top_k=10)          # compile
    lats = []
    for i in range(20):
        t0 = time.perf_counter()
        engine.retrieve(texts[i % len(texts)], top_k=10)
        lats.append(time.perf_counter() - t0)
    lats = np.array(sorted(lats))
    p50 = lats[len(lats) // 2] * 1e3
    p99 = lats[int(len(lats) * 0.99)] * 1e3
    qps = 1.0 / lats.mean()
    print(f"retrieve: gallery {n}, p50 {p50:.0f} ms, p99 {p99:.0f} ms, "
          f"{qps:.2f} queries/s ({n * qps:.0f} pairs/s)")

    # --- HTTP end-to-end with concurrent clients -------------------------
    from m3p_tpu.serve.server import make_server

    server, app = make_server(engine, "127.0.0.1", 0, max_batch=64,
                              max_wait_s=0.005)
    port = server.server_address[1]
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()

    import urllib.request

    def post(path, payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    post("/v1/retrieve", {"text": texts[0], "top_k": 5})  # warm path
    results = []

    def client(k):
        t0 = time.perf_counter()
        for i in range(5):
            post("/v1/retrieve", {"text": texts[(k * 5 + i) % len(texts)],
                                  "top_k": 5})
        results.append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(k,))
               for k in range(CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    total_q = CLIENTS * 5
    print(f"http: {CLIENTS} concurrent clients x 5 retrievals: "
          f"{total_q / wall:.2f} queries/s end-to-end "
          f"(single-query engine rate {qps:.2f}/s)")
    server.shutdown()
    app.close()

    print(json.dumps({
        "metric": "serve_retrieve_p50_ms", "value": round(p50, 1),
        "unit": "ms", "gallery": n,
        "score_pairs_per_s": round(score_ps, 1),
        "http_qps": round(total_q / wall, 2),
    }))


if __name__ == "__main__":
    main()
