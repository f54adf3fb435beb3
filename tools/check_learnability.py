"""End-to-end learnability check: ITM fine-tuning on a soak corpus.

Trains a tiny model with the production dataset -> compact-batch ->
``itm_finetune_loss`` path on a `make_soak_corpus.py` corpus and prints the
loss/accuracy trajectory.  Chance CE is ln(sample_n); a healthy run must
drive accuracy well above 1/sample_n within ~1-2k steps on a ``--signed``
corpus (measured: acc 0.94 by step 350 on 1000 images, 2 concepts/image,
sigma 0.02).

Findings this encodes (session log, round 2):
  * the abs()/ReLU-style corpus (cross-concept cosine ~0.64 shared positive
    orthant) is linearly separable (a mean-feature probe scores 99.5%) but a
    from-scratch 2L/128d model stays AT BASE RATE for >1k steps - use
    --signed corpora for learning soaks, abs corpora only for plumbing;
  * loss exactly ln(n) + base-rate BCE == "model ignores the images":
    check feature/pos_label alignment first (it was correct), then corpus
    conditioning.

Usage:
  python tools/make_soak_corpus.py --out /tmp/soak --signed --sigma 0.02 \
      --concepts-per-image 2
  python tools/check_learnability.py --corpus /tmp/soak [--steps 1500]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--sample-n", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lang", default="en")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (default: whatever JAX picks)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.data.datasets import RetrievalDataset
    from m3p_tpu.data.features import RegionFeatureStore
    from m3p_tpu.model import build_model
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer
    import m3p_tpu.train.steps as S

    tok = XLMRTokenizer(os.path.join(args.corpus, "vocab.tsv"))
    store = RegionFeatureStore(
        os.path.join(args.corpus, "coco", "train.h5"), max_region_num=20)
    with open(os.path.join(args.corpus, "coco",
                           f"train.{args.lang}.pkl"), "rb") as fh:
        caps = pickle.load(fh)
    n = args.sample_n
    ds = RetrievalDataset(caps, store, tok, sample_n=n, max_len=16)

    cfg = ModelConfig(n_words=tok.vocab_size, emb_dim=128, n_layers=2,
                      n_heads=4, n_dec_layers=1, refine_layers=1,
                      max_region_num=20, n_langs=2,
                      mask_index=tok.vocab_size - 1,
                      dropout=0.0, attention_dropout=0.0)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, key):
        batch = S.expand_compact_batch(batch)

        def lf(p):
            return S.itm_finetune_loss(model, p, batch, key, n)

        (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return (optax.apply_updates(params, up), opt, loss,
                m["acc"], m["ce"])

    key = jax.random.PRNGKey(1)
    i = 0
    accs = []
    for epoch in range(10_000):
        for t2i, i2t in ds.epoch_iterator(args.batch_size, epoch=epoch):
            for b in (t2i, i2t):
                key, k = jax.random.split(key)
                b = {kk: jnp.asarray(v) for kk, v in b.items()}
                params, opt, loss, acc, ce = step(params, opt, b, k)
                if i % 50 == 0:
                    print(f"step {i}: loss {float(loss):.4f} "
                          f"ce {float(ce):.4f} acc {float(acc):.3f} "
                          f"(chance ce {np.log(n):.3f}, acc {1 / n:.3f})",
                          flush=True)
                accs.append(float(acc))
                i += 1
                if i >= args.steps:
                    tail = float(np.mean(accs[-100:]))
                    ok = tail > 2.0 / n
                    print(f"final 100-step mean acc: {tail:.3f} "
                          f"-> {'LEARNED' if ok else 'NOT LEARNED'}")
                    return 0 if ok else 1
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
