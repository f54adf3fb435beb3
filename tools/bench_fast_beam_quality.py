"""Quantify --fast beam decoding quality: exact vs approx_max_k (+q8).

Round-2 measured `--fast --q8` beam search at 348 captions/s vs 261 exact,
but never the end-to-end caption-quality cost of `lax.approx_max_k`
(recall 0.99/element) and frozen-weight int8.  This tool measures it at the
REAL operating point — flagship 12L/768d with a 250 002-slot vocab head
(the approximation's difficulty scales with vocab size), trained to
competence on a learnable soak corpus so BLEU/CIDEr are meaningful:

  1. fine-tunes captioning (`caption_loss`) on the corpus' coco/train split
     (concept-word captions -> the model learns to name the image concepts);
  2. decodes the test split with beam 5 three ways: exact, --fast
     (approx_max_k candidate scan; survivor log-probs stay exact), and
     --fast + q8 (frozen-weight int8 tables);
  3. reports Bleu / METEOR / ROUGE_L / CIDEr per mode, the deltas, and
     captions/s.

Usage:
  python tools/make_soak_corpus.py --out /tmp/bq --signed --sigma 0.02 \
      --concepts-per-image 2 --test-images 256 --det-captions
  python tools/bench_fast_beam_quality.py --corpus /tmp/bq [--steps 800]

``--det-captions`` matters: with the default shuffled-filler captions the
per-token CE is irreducibly ~3 (random word order + random fillers), the
model can never become confident, and argmax lands in the untrained tail
of the 250k padded vocab head — every mode decodes garbage and the deltas
are meaningless.  Deterministic captions drive CE to ~0 so the exact mode
scores near-perfect BLEU/CIDEr and the approximation deltas are real.

Training emits ``langs`` (lang_id=0) and decoding passes ``tgt_lang_id=0``
— the same train/decode lang-embedding consistency the production loader
and evaluator maintain (`ic_step` parity, `xtrainer.py:1464-1470`).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = 250002          # XLM-R head size: the approximation's real target
BEAM, MAX_LEN = 5, 20
DECODE_BS = 64


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=32)
    # the 12L post-LN stack is lr-fragile from scratch: 1e-3 collapses it
    # into a constant predictor (acc 0.333 — f32/no-dropout/clip probes all
    # reproduce it; 2L fits fine), and 2e-4 *with a cosine-to-zero tail*
    # stalls at CE ~2.0 because lr is gone by step 800.  2e-4 with a 10%
    # floor and enough steps fits the det corpus
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup", type=int, default=200,
                   help="post-LN depth wants warmup ~ depth: 12L from "
                        "scratch collapses to a constant predictor at "
                        "(2e-4, warmup 200) but fits at (1e-4, warmup 600, "
                        "dropout 0)")
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--regions", type=int, default=20)
    p.add_argument("--max-test", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--dec-layers", type=int, default=4)
    p.add_argument("--train-only", action="store_true",
                   help="stop after training (learnability probes)")
    p.add_argument("--params", default=None,
                   help="path to save trained params to (after training) "
                        "or load from (skipping training) — lets repeated "
                        "decode experiments reuse one training run")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from m3p_tpu.config import ModelConfig
    from m3p_tpu.data.datasets import CaptionDataset
    from m3p_tpu.data.features import RegionFeatureStore
    from m3p_tpu.eval.bleu import corpus_bleu
    from m3p_tpu.eval.caption_metrics import meteor_score, rouge_l_score
    from m3p_tpu.eval.cider import cider_score
    from m3p_tpu.model import build_model, capture_q8, \
        quantized_inference_model
    from m3p_tpu.model.generation import beam_search
    from m3p_tpu.model.transformer import as_variables
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer
    import m3p_tpu.train.steps as S

    tok = XLMRTokenizer(os.path.join(args.corpus, "vocab.tsv"))
    coco = os.path.join(args.corpus, "coco")
    store = RegionFeatureStore(os.path.join(coco, "train.h5"),
                               max_region_num=args.regions)
    with open(os.path.join(coco, "train.en.pkl"), "rb") as fh:
        train_caps = pickle.load(fh)

    # flagship-shape model; the vocab head is PADDED to the full XLM-R
    # 250k so approx_max_k faces its production-size search space (the
    # corpus tokenizer only populates the low few hundred ids)
    cfg = ModelConfig(n_words=VOCAB, mask_index=VOCAB - 1,
                      emb_dim=args.dim, n_layers=args.layers,
                      n_heads=args.dim // 64, n_dec_layers=args.dec_layers,
                      refine_layers=1, max_region_num=args.regions,
                      dropout=args.dropout, attention_dropout=args.dropout,
                      dtype=args.dtype)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    ds = CaptionDataset(train_caps, store, tok, max_len=16, lang_id=0)

    # clip like production training does (--clip_grad_norm 5): the first
    # steps see CE ~12.4 over the 250k head and unclipped adamw can blast
    # the stack into a collapse basin it never escapes
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1),
            end_value=0.1 * args.lr)))
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, batch, key):
        def lf(p):
            return S.caption_loss(model, p, batch, key)

        (loss, m), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss, m["acc"]

    if args.params and os.path.exists(args.params):
        with open(args.params, "rb") as fh:
            flat = pickle.load(fh)
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params),
            [jnp.asarray(v) for v in flat])
        print(f"loaded params from {args.params} (training skipped)",
              flush=True)
        args.steps, loss, acc = 0, jnp.zeros(()), jnp.zeros(())

    key = jax.random.PRNGKey(1)
    i, t0 = 0, time.perf_counter()
    for epoch in range(10_000):
        if i >= args.steps:
            break
        for b in ds.epoch_iterator(args.batch_size, epoch=epoch):
            key, k = jax.random.split(key)
            b = {kk: jnp.asarray(v) for kk, v in b.items()}
            params, opt, loss, acc = train_step(params, opt, b, k)
            if i % 100 == 0:
                print(f"step {i}: loss {float(loss):.4f} "
                      f"acc {float(acc):.3f} "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            i += 1
            if i >= args.steps:
                break
    print(f"trained {i} steps in {time.perf_counter() - t0:.0f}s "
          f"(final loss {float(loss):.4f} acc {float(acc):.3f})", flush=True)
    if args.params and i > 0:
        with open(args.params, "wb") as fh:
            pickle.dump([np.asarray(v)
                         for v in jax.tree_util.tree_leaves(params)], fh)
        print(f"saved params to {args.params}", flush=True)
    if args.train_only:
        return

    # ---- test split, aligned (image -> 5 references) --------------------
    tstore = RegionFeatureStore(os.path.join(coco, "test.h5"),
                                max_region_num=args.regions)
    with open(os.path.join(coco, "test.en.pkl"), "rb") as fh:
        test_caps = pickle.load(fh)
    ids = [i for i in tstore.image_ids if i in test_caps][:args.max_test]
    ids = ids[:len(ids) // DECODE_BS * DECODE_BS]
    if not ids:
        raise SystemExit("test split smaller than one decode batch")
    refs = [test_caps[i] for i in ids]

    chunks = []
    for start in range(0, len(ids), DECODE_BS):
        rs = [tstore.get(tstore.index_of(i))
              for i in ids[start:start + DECODE_BS]]
        chunks.append((
            jnp.asarray(np.stack([r["feats"] for r in rs])),
            jnp.asarray(np.stack([r["locs"] for r in rs])),
            jnp.asarray(np.stack([r["mask"] for r in rs]))))

    q8_model = quantized_inference_model(cfg)
    q8_vars = {"params": params, "q8": capture_q8(q8_model, params)}

    def make_decoder(gen_model, fast):
        @jax.jit
        def enc(variables, feats, locs, mask):
            return gen_model.apply(as_variables(variables), feats, locs,
                                   mask, None, True,
                                   method=gen_model.encode_image)

        @jax.jit
        def dec(variables, src_enc, mask):
            return beam_search(gen_model, variables, src_enc, mask, BEAM,
                               MAX_LEN, tgt_lang_id=0, length_penalty=1.0,
                               fast_topk=fast)

        return enc, dec

    modes = {"exact": (model, params, False),
             "fast": (model, params, True),
             "fast_q8": (q8_model, q8_vars, True)}
    out = {}
    for name, (gm, variables, fast) in modes.items():
        enc, dec = make_decoder(gm, fast)
        hyps, t_dec = [], 0.0
        for rep, (feats, locs, mask) in enumerate(chunks):
            src = enc(variables, feats, locs, mask)
            src.block_until_ready()
            t1 = time.perf_counter()
            toks, lens = dec(variables, src, mask)
            lens_np = np.asarray(lens)          # materialize = sync
            if rep > 0:                         # chunk 0 pays the compile
                t_dec += time.perf_counter() - t1
            toks = np.asarray(toks)
            for r in range(toks.shape[0]):
                hyps.append(tok.decode(toks[r, 1:lens_np[r]]))
        cps = (len(ids) - DECODE_BS) / t_dec if len(chunks) > 1 else 0.0
        out[name] = {
            "bleu": round(corpus_bleu(hyps, refs), 4),
            "cider": round(cider_score(hyps, refs), 4),
            "meteor": round(meteor_score(hyps, refs), 4),
            "rouge_l": round(rouge_l_score(hyps, refs), 4),
            "captions_per_sec": round(cps, 1),
        }
        print(f"{name}: {out[name]}  e.g. {hyps[:3]!r}", flush=True)

    result = {
        "metric": "fast_beam_quality_delta",
        "value": round(out["fast_q8"]["cider"] - out["exact"]["cider"], 4),
        "unit": "CIDEr delta (fast_q8 - exact)",
        "bleu_delta_fast": round(out["fast"]["bleu"] - out["exact"]["bleu"],
                                 4),
        "bleu_delta_fast_q8": round(
            out["fast_q8"]["bleu"] - out["exact"]["bleu"], 4),
        "modes": out, "n_images": len(ids), "beam": BEAM,
        "vocab": VOCAB, "train_steps": i,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
