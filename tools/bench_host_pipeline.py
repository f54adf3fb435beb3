"""Host-side input-pipeline throughput: can the loader out-feed the chip?

The chip consumes the MCT pretrain step at ~793 joint rows/s (bench.py).
One Grain record = one anchor's (t2i, i2t) grid pair = 2 * sample_n joint
rows, all of which the Trainer steps (both directions gated on by default),
so the host must sustain >= chip_rows/s of produced rows or training becomes
input-bound.  This measures the production Grain path (`make_grain_loader`)
over a reference-layout corpus (tools/make_soak_corpus.py) at flagship
shapes (100 regions, max_len 64, sample_n 4) for several worker counts.

Usage: python tools/bench_host_pipeline.py --corpus /tmp/hostbench_corpus
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True)
    p.add_argument("--vocab", default="",
                   help="override vocab (e.g. a synthetic 250k-piece TSV so "
                        "real XLM-R-scale Viterbi cost is in the row path)")
    p.add_argument("--lang", default="en")
    p.add_argument("--groups", type=int, default=20)
    p.add_argument("--sample_n", type=int, default=4)
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--regions", type=int, default=100)
    p.add_argument("--batches", type=int, default=30)
    p.add_argument("--workers", default="1,2,4",
                   help="read-thread counts to sweep")
    args = p.parse_args(argv)

    from m3p_tpu.data.clag import Clager
    from m3p_tpu.data.datasets import PretrainDataset
    from m3p_tpu.data.features import RegionFeatureStore
    from m3p_tpu.data.grain_pipeline import make_grain_loader
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer

    h5s = sorted(glob.glob(os.path.join(args.corpus, "google", "*.h5")))
    stores = [RegionFeatureStore(p, args.regions) for p in h5s]
    caps = []
    for path in h5s:
        with open(path.replace(".h5", f".{args.lang}.pkl"), "rb") as f:
            caps.append(pickle.load(f))
    tok = XLMRTokenizer(args.vocab
                        or os.path.join(args.corpus, "vocab.tsv"))
    print(f"vocab: {tok.vocab_size} pieces")
    ds = PretrainDataset(
        stores, caps, tok, sample_n=args.sample_n, max_len=args.max_len,
        clager=Clager(None, 0.5, 0.5), lang=args.lang, seed=0)

    rows_per_record = 2 * args.sample_n
    for wc in [int(w) for w in args.workers.split(",")]:
        loader = make_grain_loader(ds, args.groups, seed=0, epoch=0,
                                   num_epochs=None, worker_count=wc,
                                   shard_by_process=False)
        it = iter(loader)
        for _ in range(3):  # warmup (worker spin-up, h5 open)
            next(it)
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.batches):
            t2i, i2t = next(it)
            n += t2i["tokens"].shape[0] + i2t["tokens"].shape[0]
        dt = time.perf_counter() - t0
        print(f"read_threads={wc}: {n / dt:7.1f} joint rows/s "
              f"({args.batches / dt:.2f} batches/s of {args.groups} grid "
              f"pairs = {args.groups * rows_per_record} rows)")
        del it, loader


if __name__ == "__main__":
    main()
