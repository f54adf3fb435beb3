"""Offline preprocessing CLI — the reference `preprocess.py` binarizer
(`/root/reference/M3P/preprocess.py:24-51`) plus vocabulary training.

Subcommands:
  binarize  — tokenize a text file into a flat int32 token stream (.npy),
              replacing the XLM .pth uint16 stream format
  train-vocab — train an in-tree unigram vocabulary from text corpora
                (replaces the external fastBPE/SentencePiece toolchain,
                `install-tools.sh:32-61`)
  spm-to-tsv  — convert a pretrained SentencePiece .spm/.model protobuf
                (e.g. the XLM-R model the reference loads,
                `M3P/src/data/tokenization.py:18-19`) to the in-tree TSV

Usage:
  python -m m3p_tpu.cli.preprocess train-vocab --out vocab.tsv --size 32000 \\
      corpus1.txt corpus2.txt
  python -m m3p_tpu.cli.preprocess binarize --vocab vocab.tsv \\
      --out train.en.npy train.en.txt
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def cmd_train_vocab(args) -> None:
    # native C++ trainer by default (the reference toolchain trained vocab in
    # SentencePiece's C++ trainer); Python fallback is model-for-model
    # identical (tests/test_native_trainer.py)
    if args.impl in ("auto", "native"):
        try:
            from m3p_tpu.tokenization.native import native_train_unigram

            n = native_train_unigram(args.inputs, args.out,
                                     vocab_size=args.size)
            print(f"trained unigram vocab (native): {n} pieces -> {args.out}")
            return
        except Exception:
            if args.impl == "native":
                raise

    from m3p_tpu.tokenization.unigram import train_unigram

    def lines():
        for path in args.inputs:
            with open(path, encoding="utf-8") as f:
                for line in f:
                    yield line.rstrip("\n")

    model = train_unigram(lines(), vocab_size=args.size)
    model.save(args.out)
    print(f"trained unigram vocab: {len(model)} pieces -> {args.out}")


def cmd_binarize(args) -> None:
    from m3p_tpu.config import EOS_IDX
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer

    tok = XLMRTokenizer(args.vocab)
    stream = []
    n_sents = 0
    for path in args.inputs:
        with open(path, encoding="utf-8") as f:
            batch = []
            for line in f:
                batch.append(line.rstrip("\n"))
                if len(batch) == 2048:
                    for ids in tok.encode_batch(batch, max_ids=512):
                        stream.extend(ids)
                        stream.append(EOS_IDX)
                        n_sents += 1
                    batch = []
            for ids in tok.encode_batch(batch, max_ids=512):
                stream.extend(ids)
                stream.append(EOS_IDX)
                n_sents += 1
    arr = np.asarray(stream, np.int32)
    np.save(args.out, arr)
    print(f"binarized {n_sents} sentences, {arr.size} tokens -> {args.out}")


def cmd_spm_to_tsv(args) -> None:
    from m3p_tpu.tokenization.unigram import UnigramModel

    model = UnigramModel.from_spm(args.input)
    model.save(args.out)
    n_match = len(model.piece_to_id)
    print(f"converted {len(model)} pieces ({n_match} matchable) -> {args.out}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="m3p_tpu preprocessing")
    sub = p.add_subparsers(dest="cmd", required=True)

    tv = sub.add_parser("train-vocab")
    tv.add_argument("inputs", nargs="+")
    tv.add_argument("--out", required=True)
    tv.add_argument("--size", type=int, default=32000)
    tv.add_argument("--impl", choices=("auto", "native", "python"),
                    default="auto")
    tv.set_defaults(fn=cmd_train_vocab)

    bz = sub.add_parser("binarize")
    bz.add_argument("inputs", nargs="+")
    bz.add_argument("--vocab", required=True)
    bz.add_argument("--out", required=True)
    bz.set_defaults(fn=cmd_binarize)

    sp = sub.add_parser("spm-to-tsv")
    sp.add_argument("input")
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_spm_to_tsv)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
