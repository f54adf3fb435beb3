"""Native C++ unigram trainer (native/trainer.cpp) parity vs the Python
reference implementation (`tokenization/unigram.py::train_unigram`).

The two trainers implement one spec — substring seeding + Viterbi-EM pruning
with explicit (-count, piece) tie-breaks and double-precision score math — so
the trained models must match piece-for-piece.  (The reference delegated this
to SentencePiece's C++ trainer, `M3P/install-tools.sh:32-61`.)
"""

import numpy as np
import pytest

from m3p_tpu.tokenization.native import (
    NativeUnigram, load_library, native_train_unigram)
from m3p_tpu.tokenization.unigram import UnigramModel, train_unigram

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="no C++ toolchain")

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox was quicker than the lazy dog",
    "ein schneller brauner fuchs springt über den faulen hund",
    "le renard brun rapide saute par-dessus le chien paresseux",
    "машинное обучение работает",  # cyrillic: multi-byte chars
    "the dog and the fox and the quick brown fox",
    "縮小模型 詞表 訓練",  # CJK: 3-byte chars, char-level fallback
    "unigram language model training with expectation maximization",
    "subword segmentation maximizes the sum of piece log probabilities",
] * 3


def _write_corpus(tmp_path, lines, name="corpus.txt"):
    p = tmp_path / name
    p.write_text("\n".join(lines), encoding="utf-8")
    return str(p)


def test_native_trainer_matches_python(tmp_path):
    path = _write_corpus(tmp_path, CORPUS)
    out = str(tmp_path / "native.tsv")
    n = native_train_unigram([path], out, vocab_size=200, n_em_iters=2)
    native_model = UnigramModel.load(out)
    assert n == len(native_model)

    py_model = train_unigram(iter(CORPUS), vocab_size=200, n_em_iters=2)

    assert native_model.pieces == py_model.pieces
    np.testing.assert_allclose(native_model.scores, py_model.scores,
                               rtol=0, atol=1e-12)


def test_native_trained_model_encodes_identically(tmp_path):
    """The natively-trained TSV drives both encoders (C++ trie + Python
    Viterbi) to identical ids on held-out text."""
    path = _write_corpus(tmp_path, CORPUS)
    out = str(tmp_path / "native.tsv")
    native_train_unigram([path], out, vocab_size=150)
    py = UnigramModel.load(out)
    cc = NativeUnigram(out)
    held_out = [
        "the lazy fox trains a quick unigram model",
        "обучение сегментация 訓練 mixed-script sentence",
        "completely unseen wörter überall",
    ]
    for text in held_out:
        assert cc.encode(text) == py.encode(text), text


def test_native_trainer_multiple_corpora_and_counts(tmp_path):
    """Word counts must aggregate across input files exactly like a single
    concatenated corpus."""
    half = len(CORPUS) // 2
    p1 = _write_corpus(tmp_path, CORPUS[:half], "a.txt")
    p2 = _write_corpus(tmp_path, CORPUS[half:], "b.txt")
    both = str(tmp_path / "both.tsv")
    native_train_unigram([p1, p2], both, vocab_size=120)
    single = _write_corpus(tmp_path, CORPUS, "all.txt")
    one = str(tmp_path / "one.tsv")
    native_train_unigram([single], one, vocab_size=120)
    m_both, m_one = UnigramModel.load(both), UnigramModel.load(one)
    assert m_both.pieces == m_one.pieces
    np.testing.assert_allclose(m_both.scores, m_one.scores, atol=1e-12)


def test_native_trainer_missing_file(tmp_path):
    with pytest.raises(IOError):
        native_train_unigram([str(tmp_path / "nope.txt")],
                             str(tmp_path / "o.tsv"))


def test_preprocess_cli_native_impl(tmp_path):
    """`preprocess train-vocab --impl native` and `--impl python` produce the
    same model file contents (modulo float formatting)."""
    from m3p_tpu.cli.preprocess import main as preprocess_main

    path = _write_corpus(tmp_path, CORPUS)
    out_n = str(tmp_path / "n.tsv")
    out_p = str(tmp_path / "p.tsv")
    preprocess_main(["train-vocab", path, "--out", out_n, "--size", "100",
                     "--impl", "native"])
    preprocess_main(["train-vocab", path, "--out", out_p, "--size", "100",
                     "--impl", "python"])
    mn, mp = UnigramModel.load(out_n), UnigramModel.load(out_p)
    assert mn.pieces == mp.pieces
    np.testing.assert_allclose(mn.scores, mp.scores, atol=1e-12)
