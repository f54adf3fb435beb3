"""Tokenizer stack: unigram trainer, Python/C++ encoder parity, XLM-R id
conventions, batching."""

import os

import numpy as np
import pytest

from m3p_tpu.config import BOS_IDX, EOS_IDX, PAD_IDX, UNK_IDX
from m3p_tpu.tokenization.tokenizer import XLMRTokenizer, batch_sentences
from m3p_tpu.tokenization.unigram import UnigramModel, train_unigram

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day",
    "a quick brown cat jumps too",
    "dogs and cats are quick animals",
    "the fox and the dog play together",
    "ein schneller brauner fuchs springt",
    "le chien paresseux dort toute la journee",
] * 4


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tok") / "unigram.tsv")
    model = train_unigram(CORPUS, vocab_size=200)
    model.save(path)
    return path


def test_trainer_produces_valid_model(model_path):
    model = UnigramModel.load(model_path)
    assert 50 <= len(model) <= 200
    # all corpus characters covered
    chars = set("".join(CORPUS).replace(" ", ""))
    pieces = set("".join(model.pieces))
    assert chars <= pieces


def test_python_roundtrip(model_path):
    model = UnigramModel.load(model_path)
    for text in ["the quick brown fox", "dogs play together"]:
        ids = model.encode(text)
        assert len(ids) > 0 and all(i >= 0 for i in ids)
        assert model.decode(ids) == text


def test_unknown_characters_dont_crash(model_path):
    model = UnigramModel.load(model_path)
    ids = model.encode("héllo 中文 world")
    assert any(i == -1 for i in ids)  # unknown chars marked


def test_native_matches_python(model_path):
    native = pytest.importorskip("m3p_tpu.tokenization.native")
    try:
        enc = native.NativeUnigram(model_path)
    except RuntimeError:
        pytest.skip("native tokenizer unavailable")
    model = UnigramModel.load(model_path)
    texts = CORPUS + ["unseen words zebra quokka", "héllo wörld 中文",
                      "  multiple   spaces  ", ""]
    for t in texts:
        assert enc.encode(t) == model.encode(t), t
    # batch API matches one-by-one
    batch = enc.encode_batch(texts, max_ids=64)
    for t, ids in zip(texts, batch):
        assert ids == model.encode(t)[:64]


def test_xlmr_conventions(model_path):
    tok = XLMRTokenizer(model_path)
    model = UnigramModel.load(model_path)
    assert tok.vocab_size == len(model) + 2
    assert tok.mask_token_id == len(model) + 1
    ids = tok.encode("the quick brown fox")
    raw = model.encode("the quick brown fox")
    assert ids == [i + 1 for i in raw]          # fairseq offset
    assert tok.decode(ids) == "the quick brown fox"
    # specials stripped in decode
    assert tok.decode([BOS_IDX] + ids + [EOS_IDX, PAD_IDX]) == \
        "the quick brown fox"


def test_unk_mapping(model_path):
    tok = XLMRTokenizer(model_path)
    ids = tok.encode("中文")
    assert UNK_IDX in ids


def test_batch_sentences():
    sents = [[10, 11, 12], [20], []]
    toks, lengths, langs = batch_sentences(sents, lang_ids=[0, 1, 2])
    assert toks.shape == (3, 5)
    np.testing.assert_array_equal(toks[0], [BOS_IDX, 10, 11, 12, EOS_IDX])
    np.testing.assert_array_equal(toks[1], [BOS_IDX, 20, EOS_IDX, PAD_IDX,
                                            PAD_IDX])
    np.testing.assert_array_equal(lengths, [5, 3, 2])
    assert langs.shape == (3, 5)
    np.testing.assert_array_equal(langs[1], [1] * 5)


def test_batch_sentences_truncation():
    toks, lengths, _ = batch_sentences([[1, 2, 3, 4, 5, 6]], max_len=5)
    assert toks.shape == (1, 5)
    assert toks[0, -1] == EOS_IDX and lengths[0] == 5


def test_legacy_dictionary(tmp_path):
    from m3p_tpu.tokenization.dictionary import Dictionary

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("the 100\ncat 50\ndog 30\nrare 1\n")
    d = Dictionary.read_vocab(str(vocab), min_count=2)
    assert len(d) == 7  # 4 specials + the/cat/dog (rare filtered)
    assert d.index("the") == 4
    assert d.index("unknown") == UNK_IDX

    txt = tmp_path / "corpus.txt"
    txt.write_text("the cat\nthe dog zebra\n")
    data = d.index_data(str(txt))
    assert list(data["positions"]) == [0, 3]
    assert data["sentences"][2] == EOS_IDX
    assert data["unk_words"] == {"zebra": 1}


def test_decode_skips_mask_token(model_path):
    tok = XLMRTokenizer(model_path)
    ids = tok.encode("the quick")
    out = tok.decode(ids + [tok.mask_token_id])
    assert out.startswith("the quick")
    assert "<mask>" in tok._convert_id_to_token(tok.mask_token_id)
