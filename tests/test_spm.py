"""SentencePiece .spm protobuf reader: wire-format goldens, XLM-R id
conventions, TSV round-trip, and native/py parity on converted models.

The reference loads the pretrained XLM-R model with the SentencePiece C++
library (`/root/reference/M3P/src/data/tokenization.py:18-19`) and shifts ids
by fairseq_offset=1 with <s>=0 <pad>=1 </s>=2 <unk>=3 and
<mask>=len(sp)+offset (`:29-41`).  These tests pin that arithmetic against
our own protobuf parser.
"""

import os
import struct

import pytest

from m3p_tpu.tokenization.spm_reader import (
    TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN, load_spm, looks_like_spm,
    parse_spm, serialize_spm, write_spm)
from m3p_tpu.tokenization.tokenizer import XLMRTokenizer, nmt_normalize
from m3p_tpu.tokenization.unigram import UnigramModel


def _xlmr_style_model(tmp_path, pieces_scores):
    """Build an .spm with the XLM-R layout: <unk>/<s>/</s> at 0..2."""
    pieces = ["<unk>", "<s>", "</s>"] + [p for p, _ in pieces_scores]
    scores = [0.0, 0.0, 0.0] + [s for _, s in pieces_scores]
    types = [TYPE_UNKNOWN, TYPE_CONTROL, TYPE_CONTROL] + \
        [TYPE_NORMAL] * len(pieces_scores)
    path = str(tmp_path / "test.spm")
    write_spm(path, pieces, scores, types)
    return path


VOCAB = [("▁hello", -1.0), ("▁world", -1.5), ("▁he", -3.0), ("llo", -3.5),
         ("▁", -4.0), ("h", -5.0), ("e", -5.1), ("l", -5.2), ("o", -5.3),
         ("w", -5.4), ("r", -5.5), ("d", -5.6), ("s", -5.7), ("<", -6.0),
         (">", -6.1), ("/", -6.2)]


def test_wire_format_golden():
    # hand-assembled ModelProto: one piece "ab" score -2.0 type NORMAL
    piece = b"\x0a\x02ab" + b"\x15" + struct.pack("<f", -2.0) + b"\x18\x01"
    buf = b"\x0a" + bytes([len(piece)]) + piece
    pieces, scores, types = parse_spm(buf)
    assert pieces == ["ab"]
    assert scores == [-2.0]
    assert types == [TYPE_NORMAL]


def test_wire_format_skips_unknown_fields():
    # trainer_spec (field 2, len-delimited) before the piece must be skipped
    piece = b"\x0a\x01x" + b"\x15" + struct.pack("<f", -1.0)
    buf = b"\x12\x03abc" + b"\x0a" + bytes([len(piece)]) + piece
    pieces, scores, types = parse_spm(buf)
    assert pieces == ["x"]
    assert types == [TYPE_NORMAL]  # default when field 3 absent


def test_serialize_roundtrip(tmp_path):
    path = _xlmr_style_model(tmp_path, VOCAB)
    pieces, scores, types = load_spm(path)
    assert pieces[:3] == ["<unk>", "<s>", "</s>"]
    assert types[:3] == [TYPE_UNKNOWN, TYPE_CONTROL, TYPE_CONTROL]
    assert pieces[3] == "▁hello"
    assert scores[3] == pytest.approx(-1.0)


def test_looks_like_spm(tmp_path):
    spm = _xlmr_style_model(tmp_path, VOCAB)
    assert looks_like_spm(spm)
    tsv = str(tmp_path / "v.tsv")
    UnigramModel(["a", "b"], [-1.0, -2.0]).save(tsv)
    assert not looks_like_spm(tsv)


def test_fairseq_id_conventions(tmp_path):
    """The core XLM-R arithmetic: raw piece k -> id k+1; mask = len+1."""
    path = _xlmr_style_model(tmp_path, VOCAB)
    tok = XLMRTokenizer(path, use_native=False)
    n = 3 + len(VOCAB)
    assert tok.vocab_size == n + 2          # + offset + <mask>
    assert tok.mask_token_id == n + 1
    assert tok.bos_token_id == 0 and tok.pad_token_id == 1
    assert tok.eos_token_id == 2 and tok.unk_token_id == 3
    # "hello" -> piece "▁hello" at proto index 3 -> fairseq id 4 (the
    # reference comment: "first real token has position 4 in fairseq,
    # 3 in the spm vocab", tokenization.py:31-33)
    assert tok.encode("hello") == [4]
    assert tok.encode("hello world") == [4, 5]


def test_control_pieces_never_match(tmp_path):
    """Literal '<s>' in text must segment into characters, not the control
    piece (SentencePiece excludes control/unknown pieces from matching)."""
    path = _xlmr_style_model(tmp_path, VOCAB)
    tok = XLMRTokenizer(path, use_native=False)
    ids = tok.encode("<s>")
    # pieces: ▁(7+1=8 raw 7? no: raw ids) — just assert no id maps back to
    # a control piece and multiple pieces came out
    assert len(ids) > 1
    raw = [i - 1 for i in ids]
    assert 1 not in raw and 2 not in raw and 0 not in raw


def test_native_matches_python_on_spm(tmp_path):
    path = _xlmr_style_model(tmp_path, VOCAB)
    py_tok = XLMRTokenizer(path, use_native=False)
    nat_tok = XLMRTokenizer(path, use_native=True)
    if nat_tok._native is None:
        pytest.skip("native tokenizer unavailable")
    texts = ["hello world", "hello", "he llo wo rld", "<s> hello </s>",
             "holed worlds", ""]
    for t in texts:
        assert nat_tok.encode(t) == py_tok.encode(t), t
    assert nat_tok.encode_batch(texts) == py_tok.encode_batch(texts)
    # conversion cache exists and is a 3-column TSV with preserved ids
    cache = path + ".tsv"
    assert os.path.exists(cache)
    lines = open(cache, encoding="utf-8").read().splitlines()
    assert lines[0].split("\t")[0] == "<unk>"
    assert lines[0].split("\t")[2] == str(TYPE_UNKNOWN)
    assert lines[3].split("\t")[0] == "▁hello"


def test_tsv_type_column_roundtrip(tmp_path):
    path = _xlmr_style_model(tmp_path, VOCAB)
    m = UnigramModel.from_spm(path)
    tsv = str(tmp_path / "conv.tsv")
    m.save(tsv)
    m2 = UnigramModel.load(tsv)
    assert m2.pieces == m.pieces
    assert m2.types == m.types
    assert m2.encode("hello world") == m.encode("hello world")
    # control pieces excluded from matching structures
    assert "<s>" not in m2.piece_to_id
    assert "▁hello" in m2.piece_to_id


def test_spm_to_tsv_cli(tmp_path, capsys):
    from m3p_tpu.cli.preprocess import main
    path = _xlmr_style_model(tmp_path, VOCAB)
    out = str(tmp_path / "out.tsv")
    main(["spm-to-tsv", path, "--out", out])
    assert "19 pieces (16 matchable)" in capsys.readouterr().out
    tok = XLMRTokenizer(out, use_native=False)
    assert tok.encode("hello") == [4]


def test_nmt_normalize():
    # NFKC folds full-width forms; NBSP and control chars become spaces
    assert nmt_normalize("ｈｅｌｌｏ") == "hello"
    assert nmt_normalize("a b\tc\x00d") == "a b c d"


def test_real_xlmr_goldens_if_available():
    """Golden ids from the actual XLM-R sentencepiece.bpe.model (the ids the
    reference produces).  Runs only when the model file is present."""
    candidates = ["/root/data/sentencepiece.bpe.model",
                  "/root/models/xlmr/sentencepiece.bpe.model",
                  os.environ.get("XLMR_SPM_PATH", "")]
    path = next((p for p in candidates if p and os.path.exists(p)), None)
    if path is None:
        pytest.skip("real XLM-R model not available in this image")
    tok = XLMRTokenizer(path)
    assert tok.vocab_size == 250002
    assert tok.mask_token_id == 250001
    # ids match HF XLMRobertaTokenizer (same fairseq conventions):
    # "Hello world" -> ▁Hello=35378 ▁world=8999
    assert tok.encode("Hello world") == [35378, 8999]
