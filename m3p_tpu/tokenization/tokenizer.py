"""XLM-R tokenizer wrapper: fairseq id conventions over a unigram model.

Exact parity with the reference `XLMRTokenizer` (`/root/reference/M3P/src/data/
tokenization.py:16-130`):
  * fixed specials  <s>=0  <pad>=1  </s>=2  <unk>=3
  * subword ids are the underlying model's ids shifted by ``fairseq_offset``=1
  * ``<mask>`` = len(model) + offset  (the last id)
  * ``vocab_size`` = len(model) + offset + 1
  * ``encode`` returns ids WITHOUT specials; BOS/EOS are added at batch time
    (`batch_sentences`, reference `xtrainer.py:829-877`)

The underlying model is the native C++ unigram encoder when available, else
the pure-Python `UnigramModel` (identical ids — asserted in tests).  The
model file may be the in-tree TSV format or a real SentencePiece ``.spm``/
``.model`` protobuf (e.g. the pretrained XLM-R model the reference loads);
for the native encoder, protobuf models are converted to a cached TSV.
Text is nmt_nfkc-normalized (NFKC + space/control cleanup, approximating the
XLM-R normalizer spec) before segmentation.
"""

from __future__ import annotations

import os
import tempfile
import unicodedata
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from m3p_tpu.config import BOS_IDX, EOS_IDX, PAD_IDX, UNK_IDX
from m3p_tpu.tokenization.spm_reader import looks_like_spm
from m3p_tpu.tokenization.unigram import SPIECE_UNDERLINE, UnigramModel

FAIRSEQ_TOKENS = {"<s>": BOS_IDX, "<pad>": PAD_IDX, "</s>": EOS_IDX,
                  "<unk>": UNK_IDX}


def nmt_normalize(text: str) -> str:
    """Approximate SentencePiece's ``nmt_nfkc`` normalization: NFKC plus
    mapping control characters and exotic Unicode spaces to ASCII space
    (the subsequent whitespace pretokenizer collapses runs)."""
    text = unicodedata.normalize("NFKC", text)
    out = []
    for ch in text:
        cat = unicodedata.category(ch)
        if cat in ("Cc", "Cf", "Zs", "Zl", "Zp"):
            out.append(" ")
        else:
            out.append(ch)
    return "".join(out)


def _tsv_for_native(model_path: str, py_model: UnigramModel) -> str:
    """The native encoder reads TSV only; convert a protobuf model once and
    cache next to it (or in the tempdir when the location is read-only)."""
    if not looks_like_spm(model_path):
        return model_path
    cache = model_path + ".tsv"
    try:
        if (not os.path.exists(cache)
                or os.path.getmtime(cache) < os.path.getmtime(model_path)):
            py_model.save(cache)
        return cache
    except OSError:
        fd, tmp = tempfile.mkstemp(suffix=".tsv", prefix="m3ptok_")
        os.close(fd)
        py_model.save(tmp)
        return tmp


class XLMRTokenizer:
    def __init__(self, model_path: str, use_native: bool = True):
        self._py_model = UnigramModel.load(model_path)
        self._model_path = model_path
        self._use_native = use_native
        self._native = None
        if use_native:
            self._native = self._try_native()

        self.fairseq_offset = 1
        n = len(self._py_model)
        self.bos_token_id = BOS_IDX
        self.cls_token_id = BOS_IDX
        self.pad_token_id = PAD_IDX
        self.eos_token_id = EOS_IDX
        self.sep_token_id = EOS_IDX
        self.unk_token_id = UNK_IDX
        self.mask_token_id = n + self.fairseq_offset

    def _try_native(self):
        try:
            from m3p_tpu.tokenization.native import NativeUnigram
            return NativeUnigram(
                _tsv_for_native(self._model_path, self._py_model))
        except Exception:
            return None

    # Grain workers pickle the data source (and with it any tokenizer it
    # holds). Don't pickle NativeUnigram through — its __setstate__ would
    # raise if the native lib or cached TSV is unavailable in the worker,
    # killing the loader; rebuild with the same soft-fallback instead.
    def __getstate__(self):
        state = dict(self.__dict__)
        state["_native"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if self._use_native:
            self._native = self._try_native()

    @property
    def vocab_size(self) -> int:
        return len(self._py_model) + self.fairseq_offset + 1  # + <mask>

    def _shift(self, raw_ids: Sequence[int]) -> List[int]:
        # raw id -1 == unknown character -> <unk>
        return [UNK_IDX if i < 0 else i + self.fairseq_offset
                for i in raw_ids]

    def encode(self, text: str, text_b: Optional[str] = None) -> List[int]:
        """Subword ids without specials (reference convention)."""
        text = nmt_normalize(text)
        if self._native is not None:
            ids = self._shift(self._native.encode(text))
        else:
            ids = self._shift(self._py_model.encode(text))
        return ids

    def encode_batch(self, texts: Sequence[str], max_ids: int = 256
                     ) -> List[List[int]]:
        texts = [nmt_normalize(t) for t in texts]
        if self._native is not None:
            return [self._shift(ids)
                    for ids in self._native.encode_batch(texts, max_ids)]
        return [self._shift(self._py_model.encode(t)) for t in texts]

    def _convert_id_to_token(self, idx: int) -> str:
        for tok, i in FAIRSEQ_TOKENS.items():
            if idx == i:
                return tok
        if idx == self.mask_token_id:
            return "<mask>"
        return self._py_model.id_to_piece(idx - self.fairseq_offset)

    def decode(self, token_ids: Sequence[int]) -> str:
        out = "".join(self._convert_id_to_token(int(i)) for i in token_ids
                      if int(i) not in (BOS_IDX, EOS_IDX, PAD_IDX))
        return out.replace(SPIECE_UNDERLINE, " ").strip()


def batch_sentences(
    sentences: Sequence[Sequence[int]],
    max_len: Optional[int] = None,
    lang_ids: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Batch id-lists into (tokens (B, L), lengths (B,), langs (B, L) | None).

    Reference layout (`xtrainer.py:829-853`, transposed to batch-major):
    ``<s> w1 ... wn </s>`` padded with <pad>=1; length counts both specials;
    sentences longer than max_len-2 are truncated.
    """
    b = len(sentences)
    if max_len is None:
        max_len = max((len(s) for s in sentences), default=0) + 2
    toks = np.full((b, max_len), PAD_IDX, np.int32)
    lengths = np.zeros((b,), np.int32)
    langs = None
    if lang_ids is not None:
        langs = np.zeros((b, max_len), np.int32)
    for i, s in enumerate(sentences):
        s = list(s)[: max_len - 2]
        toks[i, 0] = BOS_IDX
        toks[i, 1:1 + len(s)] = s
        toks[i, 1 + len(s)] = EOS_IDX
        lengths[i] = len(s) + 2
        if langs is not None:
            langs[i, :] = lang_ids[i]
    return toks, lengths, langs
