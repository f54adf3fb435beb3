"""Unigram-LM subword model: pure-Python reference implementation + trainer.

The Python Viterbi here is the semantic ground truth that the native C++
encoder (`native/tokenizer.cpp`) must match exactly — tests assert id-for-id
equality.  The trainer builds a SentencePiece-style unigram vocabulary from a
corpus: seed with all characters + frequent substrings, then EM-prune to the
target size (a compact version of the SentencePiece unigram trainer; the
reference consumed a pre-trained XLM-R model, `data/tokenization.py:18-19`).

Model file format (shared with the native encoder): UTF-8 TSV lines
``<piece>\t<log_prob>[\t<type>]``; line number == piece id.  The optional
third column is the SentencePiece piece type (1=NORMAL default); non-matchable
types (UNKNOWN/CONTROL/UNUSED) keep their id slot but never participate in
segmentation — this is how a converted XLM-R ``.spm`` keeps <unk>/<s>/</s> at
raw ids 0..2 without ever matching the literal strings in text.  ``load``
also accepts a raw SentencePiece ``.spm``/``.model`` protobuf directly.
"""

from __future__ import annotations

import collections
import math
from typing import Dict, Iterable, List, Optional, Tuple

from m3p_tpu.tokenization.spm_reader import (
    MATCHABLE_TYPES, TYPE_NORMAL, load_spm, looks_like_spm)

SPIECE_UNDERLINE = "▁"  # ▁

_UNK_PENALTY = 10.0


class UnigramModel:
    def __init__(self, pieces: List[str], scores: List[float],
                 types: Optional[List[int]] = None):
        assert len(pieces) == len(scores)
        self.pieces = pieces
        self.scores = scores
        self.types = types if types is not None else [TYPE_NORMAL] * len(pieces)
        assert len(self.types) == len(pieces)
        self.piece_to_id: Dict[str, int] = {
            p: i for i, p in enumerate(pieces)
            if self.types[i] in MATCHABLE_TYPES}
        matchable_scores = [s for s, t in zip(scores, self.types)
                            if t in MATCHABLE_TYPES]
        self.min_score = min(matchable_scores) if matchable_scores else 0.0
        self.max_piece_len = max(
            (len(p) for p, t in zip(pieces, self.types)
             if t in MATCHABLE_TYPES), default=1)

    # -- persistence ----------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "UnigramModel":
        if looks_like_spm(path):
            return cls.from_spm(path)
        pieces, scores, types = [], [], []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                cols = line.split("\t")
                if len(cols) == 2:
                    piece, score, ptype = cols[0], cols[1], TYPE_NORMAL
                else:
                    piece, score, ptype = cols[0], cols[1], int(cols[2])
                pieces.append(piece)
                scores.append(float(score))
                types.append(ptype)
        return cls(pieces, scores, types)

    @classmethod
    def from_spm(cls, path: str) -> "UnigramModel":
        """Load directly from a SentencePiece .spm/.model protobuf."""
        pieces, scores, types = load_spm(path)
        return cls(pieces, scores, types)

    def save(self, path: str) -> None:
        plain = all(t == TYPE_NORMAL for t in self.types)
        with open(path, "w", encoding="utf-8") as f:
            for p, s, t in zip(self.pieces, self.scores, self.types):
                if plain:
                    f.write(f"{p}\t{s}\n")
                else:
                    f.write(f"{p}\t{s}\t{t}\n")

    def __len__(self) -> int:
        return len(self.pieces)

    # -- encoding -------------------------------------------------------

    def _viterbi(self, text: str) -> List[int]:
        """Best segmentation of a ▁-normalized word; -1 marks an unknown
        character (mapped to <unk> by the wrapper)."""
        n = len(text)
        if n == 0:
            return []
        best = [-1e30] * (n + 1)
        back: List[Tuple[int, int]] = [(-1, -1)] * (n + 1)  # (prev_pos, piece)
        best[0] = 0.0
        unk_penalty = self.min_score - _UNK_PENALTY
        for i in range(n):
            if best[i] <= -1e29:
                continue
            upper = min(n, i + self.max_piece_len)
            for j in range(i + 1, upper + 1):
                pid = self.piece_to_id.get(text[i:j])
                if pid is not None:
                    s = best[i] + self.scores[pid]
                    if s > best[j]:
                        best[j] = s
                        back[j] = (i, pid)
            # unknown single character fallback
            j = i + 1
            s = best[i] + unk_penalty
            if s > best[j]:
                best[j] = s
                back[j] = (i, -1)
        out: List[int] = []
        pos = n
        while pos > 0:
            prev, pid = back[pos]
            out.append(pid)
            pos = prev
        out.reverse()
        return out

    def encode(self, text: str) -> List[int]:
        """Whitespace pretokenize, ▁-prefix each word, Viterbi segment."""
        ids: List[int] = []
        for word in text.split():
            ids.extend(self._viterbi(SPIECE_UNDERLINE + word))
        return ids

    def id_to_piece(self, idx: int) -> str:
        return self.pieces[idx]

    def decode(self, ids: Iterable[int]) -> str:
        s = "".join(self.pieces[i] if 0 <= i < len(self.pieces) else "⁇"
                    for i in ids)
        return s.replace(SPIECE_UNDERLINE, " ").strip()


def train_unigram(
    corpus: Iterable[str],
    vocab_size: int = 8000,
    max_piece_len: int = 12,
    seed_factor: int = 4,
    n_em_iters: int = 2,
) -> UnigramModel:
    """Train a unigram model: substring seeding + EM pruning.

    1. Count ▁-normalized word frequencies.
    2. Seed vocabulary: all single characters (never pruned, guarantees
       coverage) + the ``seed_factor * vocab_size`` highest-count substrings.
    3. EM: E-step segments the corpus with the current model (Viterbi
       approximation), M-step re-estimates piece probabilities; prune the
       lowest-utility pieces until ``vocab_size`` remains.
    """
    word_counts: collections.Counter = collections.Counter()
    for line in corpus:
        for w in line.split():
            word_counts[SPIECE_UNDERLINE + w] += 1

    # seed: substring counts
    sub_counts: collections.Counter = collections.Counter()
    chars: collections.Counter = collections.Counter()
    for word, c in word_counts.items():
        n = len(word)
        for i in range(n):
            chars[word[i]] += c
            for j in range(i + 2, min(n, i + max_piece_len) + 1):
                sub_counts[word[i:j]] += c

    required = list(chars.keys())
    n_seed = max(vocab_size * seed_factor - len(required), 0)
    # explicit (-count, piece) tie-break instead of Counter.most_common's
    # insertion-order ties: the native C++ trainer (native/trainer.cpp) must
    # reproduce this selection exactly
    ranked = sorted(sub_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    seeds = [p for p, _ in ranked[:n_seed]]
    pieces = required + [p for p in seeds if p not in chars]
    counts = {p: (chars[p] if p in chars else sub_counts[p]) for p in pieces}
    total = sum(counts.values())
    scores = {p: math.log(c / total) for p, c in counts.items()}

    def make_model(score_map: Dict[str, float]) -> UnigramModel:
        ps = list(score_map.keys())
        return UnigramModel(ps, [score_map[p] for p in ps])

    model = make_model(scores)
    for _ in range(n_em_iters):
        # E-step: Viterbi counts
        new_counts: collections.Counter = collections.Counter()
        for word, c in word_counts.items():
            for pid in model._viterbi(word):
                if pid >= 0:
                    new_counts[model.pieces[pid]] += c
        # M-step + prune: keep required chars and the most-used pieces
        total = sum(new_counts.values()) or 1
        kept = set(required)
        budget = vocab_size - len(required)
        for p, _ in sorted(new_counts.items(), key=lambda kv: (-kv[1], kv[0])):
            if budget <= 0:
                break
            if p not in kept:
                kept.add(p)
                budget -= 1
        scores = {}
        for p in kept:
            c = new_counts.get(p, 0)
            scores[p] = math.log((c + 0.1) / (total + 0.1 * len(kept)))
        model = make_model(scores)

    # deterministic piece order: required chars first, then by (-score, piece)
    score_of = {p: model.scores[model.piece_to_id[p]] for p in model.pieces}
    ordered = sorted(model.pieces,
                     key=lambda p: (len(p) > 1, -score_of[p], p))
    return UnigramModel(ordered, [score_of[p] for p in ordered])
