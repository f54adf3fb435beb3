"""Autoregressive generation: greedy/sampled decoding and beam search.

Functional, fixed-shape redesign of the reference decoding loops
(`/root/reference/M3P/src/model/transformer.py:1216-1561`): the token-by-token
Python loop with a mutable cache dict becomes a `lax.scan` over a functional
KV cache; beam search follows the standard 2K-candidate scheme with
`BeamHypotheses`-style length-penalized finished pools and early stopping.

Conventions preserved from the reference:
  * a sequence ends at the first generated EOS; finished rows keep decoding
    but their outputs are frozen
  * length penalty: score = logp / len^alpha (`BeamHypotheses.add`,
    `transformer.py:1520-1535`)

Deliberate deviation — the DECODE START TOKEN: the reference starts
generation from EOS (`generated[0].fill_(self.eos_index)`,
`transformer.py:1251-1254` — a convention inherited from XLM, whose
batch format was `</s> w ... </s>`), but every M3P `batch_sentences`
variant trains the decoder on `<s> w ... </s>` targets
(`xtrainer.py:829-853`, `dataset_finetune.py:1180-1196` — position 0 is
`<s>`=0, not `</s>`=2).  Decoding from a token the decoder never saw at
position 0 makes a from-scratch-trained model emit EOS immediately
(measured: every caption empty on a trained checkpoint).  We therefore
default ``start_index`` to BOS to match the training distribution;
pass ``start_index=EOS_IDX`` for bug-compatible reference decoding
(the checkpoint-converter parity tests do).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from m3p_tpu.config import BOS_IDX, EOS_IDX, PAD_IDX
from m3p_tpu.model.transformer import as_variables

NEG_INF = -1.0e7


def _decode_step(model, params, tokens, positions, langs, src_enc, src_mask,
                 cache):
    """One incremental decoder step -> (logits (B, V), new_cache)."""
    b = tokens.shape[0]
    step_mask = jnp.ones((b, 1), bool)
    hidden, cache = model.apply(
        as_variables(params), tokens, step_mask, langs, positions, True,
        src_enc, src_mask, cache, True, method=model.encode_text)
    logits = model.apply(as_variables(params), hidden[:, 0],
                         method=model.word_logits)
    return logits.astype(jnp.float32), cache


def greedy_generate(
    model,
    params,
    src_enc: jax.Array,            # (B, Ss, D)
    src_mask: jax.Array,           # (B, Ss)
    max_len: int,
    tgt_lang_id: Optional[int] = None,
    temperature: Optional[float] = None,
    rng: Optional[jax.Array] = None,
    eos_index: int = EOS_IDX,
    pad_index: int = PAD_IDX,
    start_index: int = BOS_IDX,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy (or temperature-sampled) decoding.

    Returns (tokens (B, max_len), lengths (B,)).  tokens[:, 0] ==
    ``start_index`` — BOS by default to match the training target format;
    pass EOS_IDX for the reference's (buggy) EOS-as-BOS decode (see module
    docstring)."""
    b = src_enc.shape[0]
    cache = model.apply(as_variables(params), src_enc, max_len,
                        method=model.init_decode_cache)
    init_tokens = jnp.full((b, 1), start_index, jnp.int32)

    def body(carry, t):
        tokens, finished, cache, key = carry
        positions = jnp.full((b, 1), t, jnp.int32)
        langs = (jnp.full((b, 1), tgt_lang_id, jnp.int32)
                 if tgt_lang_id is not None else None)
        logits, cache = _decode_step(model, params, tokens, positions, langs,
                                     src_enc, src_mask, cache)
        if temperature is not None:
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits / temperature, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, pad_index, nxt).astype(jnp.int32)
        finished = jnp.logical_or(finished, nxt == eos_index)
        return (nxt[:, None], finished, cache, key), nxt

    key = rng if rng is not None else jax.random.PRNGKey(0)
    carry = (init_tokens, jnp.zeros((b,), bool), cache, key)
    (_, finished, _, _), toks = jax.lax.scan(
        body, carry, jnp.arange(max_len - 1))
    toks = toks.T  # (B, max_len-1)
    out = jnp.concatenate([jnp.full((b, 1), start_index, jnp.int32), toks],
                          axis=1)
    # length = position of first generated EOS + 2 (leading start token +
    # final EOS), capped at max_len for unfinished rows
    is_eos = out[:, 1:] == eos_index
    first_eos = jnp.argmax(is_eos, axis=1)
    has_eos = jnp.any(is_eos, axis=1)
    lengths = jnp.where(has_eos, first_eos + 2, max_len)
    return out, lengths


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------


def _gather_beams(tree, beam_indices, batch_size, new_beam_size):
    """Select beams: tree leaves are (B*K_old, ...) -> (B*K_new, ...).

    Large float leaves (the KV cache) are gathered with a one-hot einsum:
    the per-row one-hot selection rides the MXU as a tiny batched matmul and
    reads the cache once, where the take_along_axis lowering was profiled as
    pathologically slow staged DMA slices inside the decode scan."""
    onehot = None

    def gather(x):
        nonlocal onehot
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        xk = x.reshape(batch_size, -1, *x.shape[1:])
        if jnp.issubdtype(x.dtype, jnp.floating) and x.size >= (1 << 16):
            if onehot is None:
                k_old = xk.shape[1]
                onehot = jax.nn.one_hot(beam_indices.reshape(
                    batch_size, new_beam_size), k_old, dtype=x.dtype)
            flat = xk.reshape(batch_size, xk.shape[1], -1)
            out = jnp.einsum("bnk,bkf->bnf", onehot.astype(x.dtype), flat)
            return out.reshape(batch_size * new_beam_size, *x.shape[1:])
        out = jnp.take_along_axis(
            xk, beam_indices.reshape(batch_size, new_beam_size,
                                     *([1] * (xk.ndim - 2))), axis=1)
        return out.reshape(batch_size * new_beam_size, *x.shape[1:])

    return jax.tree.map(gather, tree)


def beam_search(
    model,
    params,
    src_enc: jax.Array,            # (B, Ss, D)
    src_mask: jax.Array,           # (B, Ss)
    beam_size: int,
    max_len: int,
    tgt_lang_id: Optional[int] = None,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    fast_topk: bool = False,
    eos_index: int = EOS_IDX,
    pad_index: int = PAD_IDX,
    start_index: int = BOS_IDX,
) -> Tuple[jax.Array, jax.Array]:
    """Beam search; returns the best hypothesis per row:
    (tokens (B, max_len), lengths (B,)).  tokens[:, 0] == ``start_index``
    — BOS by default to match the training target format (see module
    docstring).

    Scoring matches the reference: finished hypotheses are ranked by
    sum-logp / len^alpha where len counts generated tokens incl. final EOS.

    ``fast_topk`` selects per-beam candidates with the TPU-native
    ``lax.approx_max_k`` (recall 0.99/element) instead of the exact sort —
    the per-step top-2K over the 250k vocab is the dominant non-GEMM cost
    of a beam step; survivor log-probs stay exact (logsumexp unchanged).
    """
    b = src_enc.shape[0]
    k = beam_size
    bk = b * k

    # The source encoding stays UNREPLICATED: the cross-attention K/V cache
    # is computed once per row and cross-attention beam-folds its queries
    # (layers.py), so each row's K/V is read from HBM once per step instead
    # of once per beam (5x less cross-cache traffic at beam 5).
    cache0 = model.apply(as_variables(params), src_enc, max_len, bk,
                         method=model.init_decode_cache)
    # Split the cache: only the SELF-attention K/V depends on which beams
    # survive; the precomputed cross-attention K/V is identical across the K
    # beams of a row (all repeats of the same source encoding), so gathering
    # it per step is a semantic no-op that moves ~GBs/step at 100 regions
    # (profiled as the dominant non-GEMM cost of a beam step).  Carry the
    # self part through the scan; close over the cross part.
    cross_cache = {L: {"cross": c.get("cross", {})}
                   for L, c in cache0.items()}
    cache = {L: {"self": c["self"]} for L, c in cache0.items()}

    def _merge_cache(self_c):
        return {L: {**self_c[L], **cross_cache[L]} for L in self_c}

    # beam 0 active, others -inf so step 1 picks distinct continuations
    init_logp = jnp.tile(jnp.array([0.0] + [NEG_INF] * (k - 1)), (b,))  # (BK,)
    seqs = jnp.full((bk, max_len), pad_index, jnp.int32)
    seqs = seqs.at[:, 0].set(start_index)

    fin_seqs = jnp.full((bk, max_len), pad_index, jnp.int32)
    fin_scores = jnp.full((bk,), NEG_INF)
    fin_lens = jnp.zeros((bk,), jnp.int32)

    def body(carry, t):
        seqs, logp, fin_seqs, fin_scores, fin_lens, done, cache = carry
        cur_tok = jnp.take_along_axis(seqs, t[None].repeat(bk)[:, None],
                                      axis=1)  # (BK, 1)
        positions = jnp.full((bk, 1), t, jnp.int32)
        langs = (jnp.full((bk, 1), tgt_lang_id, jnp.int32)
                 if tgt_lang_id is not None else None)
        logits, full_cache = _decode_step(model, params, cur_tok, positions,
                                          langs, src_enc, src_mask,
                                          _merge_cache(cache))
        cache = {L: {"self": full_cache[L]["self"]} for L in full_cache}
        # exact two-stage top-2K without materializing log_softmax over
        # (BK, V): within a beam row the candidate ranking equals the raw
        # logit ranking (logp and logsumexp are per-row constants), so
        # top-k the logits directly and compute exact log-probs only for
        # the 2K survivors.  The global top-2K over the K*V candidate row
        # is a subset of the union of per-beam top-2Ks, so sort V-long
        # rows (BK of them) instead of one K*V-long row per batch entry —
        # much friendlier to the TPU sort at 250k vocab, and the only
        # (BK, V) traversals left are the top_k read and the logsumexp
        # reduction (no (BK, V) log-prob tensor is ever written).
        if fast_topk:
            pb_logit, pb_idx = jax.lax.approx_max_k(
                logits, 2 * k, recall_target=0.99,
                aggregate_to_topk=True)                          # (BK, 2K)
        else:
            pb_logit, pb_idx = jax.lax.top_k(logits, 2 * k)      # (BK, 2K)
        lse = jax.scipy.special.logsumexp(
            logits.astype(jnp.float32), axis=-1)                 # (BK,)
        pb_logp = (logp[:, None] + pb_logit.astype(jnp.float32)
                   - lse[:, None])                               # (BK, 2K)
        merged = pb_logp.reshape(b, k * 2 * k)                   # (B, K*2K)
        top_logp, m_idx = jax.lax.top_k(merged, 2 * k)           # (B, 2K)
        beam_idx = m_idx // (2 * k)                              # (B, 2K)
        tok_idx = jnp.take_along_axis(
            pb_idx.reshape(b, k * 2 * k), m_idx, axis=1).astype(jnp.int32)
        is_eos = tok_idx == eos_index

        # ---- finished pool update (EOS candidates) ----
        gen_len = (t + 1).astype(jnp.float32)  # generated tokens incl. EOS
        eos_scores = jnp.where(is_eos, top_logp / gen_len ** length_penalty,
                               NEG_INF)                           # (B, 2K)
        # early stopping (reference `BeamHypotheses.is_done`,
        # transformer.py:1520-1535): once a row has K finished hypotheses,
        # freeze its pool — later candidates are not considered
        eos_scores = jnp.where(done[:, None], NEG_INF, eos_scores)
        eos_src = _gather_beams({"s": seqs}, beam_idx, b, 2 * k)["s"]
        eos_seqs = eos_src.reshape(b, 2 * k, max_len)
        eos_seqs = eos_seqs.at[:, :, t + 1].set(
            jnp.where(is_eos, eos_index, pad_index))
        # merge (K old finished) + (2K new) and keep best K
        merged_scores = jnp.concatenate(
            [fin_scores.reshape(b, k), eos_scores], axis=1)       # (B, 3K)
        merged_seqs = jnp.concatenate(
            [fin_seqs.reshape(b, k, max_len), eos_seqs], axis=1)  # (B, 3K, L)
        merged_lens = jnp.concatenate(
            [fin_lens.reshape(b, k),
             jnp.broadcast_to((t + 2)[None, None], (b, 2 * k)).astype(jnp.int32)],
            axis=1)
        best_scores, best_i = jax.lax.top_k(merged_scores, k)     # (B, K)
        new_fin_seqs = jnp.take_along_axis(
            merged_seqs, best_i[:, :, None], axis=1).reshape(bk, max_len)
        new_fin_scores = best_scores.reshape(bk)
        new_fin_lens = jnp.take_along_axis(merged_lens, best_i,
                                           axis=1).reshape(bk)
        if early_stopping:
            new_done = done | jnp.all(best_scores > NEG_INF / 2, axis=1)
        else:
            new_done = done

        # ---- alive beams: best K non-EOS among the 2K ----
        alive_logp_cand = jnp.where(is_eos, NEG_INF, top_logp)    # (B, 2K)
        alive_scores, alive_i = jax.lax.top_k(alive_logp_cand, k)  # (B, K)
        sel_beam = jnp.take_along_axis(beam_idx, alive_i, axis=1)  # (B, K)
        sel_tok = jnp.take_along_axis(tok_idx, alive_i, axis=1)    # (B, K)

        gathered = _gather_beams({"seqs": seqs, "cache": cache}, sel_beam,
                                 b, k)
        new_seqs = gathered["seqs"].at[:, t + 1].set(sel_tok.reshape(bk))
        new_cache = gathered["cache"]
        new_logp = alive_scores.reshape(bk)

        return (new_seqs, new_logp, new_fin_seqs, new_fin_scores,
                new_fin_lens, new_done, new_cache), None

    done0 = jnp.zeros((b,), bool)
    carry = (seqs, init_logp, fin_seqs, fin_scores, fin_lens, done0, cache)
    (seqs, logp, fin_seqs, fin_scores, fin_lens, done, _), _ = jax.lax.scan(
        body, carry, jnp.arange(max_len - 1))

    # force-finish still-alive beams at max length (reference
    # `transformer.py:1487-1496`); rows finished early keep only their pool
    alive_scores = logp / float(max_len) ** length_penalty        # (BK,)
    alive_scores = jnp.where(jnp.repeat(done, k), NEG_INF, alive_scores)
    all_scores = jnp.concatenate(
        [fin_scores.reshape(b, k), alive_scores.reshape(b, k)], axis=1)
    all_seqs = jnp.concatenate(
        [fin_seqs.reshape(b, k, max_len), seqs.reshape(b, k, max_len)],
        axis=1)
    all_lens = jnp.concatenate(
        [fin_lens.reshape(b, k),
         jnp.full((b, k), max_len, jnp.int32)], axis=1)
    best = jnp.argmax(all_scores, axis=1)                         # (B,)
    out = jnp.take_along_axis(all_seqs, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(all_lens, best[:, None], axis=1)[:, 0]
    return out, lens
