"""Evaluation orchestration — the reference `XEvaluator.run_all_evals`
(`/root/reference/M3P/src/evaluation/xevaluator.py:120-281`) rebuilt.

Per task family:
  * text/caption/MT ppl + next-token accuracy on validation batches (losses
    reused deterministically with a FIXED eval PRNG, matching the reference's
    seeded eval masking `xevaluator.py:402,502`)
  * retrieval: sample-grid accuracy on valid, full-grid R@1/5/10 + mean
    recall on test (`evaluate_image_retrieval` semantics)
  * captioning / NTG: beam decode -> detokenize -> BLEU / CIDEr
  * slide: binary accuracy
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m3p_tpu.data.masking import MaskingConfig
from m3p_tpu.eval.bleu import corpus_bleu
from m3p_tpu.eval.cider import cider_score
from m3p_tpu.eval.retrieval import recall_at_k, retrieval_grid_scores
from m3p_tpu.model.generation import beam_search, greedy_generate
from m3p_tpu.model.transformer import as_variables, lengths_to_mask
from m3p_tpu.train import steps as S

logger = logging.getLogger("m3p_tpu")

EVAL_SEED = 0  # fixed eval RNG (reference `np.random.RandomState(0)`)


class Evaluator:
    def __init__(self, model, cfg, mask_cfg: Optional[MaskingConfig] = None):
        self.model = model
        self.cfg = cfg
        self.mask_cfg = mask_cfg or MaskingConfig(
            n_words=cfg.model.n_words, mask_index=cfg.model.mask_index,
            max_pred=cfg.data.max_pred_per_seq)
        self._decode_cache: Dict[Tuple, Any] = {}
        # --eval_quant int8: generation evals decode through the
        # frozen-weight int8 model (weights quantize once per eval via
        # capture_q8; loss/grid evals keep the exact bf16 path)
        self.gen_model = model
        if getattr(getattr(cfg, "eval", None), "quant", "none") == "int8":
            from m3p_tpu.model import quantized_inference_model

            self.gen_model = quantized_inference_model(cfg.model)
        self._q8_cache: Tuple[int, Any] = (0, None)

    def _gen_variables(self, params):
        """Variables dict for the generation model: adds the one-time
        quantized weight tables when --eval_quant int8 is active (cached per
        params object — recaptured after each training epoch)."""
        if self.gen_model is self.model:
            return params
        key = id(jax.tree.leaves(params)[0])
        if self._q8_cache[0] != key:
            from m3p_tpu.model import capture_q8

            self._q8_cache = (key, capture_q8(self.gen_model, params))
        return {"params": params, "q8": self._q8_cache[1]}

    def _jit_decoder(self, kind: str, beam_size: int, max_len: int,
                     tgt_lang_id, length_penalty: float = 1.0):
        """Jitted beam/greedy decode, cached per static config — unjitted
        `lax.scan` re-traces the whole decode graph every batch."""
        fast = bool(getattr(self.cfg.eval, "fast_beam", False))
        key = (kind, beam_size, max_len, tgt_lang_id, length_penalty, fast)
        if key not in self._decode_cache:
            if kind == "beam":
                def fn(params, src_enc, src_mask):
                    return beam_search(
                        self.gen_model, params, src_enc, src_mask, beam_size,
                        max_len, tgt_lang_id=tgt_lang_id,
                        length_penalty=length_penalty,
                        early_stopping=self.cfg.eval.early_stopping,
                        fast_topk=fast)
            else:
                def fn(params, src_enc, src_mask):
                    return greedy_generate(
                        self.gen_model, params, src_enc, src_mask, max_len,
                        tgt_lang_id=tgt_lang_id)
            self._decode_cache[key] = jax.jit(fn)
        return self._decode_cache[key]

    # -- validation perplexities / accuracies ---------------------------

    def evaluate_mlm(self, params, batches: Iterable[Dict]) -> Dict[str, float]:
        key = jax.random.PRNGKey(EVAL_SEED)
        losses = []
        for b in batches:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            loss, _ = S.mlm_loss(self.model, params, b, key, self.mask_cfg,
                                 deterministic=True)
            losses.append(float(loss))
        mean = float(np.mean(losses)) if losses else float("nan")
        return {"mlm_ppl": float(np.exp(min(mean, 30.0))), "mlm_loss": mean}

    def evaluate_clm(self, params, batches: Iterable[Dict]) -> Dict[str, float]:
        key = jax.random.PRNGKey(EVAL_SEED)
        losses = []
        for b in batches:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            loss, _ = S.clm_loss(self.model, params, b, key,
                                 deterministic=True)
            losses.append(float(loss))
        mean = float(np.mean(losses)) if losses else float("nan")
        return {"clm_ppl": float(np.exp(min(mean, 30.0))), "clm_loss": mean}

    def evaluate_seq2seq(self, params, batches: Iterable[Dict],
                         multimodal: bool = False, name: str = "mt"
                         ) -> Dict[str, float]:
        key = jax.random.PRNGKey(EVAL_SEED)
        losses, accs = [], []
        for b in batches:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            if multimodal:
                loss, m = S.mt_caption_loss(
                    self.model, params, b, key, deterministic=True,
                    refine_image=getattr(self.cfg, "refine_image", True))
            else:
                loss, m = S.mt_loss(self.model, params, b, key,
                                    deterministic=True)
            losses.append(float(loss))
            accs.append(float(m["acc"]))
        mean = float(np.mean(losses)) if losses else float("nan")
        return {f"{name}_ppl": float(np.exp(min(mean, 30.0))),
                f"{name}_acc": 100.0 * float(np.mean(accs)) if accs else 0.0}

    def evaluate_caption_loss(self, params, batches: Iterable[Dict]
                              ) -> Dict[str, float]:
        key = jax.random.PRNGKey(EVAL_SEED)
        losses, accs = [], []
        for b in batches:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            loss, m = S.caption_loss(self.model, params, b, key,
                                     deterministic=True)
            losses.append(float(loss))
            accs.append(float(m["acc"]))
        mean = float(np.mean(losses)) if losses else float("nan")
        return {"ic_ppl": float(np.exp(min(mean, 30.0))),
                "ic_acc": 100.0 * float(np.mean(accs)) if accs else 0.0}

    # -- retrieval ------------------------------------------------------

    def evaluate_retrieval_valid(self, params, batches: Iterable
                                 ) -> Dict[str, float]:
        """Sample-grid accuracy (valid split, `evaluate_t2i/i2t`).

        ``batches``: (t2i, i2t) tuples — per-direction accs are reported as
        ``T2I_acc``/``I2T_acc`` (the reference recipes track
        ``valid_T2I_acc``/``valid_I2T_acc``) — or plain batch dicts, which
        only feed the combined ``retrieval_acc``."""
        key = jax.random.PRNGKey(EVAL_SEED)
        per_dir: Dict[str, List[float]] = {"T2I": [], "I2T": []}
        accs: List[float] = []

        def one(b):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            b = S.expand_compact_batch(b)
            _, m = S.itm_finetune_loss(self.model, params, b, key,
                                       self.cfg.data.sample_n,
                                       deterministic=True)
            return float(m["acc"])

        for item in batches:
            if isinstance(item, (tuple, list)) and len(item) == 2:
                for direction, b in zip(("T2I", "I2T"), item):
                    acc = one(b)
                    per_dir[direction].append(acc)
                    accs.append(acc)
            else:
                accs.append(one(item))
        out = {"retrieval_acc":
               100.0 * float(np.mean(accs)) if accs else 0.0}
        for d, vals in per_dir.items():
            if vals:
                out[f"{d}_acc"] = 100.0 * float(np.mean(vals))
        return out

    def evaluate_retrieval_test(self, params, cap_tokens, cap_len, cap_to_img,
                                img_feats, img_locs, img_len,
                                chunk_size: int = 512,
                                prefix: str = "") -> Dict[str, float]:
        scores = retrieval_grid_scores(
            self.model, params, cap_tokens, cap_len, img_feats, img_locs,
            img_len, chunk_size=chunk_size,
            refine_image=getattr(self.cfg, "refine_image", True))
        r = recall_at_k(scores, cap_to_img)
        eval_path = getattr(self.cfg.eval, "eval_path", "")
        if eval_path:
            # reference eval artifacts (`xevaluator.py:258-259,1616-1619`):
            # the raw image x caption score matrix and an R@k append log
            import os

            os.makedirs(eval_path, exist_ok=True)
            np.save(os.path.join(
                eval_path, f"score_{prefix or 'test'}"
                f"_rank{jax.process_index()}.npy"), np.asarray(scores))
            with open(os.path.join(eval_path, "inference.log"), "a") as f:
                f.write(" ".join(str(r[k]) for k in
                                 ("i2t_r1", "i2t_r5", "i2t_r10")) + "\n")
        return {f"{prefix}{k}": v for k, v in r.items()}

    # -- generation -----------------------------------------------------

    def generate_captions(self, params, batches: Iterable[Dict], tokenizer,
                          tgt_lang_id: Optional[int] = None,
                          beam_size: Optional[int] = None,
                          max_len: Optional[int] = None) -> List[str]:
        beam_size = beam_size or self.cfg.eval.beam_size
        max_len = max_len or self.cfg.eval.max_gen_len
        hyps: List[str] = []
        gvars = self._gen_variables(params)
        for b in batches:
            feats = jnp.asarray(b["feats"])
            locs = jnp.asarray(b["locs"])
            img_mask = lengths_to_mask(jnp.asarray(b["img_len"]),
                                       feats.shape[1])
            # reference eval honors params.refine_image but never applies
            # refine_encoder (`xevaluator.py:845-1044` — a train/eval
            # asymmetry mirrored deliberately)
            src_enc = self.gen_model.apply(
                as_variables(gvars), feats, locs, img_mask, None,
                getattr(self.cfg, "refine_image", True),
                method=self.gen_model.encode_image)
            if beam_size > 1:
                decode = self._jit_decoder(
                    "beam", beam_size, max_len, tgt_lang_id,
                    self.cfg.eval.length_penalty)
            else:
                decode = self._jit_decoder("greedy", 1, max_len, tgt_lang_id)
            toks, lens = decode(gvars, src_enc, img_mask)
            toks, lens = np.asarray(toks), np.asarray(lens)
            for i in range(toks.shape[0]):
                hyps.append(tokenizer.decode(toks[i, 1:lens[i]]))
        return hyps

    def generate_translations(self, params, batches: Iterable[Dict],
                              tokenizer, tgt_lang_id: Optional[int] = None,
                              beam_size: Optional[int] = None,
                              max_len: Optional[int] = None) -> List[str]:
        """Seq2seq generation for MT / NTG eval (`evaluate_mt` /
        `evaluate_ntg_generate`, `xevaluator.py:1178-1260`)."""
        beam_size = beam_size or self.cfg.eval.beam_size
        max_len = max_len or self.cfg.eval.max_gen_len
        hyps: List[str] = []
        gvars = self._gen_variables(params)
        for b in batches:
            src = jnp.asarray(b["src_tokens"])
            src_mask = lengths_to_mask(jnp.asarray(b["src_len"]),
                                       src.shape[1])
            if "feats" in b:
                # multimodal MT: decode against the joint [img; text]
                # encoding (`mt_ic` eval, `xevaluator.py:903-1117`)
                feats = jnp.asarray(b["feats"])
                img_mask = lengths_to_mask(jnp.asarray(b["img_len"]),
                                           feats.shape[1])
                src_enc = self.gen_model.apply(
                    as_variables(gvars), src, src_mask, feats,
                    jnp.asarray(b["locs"]), img_mask,
                    getattr(self.cfg, "refine_image", True),
                    method=self.gen_model.encode_joint)
                src_mask = jnp.concatenate([img_mask, src_mask], axis=1)
            else:
                src_enc, _ = self.gen_model.apply(
                    as_variables(gvars), src, src_mask,
                    jnp.asarray(b["src_langs"]) if "src_langs" in b else None,
                    method=self.gen_model.encode_text)
            if beam_size > 1:
                decode = self._jit_decoder(
                    "beam", beam_size, max_len, tgt_lang_id,
                    self.cfg.eval.length_penalty)
            else:
                decode = self._jit_decoder("greedy", 1, max_len, tgt_lang_id)
            toks, lens = decode(gvars, src_enc, src_mask)
            toks, lens = np.asarray(toks), np.asarray(lens)
            for i in range(toks.shape[0]):
                hyps.append(tokenizer.decode(toks[i, 1:lens[i]]))
        return hyps

    def evaluate_translation(self, params, batches: List[Dict],
                             references: List[List[str]], tokenizer,
                             tgt_lang_id: Optional[int] = None,
                             name: str = "mt") -> Dict[str, float]:
        hyps = self.generate_translations(params, batches, tokenizer,
                                          tgt_lang_id)
        n = min(len(hyps), len(references))
        return {f"{name}_bleu": corpus_bleu(hyps[:n], references[:n])}

    def evaluate_captioning(self, params, batches: List[Dict],
                            references: List[List[str]], tokenizer,
                            tgt_lang_id: Optional[int] = None,
                            image_ids: Optional[List] = None,
                            lang: str = "") -> Dict[str, float]:
        hyps = self.generate_captions(params, batches, tokenizer, tgt_lang_id)
        n = min(len(hyps), len(references))
        eval_path = getattr(self.cfg.eval, "eval_path", "")
        if eval_path and image_ids is not None:
            # decoded hypotheses as an artifact, mirroring the reference's
            # caption export (`xevaluator.py:986-993` writes
            # `epoch_*_<ds>_caption_translate.<lang>.json` of
            # {image_id, caption} dicts to params.eval_path; our eval_path
            # is per-run so the epoch prefix is dropped).  Without this the
            # decoded strings are unreachable post-hoc — an all-zero metric
            # (e.g. a unigram-collapsed undertrained model) can only be
            # diagnosed by re-running the decode
            import json
            import os

            os.makedirs(eval_path, exist_ok=True)
            out_path = os.path.join(
                eval_path, f"caption_translate.{lang or 'xx'}.json")
            with open(out_path, "w") as f:
                json.dump([{"image_id": str(i), "caption": h}
                           for i, h in zip(image_ids, hyps[:n])], f)
        # --coco_method selects which caption metrics to report
        # (`xevaluator.py:1010-1016`); names match the COCOEvalCap keys:
        # Bleu, METEOR, ROUGE_L, CIDEr (all four in-process; METEOR is the
        # exact+stem variant — see eval/caption_metrics.py).  An
        # unrecognized-only list falls back to the reference default
        # (CIDEr, `train_x.py:337`) rather than silently evaluating nothing.
        supported = {"bleu", "cider", "meteor", "rouge_l"}
        methods = {m.strip().lower() for m in
                   getattr(self.cfg.eval, "coco_method",
                           "Bleu,CIDEr").split(",") if m.strip()}
        if not methods & supported:
            logger.warning(
                "coco_method %r has no in-process metric (supported: "
                "Bleu, METEOR, ROUGE_L, CIDEr) — computing CIDEr",
                getattr(self.cfg.eval, "coco_method", ""))
            methods = {"cider"}
        scores: Dict[str, float] = {}
        if "bleu" in methods:
            scores["caption_bleu"] = corpus_bleu(hyps[:n], references[:n])
        if "cider" in methods:
            scores["caption_cider"] = cider_score(hyps[:n], references[:n])
        if "meteor" in methods or "rouge_l" in methods:
            from m3p_tpu.eval.caption_metrics import (meteor_score,
                                                      rouge_l_score)

            if "meteor" in methods:
                scores["caption_meteor"] = meteor_score(hyps[:n],
                                                        references[:n])
            if "rouge_l" in methods:
                scores["caption_rouge_l"] = rouge_l_score(hyps[:n],
                                                          references[:n])
        return scores

    # -- slide ----------------------------------------------------------

    def evaluate_slide(self, params, batches: Iterable[Dict]
                       ) -> Dict[str, float]:
        key = jax.random.PRNGKey(EVAL_SEED)
        accs = []
        for b in batches:
            b = {k: jnp.asarray(v) for k, v in b.items()}
            _, m = S.slide_loss(self.model, params, b, key,
                                deterministic=True)
            accs.append(float(m["acc"]))
        return {"slide_acc": 100.0 * float(np.mean(accs)) if accs else 0.0}

    # -- top level ------------------------------------------------------

    def run_all_evals(self, params, eval_data: Dict[str, Any]
                      ) -> Dict[str, float]:
        """Dispatch over whatever eval data is provided.

        eval_data keys (all optional; a ``.<lang>`` suffix prefixes the
        resulting score names with ``<lang>_`` — the per-language loop the
        reference runs over `ft_lgs` in `run_all_evals`,
        `xevaluator.py:120-281`):
          mlm_batches, clm_batches, mass_batches, mt_batches, mmt_batches,
          ntg_batches, caption_batches, retrieval_valid_batches,
          retrieval_test (tuple of grid arrays),
          caption_gen / mt_gen / ntg_gen / mmt_gen (dict with batches/
          references/tokenizer/lang_id; mmt batches carry feats and decode
          against the joint encoding), slide_batches
        """
        scores: Dict[str, float] = {}
        for key in sorted(eval_data.keys()):
            base, _, suffix = key.partition(".")
            prefix = f"{suffix}_" if suffix else ""
            data = eval_data[key]
            got: Dict[str, float] = {}
            if base == "mlm_batches":
                got = self.evaluate_mlm(params, data)
            elif base == "clm_batches":
                got = self.evaluate_clm(params, data)
            elif base == "mass_batches":
                rng = jax.random.PRNGKey(EVAL_SEED)
                losses = [float(S.mass_loss(self.model, params,
                                            {k: jnp.asarray(v)
                                             for k, v in b.items()},
                                            rng, deterministic=True)[0])
                          for b in data]
                mean = float(np.mean(losses)) if losses else float("nan")
                got = {"mass_ppl": float(np.exp(min(mean, 30.0)))}
            elif base == "mt_batches":
                got = self.evaluate_seq2seq(params, data)
            elif base == "ntg_batches":
                got = self.evaluate_seq2seq(params, data, name="ntg")
            elif base == "mmt_batches":
                got = self.evaluate_seq2seq(params, data, multimodal=True,
                                            name="mmt")
            elif base == "caption_batches":
                got = self.evaluate_caption_loss(params, data)
            elif base == "retrieval_valid_batches":
                got = self.evaluate_retrieval_valid(params, data)
            elif base == "retrieval_test":
                got = self.evaluate_retrieval_test(params, *data)
            elif base == "caption_gen":
                got = self.evaluate_captioning(
                    params, data["batches"], data["references"],
                    data["tokenizer"], data.get("lang_id"),
                    image_ids=data.get("image_ids"), lang=suffix)
            elif base in ("mt_gen", "ntg_gen", "mmt_gen"):
                got = self.evaluate_translation(
                    params, data["batches"], data["references"],
                    data["tokenizer"], data.get("lang_id"),
                    data.get("name", "mt"))
            elif base == "slide_batches":
                got = self.evaluate_slide(params, data)
            else:
                logger.warning("unknown eval family: %s", key)
            scores.update({f"{prefix}{k}": v for k, v in got.items()})
        logger.info("__log__:%s", scores)
        return scores
