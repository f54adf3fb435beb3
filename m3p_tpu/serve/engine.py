"""Inference engine: checkpoint-loaded, device-resident model with
shape-bucketed, jit-cached entry points.

TPU serving rules encoded here:
  * every entry point compiles once per (batch-bucket, seq-bucket) and is
    reused — requests are padded up to the bucket, results sliced back, so
    steady-state traffic never re-traces (XLA recompilation is the serving
    latency cliff);
  * parameters are staged on device once at load;
  * image galleries for retrieval live on device; per-query work ships only
    the tokenized query (the eval-grid design, `m3p_tpu/eval/retrieval.py`).

Capability parity: ITM pair scoring and full-gallery retrieval mirror the
reference's `evaluate_image_retrieval` semantics
(`/root/reference/M3P/src/evaluation/xevaluator.py:1528-1657`); captioning and
translation wrap the same beam/greedy decoders the Evaluator uses
(`m3p_tpu/model/generation.py`).
"""

from __future__ import annotations

import bisect
import logging
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from m3p_tpu.config import EOS_IDX, PAD_IDX
from m3p_tpu.model.transformer import as_variables

logger = logging.getLogger("m3p_tpu")

DEFAULT_TEXT_BUCKETS = (16, 32, 64)
DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (the largest bucket caps the value; callers chunk
    anything bigger)."""
    i = bisect.bisect_left(buckets, n)
    return buckets[min(i, len(buckets) - 1)]


class InferenceEngine:
    """Batched inference over a loaded M3P model.

    Thread-safe: jit-cache population is locked; compiled callables are pure
    and can run concurrently (JAX serializes device execution).
    """

    def __init__(self, model, params, tokenizer=None, *,
                 max_regions: int = 100,
                 text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
                 batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
                 refine_image: bool = True,
                 beam_size: int = 5,
                 max_gen_len: int = 20,
                 length_penalty: float = 1.0,
                 lang2id: Optional[Dict[str, int]] = None):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = jax.tree.map(jnp.asarray, params)
        # frozen-weight int8: quantize the GEMM weights ONCE at load when the
        # model was built in int8_infer mode (`model.quantized_inference_model`)
        self.variables = {"params": self.params}
        if "int8_infer" in (getattr(model.cfg, "ffn_quant", "none"),
                            getattr(model.cfg, "head_quant", "none")):
            from m3p_tpu.model import capture_q8

            self.variables["q8"] = capture_q8(model, self.params)
            logger.info("serve: frozen-weight int8 tables captured")
        self.tokenizer = tokenizer
        self.feat_dim = int(getattr(getattr(model, "cfg", None),
                                    "img_feat_dim", 2048))
        self.max_regions = int(max_regions)
        self.text_buckets = tuple(sorted(text_buckets))
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.refine_image = refine_image
        self.beam_size = int(beam_size)
        self.max_gen_len = int(max_gen_len)
        self.length_penalty = float(length_penalty)
        self.lang2id = dict(lang2id or {})
        self.store = None          # optional RegionFeatureStore
        self._gallery = None       # device-resident retrieval gallery
        self._jit_cache: Dict[Tuple, Any] = {}
        self._lock = threading.Lock()

    # -- construction ------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, model_cfg, tokenizer=None,
                        quant: str = "none", **kw) -> "InferenceEngine":
        """Load weights from an Orbax checkpoint dir or a reference ``.pth``
        (auto-detected), backfilling any missing keys from a fresh init.

        ``quant="int8"`` serves through the frozen-weight int8 path: weights
        quantize once at load, GEMMs ride the int8 MXU (same checkpoint —
        the parameter tree is unchanged)."""
        import jax

        from m3p_tpu import checkpoint as C
        from m3p_tpu.model import build_model, quantized_inference_model

        model, params = build_model(model_cfg, jax.random.PRNGKey(0))
        if path.endswith((".pth", ".pt")):
            loaded = C.load_reference_checkpoint(
                path, model_cfg.n_layers,
                refine_layers=getattr(model_cfg, "refine_layers", 3))
        else:
            loaded = C.load_params_checkpoint(path)
        params = C.merge_params(params, loaded)
        if quant == "int8":
            model = quantized_inference_model(model_cfg)
        elif quant != "none":
            raise ValueError(f"unknown quant mode {quant!r}")
        return cls(model, params, tokenizer=tokenizer,
                   max_regions=model_cfg.max_region_num, **kw)

    def attach_store(self, path: str) -> None:
        """Serve image payloads by ``image_id`` out of a reference-layout h5
        shard (`data/features.py`)."""
        from m3p_tpu.data.features import RegionFeatureStore

        self.store = RegionFeatureStore(path, self.max_regions)

    # -- payload handling ----------------------------------------------------

    def resolve_image(self, obj: Dict[str, Any]
                      ) -> Tuple[np.ndarray, np.ndarray, int]:
        """-> (feats (R, 2048) L2-normalized, locs (R, 5), num_boxes).

        Accepts {"image_id": ...} (requires an attached store), or inline
        {"feats": (r, 2048), "locs": (r, 5)} /
        {"features": (r, 2048), "boxes": (r, 4), "wh": [h, w]} arrays.
        """
        from m3p_tpu.data.features import l2_normalize, norm_boxes

        r = self.max_regions
        if "image_id" in obj:
            if self.store is None:
                raise ValueError("image_id payloads need an attached feature "
                                 "store (attach_store)")
            got = self.store.get(self.store.index_of(obj["image_id"]))
            return got["feats"], got["locs"], int(got["num_boxes"])
        raw = obj.get("feats", obj.get("features"))
        if raw is None:
            raise ValueError("image payload needs image_id or a "
                             "feats/features array")
        feats = np.asarray(raw, np.float32)
        if feats.ndim != 2:
            raise ValueError(f"feats must be 2-d (r, {self.feat_dim}), "
                             f"got shape {feats.shape}")
        if "locs" in obj:
            locs = np.asarray(obj["locs"], np.float32)
        elif "boxes" in obj and "wh" in obj:
            h, w = np.asarray(obj["wh"], np.float32)
            locs = norm_boxes(np.asarray(obj["boxes"], np.float32), h, w)
        else:
            raise ValueError("image payload needs locs or boxes+wh")
        n = min(feats.shape[0], r)
        out_f = np.zeros((r, feats.shape[1]), np.float32)
        out_l = np.zeros((r, 5), np.float32)
        out_f[:n] = l2_normalize(feats[:n])
        out_l[:n] = locs[:n]
        return out_f, out_l, n

    def _tokenize_bucketed(self, texts: Sequence[str],
                           lang: Optional[str] = None
                           ) -> Tuple[np.ndarray, np.ndarray,
                                      Optional[np.ndarray], int]:
        """Encode once, pick the smallest text bucket that fits, and pad to
        it; -> (tokens, lengths, langs, bucket_len)."""
        from m3p_tpu.tokenization.tokenizer import batch_sentences

        if self.tokenizer is None:
            raise ValueError("this engine has no tokenizer (pass one to the "
                             "constructor for text endpoints)")
        max_ids = max(self.text_buckets) - 2
        ids = self.tokenizer.encode_batch(list(texts), max_ids=max_ids)
        sl = self._text_bucket([len(s) + 2 for s in ids])
        lang_ids = None
        if lang is not None:
            lang_ids = [self.lang_id(lang)] * len(texts)
        toks, lens, langs = batch_sentences(ids, max_len=sl,
                                            lang_ids=lang_ids)
        return toks, lens, langs, sl

    def lang_id(self, lang: Optional[str]) -> Optional[int]:
        if lang is None:
            return None
        if lang not in self.lang2id:
            raise ValueError(f"unknown language {lang!r}; "
                             f"known: {sorted(self.lang2id)}")
        return self.lang2id[lang]

    def _text_bucket(self, lengths: Sequence[int]) -> int:
        return _bucket(max((int(l) for l in lengths), default=2),
                       self.text_buckets)

    # -- jit cache -----------------------------------------------------------

    def _jitted(self, key: Tuple, builder) -> Any:
        with self._lock:
            fn = self._jit_cache.get(key)
            if fn is None:
                import jax

                fn = jax.jit(builder())
                self._jit_cache[key] = fn
                logger.info("serve: compiled %s", key)
        return fn

    def _score_fn(self):
        def builder():
            from m3p_tpu.model.transformer import lengths_to_mask

            def fn(params, tokens, text_len, feats, locs, img_len):
                import jax.numpy as jnp

                text_mask = lengths_to_mask(text_len, tokens.shape[1])
                img_mask = lengths_to_mask(img_len, feats.shape[1])
                hidden = self.model.apply(
                    as_variables(params), tokens, text_mask, feats, locs,
                    img_mask, self.refine_image,
                    method=self.model.encode_joint)
                scores = self.model.apply(as_variables(params), hidden,
                                          method=self.model.itm_score)
                return scores[:, 0].astype(jnp.float32)

            return fn

        return builder

    def _caption_fn(self, beam_size: int, max_len: int, lang_id):
        def builder():
            from m3p_tpu.model.generation import beam_search, greedy_generate
            from m3p_tpu.model.transformer import lengths_to_mask

            def fn(params, feats, locs, img_len):
                img_mask = lengths_to_mask(img_len, feats.shape[1])
                src_enc = self.model.apply(
                    as_variables(params), feats, locs, img_mask, None,
                    self.refine_image, method=self.model.encode_image)
                if beam_size > 1:
                    return beam_search(self.model, params, src_enc, img_mask,
                                       beam_size, max_len,
                                       tgt_lang_id=lang_id,
                                       length_penalty=self.length_penalty)
                return greedy_generate(self.model, params, src_enc, img_mask,
                                       max_len, tgt_lang_id=lang_id)

            return fn

        return builder

    def _translate_fn(self, beam_size: int, max_len: int, tgt_id,
                      has_src_langs: bool):
        def builder():
            from m3p_tpu.model.generation import beam_search, greedy_generate
            from m3p_tpu.model.transformer import lengths_to_mask

            def fn(params, tokens, text_len, src_langs):
                src_mask = lengths_to_mask(text_len, tokens.shape[1])
                src_enc, _ = self.model.apply(
                    as_variables(params), tokens, src_mask,
                    src_langs if has_src_langs else None,
                    method=self.model.encode_text)
                if beam_size > 1:
                    return beam_search(self.model, params, src_enc, src_mask,
                                       beam_size, max_len, tgt_lang_id=tgt_id,
                                       length_penalty=self.length_penalty)
                return greedy_generate(self.model, params, src_enc, src_mask,
                                       max_len, tgt_lang_id=tgt_id)

            return fn

        return builder

    # -- public entry points ---------------------------------------------

    def score(self, texts: Sequence[str],
              images: Sequence[Dict[str, Any]]) -> List[float]:
        """ITM relevance score per (text, image) pair (len(texts) pairs)."""
        import jax.numpy as jnp

        assert len(texts) == len(images)
        if not texts:
            return []
        out: List[float] = []
        cap = self.batch_buckets[-1]
        for start in range(0, len(texts), cap):
            t = texts[start:start + cap]
            im = images[start:start + cap]
            sb = _bucket(len(t), self.batch_buckets)
            resolved = [self.resolve_image(o) for o in im]
            tokens, lengths, _, sl = self._tokenize_bucketed(t)
            feats = np.zeros((sb, self.max_regions, resolved[0][0].shape[-1]),
                             np.float32)
            locs = np.zeros((sb, self.max_regions, 5), np.float32)
            img_len = np.zeros((sb,), np.int32)
            toks = np.full((sb, sl), PAD_IDX, np.int32)
            tl = np.full((sb,), 2, np.int32)
            toks[: len(t)] = tokens
            tl[: len(t)] = lengths
            for i, (f, l, n) in enumerate(resolved):
                feats[i], locs[i], img_len[i] = f, l, n
            fn = self._jitted(("score", sb, sl), self._score_fn())
            s = fn(self.variables, jnp.asarray(toks), jnp.asarray(tl),
                   jnp.asarray(feats), jnp.asarray(locs),
                   jnp.asarray(img_len))
            out.extend(np.asarray(s)[: len(t)].tolist())
        return out

    def load_gallery(self, images: Sequence[Dict[str, Any]],
                     ids: Optional[Sequence[str]] = None) -> int:
        """Stage a retrieval gallery on device; returns its size."""
        import jax.numpy as jnp

        resolved = [self.resolve_image(o) for o in images]
        feats = np.stack([f for f, _, _ in resolved])
        locs = np.stack([l for _, l, _ in resolved])
        lens = np.array([n for _, _, n in resolved], np.int32)
        self._gallery = {
            "feats": jnp.asarray(feats), "locs": jnp.asarray(locs),
            "len": jnp.asarray(lens),
            "ids": list(ids) if ids is not None
            else [str(i) for i in range(len(resolved))],
        }
        return len(resolved)

    def load_gallery_from_store(self, limit: Optional[int] = None) -> int:
        if self.store is None:
            raise ValueError("no feature store attached")
        n = len(self.store) if limit is None else min(limit, len(self.store))
        ids = [str(i) for i in self.store.image_ids[:n]]
        return self.load_gallery([{"image_id": i} for i in ids], ids)

    def retrieve(self, text: str, top_k: int = 10) -> List[Dict[str, Any]]:
        """Rank the loaded gallery for one query; -> [{id, score}] best-first.

        Scores every (query, image) pair with the same chunked joint-forward
        the eval grid uses; the gallery never leaves the device.
        """
        import jax.numpy as jnp

        if self._gallery is None:
            raise ValueError("no gallery loaded (load_gallery)")
        g = self._gallery
        n = int(g["feats"].shape[0])
        tokens, lengths, _, sl = self._tokenize_bucketed([text])
        scores = np.zeros((n,), np.float32)
        chunk = self.batch_buckets[-1]
        pending = []
        for start in range(0, n, chunk):
            idx = np.arange(start, min(start + chunk, n))
            pad = chunk - idx.size
            gi = np.concatenate([idx, np.zeros(pad, np.int64)])
            fn = self._jitted(("retrieve", chunk, sl), self._retrieve_fn())
            s = fn(self.variables, jnp.asarray(tokens), jnp.asarray(lengths),
                   g["feats"], g["locs"], g["len"],
                   jnp.asarray(gi, jnp.int32))
            pending.append((idx, s))
        for idx, s in pending:
            scores[idx] = np.asarray(s)[: idx.size]
        order = np.argsort(-scores)[:top_k]
        return [{"id": g["ids"][i], "score": float(scores[i])}
                for i in order]

    def _retrieve_fn(self):
        def builder():
            from m3p_tpu.model.transformer import lengths_to_mask

            def fn(params, tokens, text_len, g_feats, g_locs, g_len, img_idx):
                import jax.numpy as jnp

                b = img_idx.shape[0]
                toks = jnp.broadcast_to(tokens, (b, tokens.shape[1]))
                tl = jnp.broadcast_to(text_len, (b,))
                feats = jnp.take(g_feats, img_idx, axis=0)
                locs = jnp.take(g_locs, img_idx, axis=0)
                il = jnp.take(g_len, img_idx, axis=0)
                text_mask = lengths_to_mask(tl, toks.shape[1])
                img_mask = lengths_to_mask(il, feats.shape[1])
                hidden = self.model.apply(
                    as_variables(params), toks, text_mask, feats, locs,
                    img_mask, self.refine_image,
                    method=self.model.encode_joint)
                scores = self.model.apply(as_variables(params), hidden,
                                          method=self.model.itm_score)
                return scores[:, 0].astype(jnp.float32)

            return fn

        return builder

    def caption(self, images: Sequence[Dict[str, Any]],
                lang: Optional[str] = None,
                beam_size: Optional[int] = None,
                max_len: Optional[int] = None) -> List[str]:
        """Generate a caption per image (beam search by default)."""
        import jax.numpy as jnp

        if not images:
            return []
        beam_size = self.beam_size if beam_size is None else int(beam_size)
        max_len = self.max_gen_len if max_len is None else int(max_len)
        lang_id = self.lang_id(lang)
        out: List[str] = []
        cap = self.batch_buckets[-1]
        for start in range(0, len(images), cap):
            im = images[start:start + cap]
            sb = _bucket(len(im), self.batch_buckets)
            resolved = [self.resolve_image(o) for o in im]
            feats = np.zeros((sb, self.max_regions, resolved[0][0].shape[-1]),
                             np.float32)
            locs = np.zeros((sb, self.max_regions, 5), np.float32)
            img_len = np.ones((sb,), np.int32)
            for i, (f, l, n) in enumerate(resolved):
                feats[i], locs[i], img_len[i] = f, l, max(n, 1)
            fn = self._jitted(("caption", sb, beam_size, max_len, lang_id),
                              self._caption_fn(beam_size, max_len, lang_id))
            toks, lens = fn(self.variables, jnp.asarray(feats),
                            jnp.asarray(locs), jnp.asarray(img_len))
            toks, lens = np.asarray(toks), np.asarray(lens)
            for i in range(len(im)):
                out.append(self.tokenizer.decode(toks[i, 1:lens[i]]))
        return out

    def translate(self, texts: Sequence[str], tgt_lang: str,
                  src_lang: Optional[str] = None,
                  beam_size: Optional[int] = None,
                  max_len: Optional[int] = None) -> List[str]:
        """Seq2seq generation (MT/NTG-style decode against the text encoder)."""
        import jax.numpy as jnp

        if not texts:
            return []
        beam_size = self.beam_size if beam_size is None else int(beam_size)
        max_len = self.max_gen_len if max_len is None else int(max_len)
        tgt_id = self.lang_id(tgt_lang)
        out: List[str] = []
        cap = self.batch_buckets[-1]
        for start in range(0, len(texts), cap):
            t = texts[start:start + cap]
            sb = _bucket(len(t), self.batch_buckets)
            tokens, lengths, langs, sl = self._tokenize_bucketed(
                t, lang=src_lang)
            toks = np.full((sb, sl), PAD_IDX, np.int32)
            tl = np.full((sb,), 2, np.int32)
            toks[: len(t)] = tokens
            tl[: len(t)] = lengths
            lg = np.zeros((sb, sl), np.int32)
            if langs is not None:
                lg[: len(t)] = langs
            fn = self._jitted(
                ("translate", sb, sl, beam_size, max_len, tgt_id,
                 src_lang is not None),
                self._translate_fn(beam_size, max_len, tgt_id,
                                   src_lang is not None))
            otoks, olens = fn(self.variables, jnp.asarray(toks),
                              jnp.asarray(tl), jnp.asarray(lg))
            otoks, olens = np.asarray(otoks), np.asarray(olens)
            for i in range(len(t)):
                out.append(self.tokenizer.decode(otoks[i, 1:olens[i]]))
        return out

    # -- ops ------------------------------------------------------------

    def warmup(self, batch: Optional[int] = None,
               text_len: Optional[int] = None) -> None:
        """Pre-compile the scoring path for the default bucket so the first
        request doesn't pay XLA compile latency."""
        import jax.numpy as jnp

        sb = batch or self.batch_buckets[-1]
        sl = text_len or self.text_buckets[0]
        fn = self._jitted(("score", sb, sl), self._score_fn())
        d = self.feat_dim
        _ = fn(self.variables,
               jnp.full((sb, sl), PAD_IDX, jnp.int32),
               jnp.full((sb,), 2, jnp.int32),
               jnp.zeros((sb, self.max_regions, d), jnp.float32),
               jnp.zeros((sb, self.max_regions, 5), jnp.float32),
               jnp.ones((sb,), jnp.int32))
        float(np.asarray(_)[0])

    def stats(self) -> Dict[str, Any]:
        import jax

        return {
            "compiled_entry_points": sorted(
                str(k) for k in self._jit_cache),
            "gallery_size": (int(self._gallery["feats"].shape[0])
                             if self._gallery else 0),
            "devices": [str(d) for d in jax.devices()],
            "languages": sorted(self.lang2id),
        }
