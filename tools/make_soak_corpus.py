"""Generate a reference-layout faux corpus for end-to-end soak runs.

Two modes:

* ``--learnable`` (default): image features and captions are *correlated*
  through a shared latent concept space, so fine-tuning retrieval on the
  corpus must drive R@1 far above chance — an end-to-end learning check,
  not just a plumbing check.  Each image gets ``--concepts-per-image``
  distinct concepts out of a small bilingual inventory; every region
  feature lies along its concept's fixed random direction in the 2048-d
  feature space (plus noise), every caption names the image's concepts
  (in the caption language's word forms) plus filler words.  A model that
  learns word <-> feature-direction alignment can rank the matching image
  first; random features (the old soak) cap R@k at chance.
* ``--random``: uncorrelated features/captions (plumbing-only soak).

Layout produced under ``--out`` (reference conventions, SURVEY.md §2.1):
  coco/train.h5, coco/test.h5           reference-layout feature shards
  coco/{train,test}.{en,de}.pkl         image_id -> [5 caption strings]
  google/train.<shard>.h5 + pkls        pretrain shards (``--pretrain``)
  order/google_train_order.json         per-epoch shard schedule
  corpus.{en,de}.txt                    text streams for --mlm_steps
  vocab.tsv                             in-tree unigram vocab over the corpora
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m3p_tpu.data.features import write_feature_shard  # noqa: E402

# (en, de) word forms per concept — both forms must survive whole-word
# tokenization, so the vocab is trained over the generated corpora below.
CONCEPTS = [
    ("cat", "katze"), ("dog", "hund"), ("bird", "vogel"), ("man", "mann"),
    ("woman", "frau"), ("child", "kind"), ("car", "auto"), ("water", "wasser"),
    ("fence", "zaun"), ("table", "tisch"), ("plate", "teller"),
    ("sky", "himmel"), ("street", "strasse"), ("tree", "baum"),
    ("food", "essen"), ("people", "leute"),
]
FILLERS = {
    "en": ["a", "the", "in", "near", "white", "black", "small", "large"],
    "de": ["ein", "der", "im", "nahe", "weiss", "schwarz", "klein", "gross"],
}
FEAT_DIM = 2048


def _concept_directions(rng: np.random.RandomState) -> np.ndarray:
    u = rng.randn(len(CONCEPTS), FEAT_DIM).astype(np.float32)
    return u / np.linalg.norm(u, axis=1, keepdims=True)


def _image(rng, dirs, n_regions, k, learnable, signal=3.0, sigma=0.05,
           signed=False):
    """One image: (features (R, 2048), objects (R,), concept index list).

    ``signed=False`` passes features through ``abs`` (ReLU-like, matching
    real Faster-RCNN features — introduces a large shared positive
    component, cross-concept cosine ~0.64); ``signed=True`` keeps the raw
    signed directions (near-orthogonal concepts — a much easier corpus for
    from-scratch models)."""
    concepts = rng.choice(len(CONCEPTS), size=k, replace=False)
    noise = rng.randn(n_regions, FEAT_DIM).astype(np.float32) * sigma
    if learnable:
        region_concepts = concepts[np.arange(n_regions) % k]
        feats = dirs[region_concepts] * signal + noise
        if not signed:
            feats = np.abs(feats)
    else:
        region_concepts = rng.choice(len(CONCEPTS), size=n_regions)
        feats = np.abs(noise / sigma)  # pure noise, unit-ish scale
    return feats, region_concepts.astype(np.int32), concepts


def _captions(rng, concepts, lang, learnable, n=5, deterministic=False):
    if deterministic:
        # one caption, fully determined by the image: concept words in
        # sorted-index order, no fillers, repeated for all n references.
        # Drives caption-generation CE to ~0 so decode-quality benches
        # (BLEU/CIDEr deltas) measure the decoder, not irreducible entropy.
        words = [CONCEPTS[c][0 if lang == "en" else 1]
                 for c in sorted(concepts)]
        return [" ".join(words)] * n
    out = []
    for _ in range(n):
        if learnable:
            words = [CONCEPTS[c][0 if lang == "en" else 1] for c in concepts]
        else:
            words = [CONCEPTS[c][0 if lang == "en" else 1]
                     for c in rng.choice(len(CONCEPTS), size=4)]
        words = words + list(rng.choice(FILLERS[lang], size=3))
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def _boxes(rng, n_regions):
    w, h = 640.0, 480.0
    x1 = rng.uniform(0, w * 0.6, n_regions)
    y1 = rng.uniform(0, h * 0.6, n_regions)
    bw = rng.uniform(w * 0.1, w * 0.4, n_regions)
    bh = rng.uniform(h * 0.1, h * 0.4, n_regions)
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, w),
                      np.minimum(y1 + bh, h)], 1).astype(np.float32)
    return boxes, np.array([h, w], np.float32)


def write_split(root, name, n_images, rng, dirs, args, id_prefix):
    feats, boxes, whs, objs, ids = [], [], [], [], []
    caps = {"en": {}, "de": {}}
    for i in range(n_images):
        f, o, concepts = _image(rng, dirs, args.regions,
                                args.concepts_per_image, args.learnable,
                                signal=args.signal, sigma=args.sigma,
                                signed=args.signed)
        b, wh = _boxes(rng, args.regions)
        img_id = f"{id_prefix}{i}"
        feats.append(f); boxes.append(b); whs.append(wh)
        objs.append(o); ids.append(img_id)
        for lang in ("en", "de"):
            caps[lang][img_id] = _captions(
                rng, concepts, lang, args.learnable,
                deterministic=getattr(args, "det_captions", False))
    num_boxes = np.full((n_images,), args.regions, np.int32)
    write_feature_shard(
        os.path.join(root, f"{name}.h5"), np.stack(feats), np.stack(boxes),
        num_boxes, np.stack(whs), ids, objects=np.stack(objs))
    for lang in ("en", "de"):
        with open(os.path.join(root, f"{name}.{lang}.pkl"), "wb") as fh:
            pickle.dump(caps[lang], fh)
    return caps


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train-images", type=int, default=1000)
    p.add_argument("--test-images", type=int, default=150)
    p.add_argument("--regions", type=int, default=20)
    p.add_argument("--concepts-per-image", type=int, default=4)
    p.add_argument("--signal", type=float, default=3.0,
                   help="concept-direction magnitude in region features")
    p.add_argument("--sigma", type=float, default=0.05,
                   help="per-dim gaussian noise on region features")
    p.add_argument("--signed", action="store_true",
                   help="skip the abs(): near-orthogonal concept directions "
                        "(easier for from-scratch models)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--det-captions", action="store_true",
                   help="captions fully determined by the image (sorted "
                        "concept words, no fillers/shuffle): near-zero "
                        "irreducible caption CE, for decode-quality benches")
    p.add_argument("--pretrain-shards", type=int, default=0,
                   help="also write N google/ pretrain shards + train_order")
    p.add_argument("--shard-images", type=int, default=150)
    p.add_argument("--stream-sentences", type=int, default=6000)
    mode = p.add_mutually_exclusive_group()
    mode.add_argument("--learnable", dest="learnable", action="store_true",
                      default=True)
    mode.add_argument("--random", dest="learnable", action="store_false")
    args = p.parse_args(argv)
    if not 1 <= args.concepts_per_image <= len(CONCEPTS):
        p.error(f"--concepts-per-image must be in [1, {len(CONCEPTS)}] "
                "(the concept inventory size)")

    rng = np.random.RandomState(args.seed)
    dirs = _concept_directions(rng)
    coco = os.path.join(args.out, "coco")
    os.makedirs(coco, exist_ok=True)

    train_caps = write_split(coco, "train", args.train_images, rng, dirs,
                             args, "c")
    write_split(coco, "test", args.test_images, rng, dirs, args, "t")

    # text streams (for --mlm_steps) + vocab over everything we emit
    lines = {"en": [], "de": []}
    for lang in ("en", "de"):
        for cap_list in train_caps[lang].values():
            lines[lang].extend(cap_list)
        extra = args.stream_sentences - len(lines[lang])
        for _ in range(max(extra, 0)):
            lines[lang].append(" ".join(
                _captions(rng, (), lang, learnable=False, n=1)))
        with open(os.path.join(args.out, f"corpus.{lang}.txt"), "w") as fh:
            fh.write("\n".join(lines[lang]) + "\n")

    if args.pretrain_shards:
        google = os.path.join(args.out, "google")
        os.makedirs(google, exist_ok=True)
        for s in range(args.pretrain_shards):
            # emits train.<s>.h5 + train.<s>.{en,de}.pkl, the CC shard layout
            write_split(google, f"train.{s}", args.shard_images, rng,
                        dirs, args, f"g{s}_")
        order_dir = os.path.join(args.out, "order")
        os.makedirs(order_dir, exist_ok=True)
        order = [[int(x) for x in
                  np.random.RandomState(args.seed * 1000 + e)
                  .permutation(args.pretrain_shards)]
                 for e in range(50)]
        with open(os.path.join(order_dir, "google_train_order.json"), "w") as fh:
            json.dump(order, fh)

    from m3p_tpu.tokenization.unigram import train_unigram
    model = train_unigram((ln for lang in ("en", "de")
                           for ln in lines[lang]), vocab_size=400)
    model.save(os.path.join(args.out, "vocab.tsv"))
    print(f"corpus at {args.out}: {args.train_images} train / "
          f"{args.test_images} test images, learnable={args.learnable}, "
          f"vocab={len(model)}")


if __name__ == "__main__":
    main()
