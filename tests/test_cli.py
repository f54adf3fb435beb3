"""CLI surface: flag parsing parity, preprocess pipeline, loader wiring."""

import os
import pickle

import numpy as np
import pytest

from m3p_tpu.cli.preprocess import main as preprocess_main
from m3p_tpu.cli.train_x import args_to_config, get_parser
from m3p_tpu.data.loader import load_data


def test_parser_accepts_reference_recipe():
    """The README fine-tune recipe flags must parse (`README.md:158-216`)."""
    argv = [
        "--data_path", "/tmp/data", "--lgs", "en-de-fr-cs",
        "--emb_dim", "768", "--n_layers", "12", "--n_heads", "12",
        "--cross_rel_steps", "coco-img", "--batch_size", "24",
        "--accumulate_gradients", "4", "--max_len", "64",
        "--max_region_num", "100", "--fp16", "True", "--amp", "1",
        "--optimizer", "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005",
        "--epoch_size", "150000", "--max_epoch", "150",
        "--stopping_criterion", "valid_mean_recall,10",
        "--validation_metrics", "valid_mean_recall",
        "--sample_n", "4", "--refine_image", "True",
        "--local_rank", "0", "--master_port", "9999",
    ]
    args = get_parser().parse_args(argv)
    cfg = args_to_config(args)
    assert cfg.model.emb_dim == 768 and cfg.model.n_layers == 12
    assert cfg.model.dtype == "bfloat16"
    assert cfg.data.sample_n == 4
    assert cfg.lang2id == {"en": 0, "de": 1, "fr": 2, "cs": 3}
    assert cfg.model.n_langs == 5  # langs + image slot
    assert cfg.optim.accumulate_gradients == 4
    assert cfg.cross_rel_steps == "coco-img"


def test_preprocess_and_loader(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("\n".join(["the red cat runs fast",
                                 "a blue dog sleeps here"] * 30))
    vocab = str(tmp_path / "vocab.tsv")
    preprocess_main(["train-vocab", str(corpus), "--out", vocab,
                     "--size", "100"])
    assert os.path.exists(vocab)

    out_npy = str(tmp_path / "train.en.npy")
    preprocess_main(["binarize", str(corpus), "--vocab", vocab,
                     "--out", out_npy])
    stream = np.load(out_npy)
    assert stream.dtype == np.int32 and stream.size > 100
    assert (stream == 2).sum() == 60  # one EOS per sentence

    # loader: mono stream task end-to-end
    (tmp_path / "valid.en.npy").write_bytes(open(out_npy, "rb").read())
    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--mlm_steps", "en", "--bptt", "16"]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    assert ("mlm", "en") in data.train_datasets
    batch = next(data.train_datasets[("mlm", "en")].epoch_iterator(4))
    assert batch["tokens"].shape == (4, 16)
    assert "mlm_batches" in data.eval_data


def test_loader_retrieval(tmp_path):
    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram

    vocab = str(tmp_path / "vocab.tsv")
    train_unigram(["red cat dog runs blue"] * 20, vocab_size=60).save(vocab)

    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
    n, r = 6, 4
    write_feature_shard(
        str(root / "train.h5"),
        features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
        num_boxes=np.full(n, r, np.int64),
        wh=np.full((n, 2), 100, np.float32),
        image_ids=[f"i{k}" for k in range(n)],
        objects=rng.randint(0, 1600, (n, r)),
    )
    caps = {f"i{k}": ["red cat runs", "blue dog"] for k in range(n)}
    with open(root / "train.en.pkl", "wb") as f:
        pickle.dump(caps, f)
    with open(root / "test.en.pkl", "wb") as f:
        pickle.dump(caps, f)

    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--cross_rel_steps", "coco-img",
            "--max_region_num", str(r), "--sample_n", "2"]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    assert ("rel", "coco") in data.train_datasets
    assert "retrieval_test" in data.eval_data
    t2i, i2t = next(data.train_datasets[("rel", "coco")].epoch_iterator(2))
    assert t2i["tokens"].shape[0] == 4  # 2 groups x sample_n 2


def test_train_x_main_end_to_end(tmp_path):
    """Full CLI run: tiny model, retrieval fine-tune, 1 epoch + eval + resume."""
    from m3p_tpu.cli.train_x import main
    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram

    vocab = str(tmp_path / "vocab.tsv")
    train_unigram(["red cat dog runs blue tree house"] * 30,
                  vocab_size=80).save(vocab)
    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
    n, r = 6, 4
    write_feature_shard(
        str(root / "train.h5"),
        features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
        num_boxes=np.full(n, r, np.int64),
        wh=np.full((n, 2), 100, np.float32),
        image_ids=[f"i{k}" for k in range(n)],
        objects=rng.randint(0, 1600, (n, r)),
    )
    caps = {f"i{k}": ["red cat runs", "blue dog tree"] for k in range(n)}
    with open(root / "train.en.pkl", "wb") as f:
        pickle.dump(caps, f)
    with open(root / "test.en.pkl", "wb") as f:
        pickle.dump(caps, f)

    argv = [
        "--data_path", str(tmp_path), "--vocab_path", vocab, "--lgs", "en",
        "--cross_rel_steps", "coco-img", "--max_region_num", str(r),
        "--sample_n", "2", "--batch_size", "2", "--max_len", "12",
        "--emb_dim", "32", "--n_layers", "1", "--n_dec_layers", "1",
        "--n_heads", "2", "--refine_layers", "1", "--dropout", "0.0",
        "--attention_dropout", "0.0", "--fp16", "False",
        "--epoch_size", "4", "--max_epoch", "1",
        "--dump_path", str(tmp_path / "dump"), "--exp_name", "t",
        "--exp_id", "1",
    ]
    main(argv)
    dump = tmp_path / "dump" / "t" / "1"
    assert (dump / "checkpoint").exists()
    assert (dump / "params.json").exists()

    # eval-only resume path
    main(argv + ["--eval_only", "True"])


def test_train_x_main_sharded_mesh(tmp_path):
    """CLI on a multi-device backend: the train state shards over the mesh
    (DP+TP) and one epoch + eval runs (VERDICT item 10 / multi-host wiring;
    the 8 virtual CPU devices stand in for an 8-chip slice)."""
    from m3p_tpu.cli.train_x import main
    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram
    import pickle as pkl

    vocab = str(tmp_path / "vocab.tsv")
    train_unigram(["red cat dog runs blue tree house"] * 30,
                  vocab_size=80).save(vocab)
    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
    n, r = 8, 4
    write_feature_shard(
        str(root / "train.h5"),
        features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
        num_boxes=np.full(n, r, np.int64),
        wh=np.full((n, 2), 100, np.float32),
        image_ids=[f"i{k}" for k in range(n)],
        objects=rng.randint(0, 1600, (n, r)),
    )
    caps = {f"i{k}": ["red cat runs", "blue dog"] for k in range(n)}
    for split in ("train", "test"):
        with open(root / f"{split}.en.pkl", "wb") as f:
            pkl.dump(caps, f)

    main(["--data_path", str(tmp_path), "--vocab_path", vocab, "--lgs", "en",
          "--cross_rel_steps", "coco-img", "--max_region_num", str(r),
          "--sample_n", "2", "--batch_size", "4", "--max_len", "12",
          "--emb_dim", "32", "--n_layers", "1", "--n_dec_layers", "1",
          "--n_heads", "2", "--refine_layers", "1", "--dropout", "0",
          "--attention_dropout", "0", "--fp16", "False",
          "--mesh_data", "-1", "--mesh_tensor", "2",
          "--epoch_size", "8", "--max_epoch", "1",
          "--dump_path", str(tmp_path / "dump"), "--exp_name", "m",
          "--exp_id", "s"])
    log = (tmp_path / "dump" / "m" / "s" / "train.log").read_text()
    assert "device mesh" in log and "'tensor': 2" in log
    assert "__log__" in log


def test_tokens_per_batch_resolves_batch_size():
    """--tokens_per_batch/--max_batch_size resolve to a static batch size
    (the reference packs per-batch, `dataset_pretrain.py:863-890`; TPU
    shapes are fixed)."""
    argv = ["--data_path", "/tmp/x", "--lgs", "en", "--max_len", "32",
            "--tokens_per_batch", "256"]
    cfg = args_to_config(get_parser().parse_args(argv))
    assert cfg.data.batch_size == 8
    argv += ["--max_batch_size", "4"]
    cfg = args_to_config(get_parser().parse_args(argv))
    assert cfg.data.batch_size == 4


def _mini_corpus(tmp_path, with_train=True):
    from m3p_tpu.tokenization.unigram import train_unigram
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer

    vocab = str(tmp_path / "vocab.tsv")
    sents = ["red cat runs fast", "blue dog sleeps here"] * 20
    train_unigram(sents, vocab_size=80).save(vocab)
    tok = XLMRTokenizer(vocab)
    stream = np.concatenate(
        [np.array([0] + tok.encode(s) + [2], np.int32) for s in sents])
    if with_train:
        np.save(tmp_path / "train.en.npy", stream)
    np.save(tmp_path / "valid.en.npy", stream)
    return vocab


def test_debug_train_uses_valid_data(tmp_path):
    """--debug_train substitutes valid data for train (`loader.py:374-375`):
    the mlm task must build even when train.en.npy is absent."""
    vocab = _mini_corpus(tmp_path, with_train=False)
    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--mlm_steps", "en", "--bptt", "16",
            "--debug_train", "True"]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    assert ("mlm", "en") in data.train_datasets


def test_eval_n_caps_validation_batches(tmp_path):
    """--eval_n caps validation sentences (`xevaluator.py:485,1197`)."""
    vocab = _mini_corpus(tmp_path)
    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--mlm_steps", "en", "--bptt", "16",
            "--batch_size", "2", "--eval_n", "4"]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    assert len(data.eval_data["mlm_batches"]) == 2  # ceil(4 / bs 2)


def test_eval_images_caps_retrieval_grid(tmp_path):
    """--eval_images truncates the test retrieval grid
    (`dataset_finetune.py:961`)."""
    import pickle
    from m3p_tpu.data.features import write_feature_shard

    vocab = _mini_corpus(tmp_path)
    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
    n, r = 8, 4
    write_feature_shard(
        str(root / "train.h5"),
        features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
        num_boxes=np.full(n, r, np.int64),
        wh=np.full((n, 2), 100, np.float32),
        image_ids=[f"i{k}" for k in range(n)],
        objects=rng.randint(0, 1600, (n, r)),
    )
    caps = {f"i{k}": ["red cat runs", "blue dog"] for k in range(n)}
    for split in ("train", "test"):
        with open(root / f"{split}.en.pkl", "wb") as f:
            pickle.dump(caps, f)
    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--cross_rel_steps", "coco-img",
            "--max_region_num", str(r), "--sample_n", "2",
            "--eval_images", "3", "--seq_per_img", "2"]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    cap_tokens, cap_len, cap_to_img, img_feats, *_ = \
        data.eval_data["retrieval_test"]
    assert img_feats.shape[0] == 3           # images capped
    assert cap_tokens.shape[0] == 3 * 2      # seq_per_img captions each


def test_caption_train_langs_match_eval_decode_lang(tmp_path):
    """The caption TRAIN batches must carry the same lang ids the caption
    eval decodes with (`ic_step` trains the decoder WITH lang embeddings,
    `xtrainer.py:1464-1470`; `evaluate_image_caption` decodes with the
    language's id).  A mismatch decodes with an embedding the model never
    trained — regression for the empty-caption decode bug."""
    import pickle
    from m3p_tpu.data.features import write_feature_shard

    vocab = _mini_corpus(tmp_path)
    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
    n, r = 6, 4
    write_feature_shard(
        str(root / "train.h5"),
        features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
        num_boxes=np.full(n, r, np.int64),
        wh=np.full((n, 2), 100, np.float32),
        image_ids=[f"i{k}" for k in range(n)],
        objects=rng.randint(0, 1600, (n, r)),
    )
    caps = {f"i{k}": ["red cat runs", "blue dog"] for k in range(n)}
    for split in ("train", "test"):
        for lang in ("en", "de"):   # both requested langs have data
            with open(root / f"{split}.{lang}.pkl", "wb") as f:
                pickle.dump(caps, f)
    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "de-en", "--cross_modal_steps", "coco-img",
            "--is_generation", "True", "--max_region_num", str(r)]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    (key,) = [k for k in data.train_datasets
              if k[0] == "ic" and k[1].endswith("en")]
    b = next(data.train_datasets[key].epoch_iterator(batch_size=2))
    lang_id = cfg.lang2id["en"]
    assert "langs" in b and (b["langs"] == lang_id).all()
    assert data.eval_data["caption_gen.en"]["lang_id"] == lang_id
    # each language's train batches carry its OWN id
    (key_de,) = [k for k in data.train_datasets
                 if k[0] == "ic" and k[1].endswith("de")]
    b_de = next(data.train_datasets[key_de].epoch_iterator(batch_size=2))
    assert (b_de["langs"] == cfg.lang2id["de"]).all()
    assert data.eval_data["caption_gen.de"]["lang_id"] == cfg.lang2id["de"]


def test_use_noise_bart_transform():
    """--use_noise word-noises the BART source (`xtrainer.py:1617`)."""
    from m3p_tpu.data.loader import make_bart_transform

    rng = np.random.RandomState(0)
    tokens = np.tile(np.arange(4, 20, dtype=np.int32), (4, 1))
    lengths = np.full(4, 16, np.int32)
    batch = {"tokens": tokens, "lengths": lengths}
    plain = make_bart_transform(99)(np.random.RandomState(1), dict(batch), 0)
    noised = make_bart_transform(99, noise=(3.0, 0.2, 0.2))(
        np.random.RandomState(1), dict(batch), 0)
    assert {"src_tokens", "src_len", "tgt_tokens", "tgt_len"} <= set(plain)
    # the noised source differs from the plain infilled source
    a = plain["src_tokens"][:, :noised["src_tokens"].shape[1]]
    b = noised["src_tokens"][:, :a.shape[1]]
    assert a.shape[0] == b.shape[0] and not np.array_equal(a, b)


def test_coco_method_selects_caption_metrics():
    """--coco_method picks which caption metrics are reported
    (`xevaluator.py:1010`)."""
    from m3p_tpu.config import small_test_config
    from m3p_tpu.eval.evaluator import Evaluator

    cfg = small_test_config()
    import dataclasses
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval,
                                               coco_method="CIDEr"))
    ev = Evaluator(model=None, cfg=cfg)
    ev.generate_captions = lambda *a, **k: ["red cat", "blue dog"]
    scores = ev.evaluate_captioning(None, [], [["red cat"], ["a dog"]], None)
    assert set(scores) == {"caption_cider"}
    # the full COCOEvalCap method surface (`xevaluator.py:1005-1016`)
    cfg2 = cfg.replace(eval=dataclasses.replace(
        cfg.eval, coco_method="Bleu,METEOR,ROUGE_L,CIDEr"))
    ev2 = Evaluator(model=None, cfg=cfg2)
    ev2.generate_captions = lambda *a, **k: ["red cat", "blue dog"]
    scores = ev2.evaluate_captioning(None, [], [["red cat"], ["a dog"]],
                                     None)
    assert set(scores) == {"caption_bleu", "caption_cider",
                           "caption_meteor", "caption_rouge_l"}
    # unknown-only method lists fall back to the reference default (CIDEr,
    # `train_x.py:337`) instead of silently evaluating nothing
    cfg3 = cfg.replace(eval=dataclasses.replace(cfg.eval,
                                                coco_method="SPICE"))
    ev3 = Evaluator(model=None, cfg=cfg3)
    ev3.generate_captions = lambda *a, **k: ["red cat", "blue dog"]
    scores = ev3.evaluate_captioning(None, [], [["red cat"], ["a dog"]],
                                     None)
    assert set(scores) == {"caption_cider"}


def test_caption_eval_exports_hypotheses(tmp_path):
    """With --eval_path set, the decoded captions land as
    caption_translate.<lang>.json of {image_id, caption} dicts (the
    reference's caption export, `xevaluator.py:986-993`) — so an all-zero
    metric can be diagnosed from the artifact instead of a re-decode."""
    import dataclasses
    import json

    from m3p_tpu.config import small_test_config
    from m3p_tpu.eval.evaluator import Evaluator

    cfg = small_test_config()
    cfg = cfg.replace(eval=dataclasses.replace(
        cfg.eval, coco_method="CIDEr", eval_path=str(tmp_path / "artifacts")))
    ev = Evaluator(model=None, cfg=cfg)
    ev.generate_captions = lambda *a, **k: ["red cat", "der"]
    ev.evaluate_captioning(None, [], [["red cat"], ["a dog"]], None,
                           image_ids=["img0", "img1"], lang="en")
    out = json.load(open(tmp_path / "artifacts" / "caption_translate.en.json"))
    assert out == [{"image_id": "img0", "caption": "red cat"},
                   {"image_id": "img1", "caption": "der"}]
    # no eval_path -> no artifact, no error
    ev2 = Evaluator(model=None, cfg=small_test_config())
    ev2.generate_captions = lambda *a, **k: ["x"]
    ev2.evaluate_captioning(None, [], [["x"]], None, image_ids=["i"],
                            lang="de")


def test_save_every_epoch_pretrain_snapshots(tmp_path):
    """Pretrain runs save model_pretrain_<epoch> every --save_every_epoch
    epochs (`train_x.py:505-506`)."""
    import dataclasses
    import jax
    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.train.trainer import Trainer

    cfg = small_test_config().replace(
        dump_path=str(tmp_path), is_pretrain=True, save_every_epoch=2)
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    t = Trainer(cfg, model, params, datasets=None)
    t.end_epoch({})   # epoch 0: 0 % 2 == 0 -> snapshot
    t.end_epoch({})   # epoch 1: no snapshot
    import os
    assert os.path.isdir(tmp_path / "model_pretrain_0")
    assert not os.path.isdir(tmp_path / "model_pretrain_1")


def test_reference_uvl_captions_layout(tmp_path):
    """The reference caption layout — ONE pkl per (dataset, lang) under
    data_path/uvl_captions, split membership from the split h5s
    (`loader.py:275-281`) — loads as a fallback when per-split pkls are
    absent; captions restrict to each split store's images."""
    import pickle
    from m3p_tpu.data.features import write_feature_shard

    vocab = _mini_corpus(tmp_path)
    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
    r = 4

    def shard(path, ids):
        n = len(ids)
        write_feature_shard(
            str(path),
            features=rng.randn(n, r, 2048).astype(np.float32),
            boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
            num_boxes=np.full(n, r, np.int64),
            wh=np.full((n, 2), 100, np.float32),
            image_ids=ids,
            objects=rng.randint(0, 1600, (n, r)),
        )

    train_ids = [f"tr{k}" for k in range(8)]
    test_ids = [f"te{k}" for k in range(4)]
    shard(root / "train.h5", train_ids)
    shard(root / "test.h5", test_ids)
    uvl = tmp_path / "uvl_captions"
    uvl.mkdir()
    caps = {i: ["red cat runs", "blue dog"] for i in train_ids + test_ids}
    with open(uvl / "coco.en.pkl", "wb") as f:
        pickle.dump(caps, f)

    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--cross_rel_steps", "coco-img",
            "--max_region_num", str(r), "--sample_n", "2",
            "--seq_per_img", "2"]
    cfg = args_to_config(get_parser().parse_args(argv))
    data = load_data(cfg)
    ds = data.train_datasets[("rel", "coco")]
    assert set(ds.image_ids) == set(train_ids)
    cap_tokens, _, cap_to_img, img_feats, *_ = \
        data.eval_data["retrieval_test"]
    assert img_feats.shape[0] == len(test_ids)
    assert cap_tokens.shape[0] == len(test_ids) * 2


def test_full_reference_mscoco_recipe_parses():
    """Every flag of the reference README's fine-tune-MSCOCO command
    (`README.md:155-215`) parses and builds a config — verbatim drop-in
    compatibility (launcher flags excluded; they belong to
    torch.distributed.launch, not train_x)."""
    argv = [
        "--data_path", "/d", "--reload_model", "/m.pth",
        "--dump_path", "/out", "--exp_name", "e",
        "--batch_size", "24", "--emb_dim", "768", "--n_layers", "12",
        "--n_heads", "12", "--n_dec_layers", "-1", "--dropout", "0.1",
        "--attention_dropout", "0.1", "--gelu_activation", "True",
        "--optimizer", "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005",
        "--lgs", "en-de-fr", "--vocab_path", "/v",
        "--google_path", "google_captions/obj100",
        "--sbu_path", "google_captions/obj100",
        "--coco_path", "coco", "--flicker_path", "flicker",
        "--cross_rel_steps", "coco-img", "--mlm_steps", "",
        "--epoch_size", "150000", "--max_epoch", "150", "--bptt", "128",
        "--max_len", "64", "--fp16", "True",
        "--validation_metrics", "valid_I2T_acc,valid_T2I_acc",
        "--max_region_num", "100", "--accumulate_gradients", "4",
        "--amp", "1", "--refine_image", "False",
        "--refine_encoder", "False", "--input_fea_dir", "/fea",
        "--save_every_epoch", "5", "--is_generation", "False",
        "--is_understanding", "True", "--is_pretrain", "False",
        "--use_new_fea", "True", "--t2i_flag", "True", "--i2t_flag", "True",
        "--eval_n", "50", "--sent_ratio", "0.8", "--word_ratio", "0.8",
        "--seq_per_img", "5", "--eval_images", "-1", "--sample_n", "4",
        "--multi_cls_loss_weight", "0", "--bin_cls_loss_weight", "1",
        "--num_workers", "4", "--eval_path", "/ev",
        "--google_valid_path", "/cc", "--train_order_path", "/ord",
        "--cross_lingual_path", "/cl", "--ft_lgs", "en", "--src_lgs", "en",
        "--ag_lgs", "", "--eval_only", "False", "--is_freelb", "False",
    ]
    cfg = args_to_config(get_parser().parse_args(argv))
    assert cfg.multi_cls_loss_weight == 0.0
    assert cfg.bin_cls_loss_weight == 1.0
    assert cfg.eval.eval_n == 50 and cfg.eval.eval_images == -1
    assert cfg.save_every_epoch == 5 and cfg.src_lgs == "en"
    assert cfg.validation_metrics == "valid_I2T_acc,valid_T2I_acc"
    # the tracked metric names resolve against this framework's score keys
    from m3p_tpu.train.trainer import Trainer

    assert Trainer._resolve_metric("valid_I2T_acc", {"I2T_acc": 1.0}) \
        == "I2T_acc"


def test_loader_transforms_use_tokenizer_ids(tmp_path):
    """Noise transforms built in load_data must use the LOADED tokenizer's
    vocab/<mask> ids, not the model config's defaults — main() only rebuilds
    the model config after load_data, and a 250001 mask id in a small vocab
    fed out-of-range embedding lookups (NaN training)."""
    vocab = _mini_corpus(tmp_path)
    argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--mass_steps", "en", "--bptt", "12",
            "--batch_size", "2", "--eval_n", "4"]
    cfg = args_to_config(get_parser().parse_args(argv))
    assert cfg.model.n_words == 250002          # pre-replacement default
    data = load_data(cfg)
    vocab_size = data.tokenizer.vocab_size
    b = next(data.train_datasets[("mass", "en")].epoch_iterator(2))
    assert int(b["enc_tokens"].max()) < vocab_size
    for eb in data.eval_data["mass_batches"]:
        assert int(eb["enc_tokens"].max()) < vocab_size


def test_mild_end_to_end(tmp_path):
    """MILD query-based retrieval from the CLI: per-language h5 routing,
    qp_type text construction, R@k eval and the caption-eval variant
    (`MILD_finetune.py:33-975`)."""
    from m3p_tpu.cli.train_x import main
    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram

    vocab = str(tmp_path / "vocab.tsv")
    train_unigram(["red cat dog runs blue tree house query passage"] * 30,
                  vocab_size=90).save(vocab)
    rng = np.random.RandomState(0)
    root = tmp_path / "mild"
    root.mkdir()
    n, r = 6, 4
    for split in ("train", "test"):
        write_feature_shard(
            str(root / f"{split}.en.h5"),
            features=rng.randn(n, r, 2048).astype(np.float32),
            boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
            num_boxes=np.full(n, r, np.int64),
            wh=np.full((n, 2), 100, np.float32),
            image_ids=[f"{split}{k}" for k in range(n)],
            objects=rng.randint(0, 1600, (n, r)),
        )
        # (query, passage) tuples per image (MILD_finetune.py:110-113)
        queries = {f"{split}{k}": [("red cat query", "blue dog passage"),
                                   ("tree house query", "cat runs passage")]
                   for k in range(n)}
        with open(root / f"{split}.en.pkl", "wb") as f:
            pickle.dump(queries, f)
    # caption-eval variant references
    cap_refs = {f"test{k}": ["red cat runs", "blue dog tree"]
                for k in range(n)}
    with open(root / "test.caption.en.pkl", "wb") as f:
        pickle.dump(cap_refs, f)

    argv = [
        "--data_path", str(tmp_path), "--vocab_path", vocab, "--lgs", "en",
        "--is_mild", "True", "--cross_rel_steps", "mild-img",
        "--mild_path", str(root), "--qp_type", "qp",
        "--max_region_num", str(r),
        "--sample_n", "2", "--batch_size", "2", "--max_len", "16",
        "--emb_dim", "32", "--n_layers", "1", "--n_dec_layers", "1",
        "--n_heads", "2", "--refine_layers", "1", "--dropout", "0.0",
        "--attention_dropout", "0.0", "--fp16", "False",
        "--epoch_size", "4", "--max_epoch", "1", "--beam_size", "1",
        "--dump_path", str(tmp_path / "dump"), "--exp_name", "m",
        "--exp_id", "1",
    ]
    main(argv)
    dump = tmp_path / "dump" / "m" / "1"
    assert (dump / "checkpoint").exists()
    log = (dump / "train.log").read_text()
    assert "__log__" in log
    import json as _json
    scores = _json.loads(log.rsplit("__log__:", 1)[1].splitlines()[0]
                         .replace("'", '"'))
    # retrieval R@k from the qp grids + the MILD caption-eval variant
    assert any(k.endswith("i2t_r1") for k in scores), scores
    assert any("cider" in k for k in scores), scores
    for v in scores.values():
        assert np.isfinite(v), scores


def test_mild_eval_conventions(tmp_path):
    """MILD eval-grid semantics (`MILD_finetune.py:944-974`): the test grid
    is built at seq_per_img=1 — exactly ONE positive caption per image
    (`pos_cap_label[index*seq_per_img : +seq_per_img]` with seq_per_img=1) —
    regardless of the retrieval default (5); qp_type controls the SCORED
    text in both train and eval grids; and R@k over that 1-positive grid
    reduces exactly."""
    from m3p_tpu.data.datasets import MILDDataset
    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.eval.retrieval import recall_at_k
    from m3p_tpu.tokenization.unigram import train_unigram

    vocab = str(tmp_path / "vocab.tsv")
    train_unigram(["red cat dog runs blue tree house query passage"] * 30,
                  vocab_size=90).save(vocab)
    rng = np.random.RandomState(0)
    root = tmp_path / "mild"
    root.mkdir()
    n, r = 6, 4
    for split in ("train", "test"):
        write_feature_shard(
            str(root / f"{split}.en.h5"),
            features=rng.randn(n, r, 2048).astype(np.float32),
            boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
            num_boxes=np.full(n, r, np.int64),
            wh=np.full((n, 2), 100, np.float32),
            image_ids=[f"{split}{k}" for k in range(n)])
        queries = {f"{split}{k}": [("red cat query", "blue dog passage"),
                                   ("tree house query", "cat runs passage")]
                   for k in range(n)}
        with open(root / f"{split}.en.pkl", "wb") as f:
            pickle.dump(queries, f)

    def mild_cfg(qp_type):
        return args_to_config(get_parser().parse_args([
            "--data_path", str(tmp_path), "--vocab_path", vocab,
            "--lgs", "en", "--is_mild", "True",
            "--cross_rel_steps", "mild-img", "--mild_path", str(root),
            "--qp_type", qp_type, "--max_region_num", str(r),
            "--sample_n", "2", "--batch_size", "2", "--max_len", "24"]))

    data_q = load_data(mild_cfg("q"))
    data_qp = load_data(mild_cfg("qp"))

    # --- seq_per_img=1: one caption (positive) per image in the test grid,
    # even though the retrieval eval default is 5 captions/image
    assert mild_cfg("q").data.seq_per_img == 5     # the non-MILD default
    toks, lens, cap_to_img, feats, locs, img_len = \
        data_q.eval_data["retrieval_test"]
    assert toks.shape[0] == n                       # n_cap == n_img
    np.testing.assert_array_equal(cap_to_img, np.arange(n))
    assert feats.shape[0] == n

    # --- qp_type reaches the EVAL grid text too: 'qp' scores the query with
    # the passage concatenated, so its rows encode strictly longer text
    lens_qp = data_qp.eval_data["retrieval_test"][1]
    assert (lens_qp > lens).all(), (lens, lens_qp)

    # --- same for the TRAIN grids (already covered by routing tests; here
    # assert the q/qp text difference survives through the dataset)
    ds_q = data_q.train_datasets[("rel", "mild")]
    ds_qp = data_qp.train_datasets[("rel", "mild")]
    assert isinstance(ds_q, MILDDataset) and ds_q.qp_type == "q"
    assert ds_qp.qp_type == "qp"
    assert all("</s>" in c for caps in ds_qp.captions.values()
               for c in caps)
    assert not any("passage" in c for caps in ds_q.captions.values()
                   for c in caps)

    # --- R@k at the 1-positive-per-image shape reduces exactly: diagonal
    # scores -> perfect; then knock image 0's positive to the bottom
    eye = np.eye(n)
    perfect = recall_at_k(eye, np.arange(n))
    assert perfect["i2t_r1"] == 100.0 and perfect["t2i_r1"] == 100.0
    scores2 = eye.copy()
    scores2[0, 0] = -1.0                 # caption 0 now ranks last for img 0
    hit1 = recall_at_k(scores2, np.arange(n))
    assert hit1["i2t_r1"] == pytest.approx(100.0 * (n - 1) / n)
    assert hit1["t2i_r1"] == pytest.approx(100.0 * (n - 1) / n)
    assert hit1["i2t_r10"] == 100.0      # n=6 <= 10: always recovered


class TestMissingDataFailsFast:
    """Missing data for a REQUESTED task errors at load time (reference
    `check_data_params` asserts, `loader.py:25-153`); --allow_missing_data
    is the warn-and-skip escape hatch (VERDICT r3 item 3)."""

    def _vocab(self, tmp_path):
        from m3p_tpu.tokenization.unigram import train_unigram

        vocab = str(tmp_path / "vocab.tsv")
        train_unigram(["red cat dog runs blue"] * 20, vocab_size=60
                      ).save(vocab)
        return vocab

    def test_typod_coco_path_errors_with_path(self, tmp_path):
        vocab = self._vocab(tmp_path)
        argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
                "--lgs", "en", "--cross_rel_steps", "coco-img",
                "--coco_path", str(tmp_path / "cocoo")]  # typo'd
        cfg = args_to_config(get_parser().parse_args(argv))
        with pytest.raises(FileNotFoundError, match="cocoo"):
            load_data(cfg, dataset_paths={"coco": str(tmp_path / "cocoo")})

    def test_missing_mlm_stream_errors(self, tmp_path):
        vocab = self._vocab(tmp_path)
        argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
                "--lgs", "en", "--mlm_steps", "en"]
        cfg = args_to_config(get_parser().parse_args(argv))
        with pytest.raises(FileNotFoundError, match="train.en.npy"):
            load_data(cfg)

    def test_allow_missing_data_skips_with_warning(self, tmp_path):
        vocab = self._vocab(tmp_path)
        argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
                "--lgs", "en", "--mlm_steps", "en",
                "--allow_missing_data", "True"]
        cfg = args_to_config(get_parser().parse_args(argv))
        import logging

        # handler attached directly (initialize_exp in earlier tests may
        # have set propagate=False, hiding records from caplog)
        records = []
        handler = logging.Handler()
        handler.emit = records.append
        lg = logging.getLogger("m3p_tpu")
        lg.addHandler(handler)
        try:
            data = load_data(cfg)
        finally:
            lg.removeHandler(handler)
        assert ("mlm", "en") not in data.train_datasets
        assert any("train.en.npy" in r.getMessage() for r in records)

    def _pretrain_shard_root(self, tmp_path, name):
        import pickle
        from m3p_tpu.data.features import write_feature_shard

        root = tmp_path / name
        root.mkdir()
        r = 4
        rng = np.random.RandomState(0)
        ids = [f"im{k}" for k in range(6)]
        write_feature_shard(
            str(root / "train.0.h5"),
            features=rng.randn(6, r, 2048).astype(np.float32),
            boxes=np.abs(rng.rand(6, r, 4)).astype(np.float32) * 50,
            num_boxes=np.full(6, r, np.int64),
            wh=np.full((6, 2), 100, np.float32),
            image_ids=ids,
            objects=rng.randint(0, 1600, (6, r)),
        )
        with open(root / "train.0.en.pkl", "wb") as f:
            pickle.dump({i: ["red cat runs"] for i in ids}, f)
        return root, r

    def test_missing_train_order_schedule_bearing_raises(self, tmp_path):
        """google/sbu are SCHEDULE-BEARING: the reference opens
        {google,sbu}_train_order.json unconditionally and hard-fails when
        missing (`dataset_pretrain.py:91-96`) — a typo'd --train_order_path
        must not silently change shard order.  --allow_missing_data
        restores warn-and-load-unscheduled."""
        vocab = self._vocab(tmp_path)
        root, r = self._pretrain_shard_root(tmp_path, "google")
        orders = tmp_path / "orders"
        orders.mkdir()                       # exists, but no schedule file
        argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
                "--lgs", "en", "--is_pretrain", "True",
                "--cross_rel_steps", "google-img",
                "--google_path", str(root),
                "--train_order_path", str(orders),
                "--max_region_num", str(r), "--sample_n", "2"]
        cfg = args_to_config(get_parser().parse_args(argv))
        with pytest.raises(FileNotFoundError,
                           match="google_train_order.json"):
            load_data(cfg, dataset_paths={"google": str(root)})
        # deliberate override: loads unscheduled with a warning
        cfg2 = args_to_config(get_parser().parse_args(
            argv + ["--allow_missing_data", "True"]))
        data = load_data(cfg2, dataset_paths={"google": str(root)})
        assert any(k[0] == "rel" for k in data.train_datasets)

    def test_missing_train_order_other_dataset_warns(self, tmp_path):
        """For datasets the reference ships NO schedule for, a missing
        train-order file under --train_order_path warns and loads
        unscheduled (they legitimately have none)."""
        import logging

        vocab = self._vocab(tmp_path)
        root, r = self._pretrain_shard_root(tmp_path, "mydata")
        orders = tmp_path / "orders"
        orders.mkdir()
        argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
                "--lgs", "en", "--is_pretrain", "True",
                "--cross_rel_steps", "mydata-img",
                "--train_order_path", str(orders),
                "--max_region_num", str(r), "--sample_n", "2"]
        cfg = args_to_config(get_parser().parse_args(argv))
        records = []
        handler = logging.Handler()
        handler.emit = records.append
        lg = logging.getLogger("m3p_tpu")
        lg.addHandler(handler)
        try:
            data = load_data(cfg, dataset_paths={"mydata": str(root)})
        finally:
            lg.removeHandler(handler)
        assert any(k[0] == "rel" for k in data.train_datasets)
        assert any("train-order" in rec.getMessage() for rec in records)

    def test_two_task_run_with_one_typo_errors(self, tmp_path):
        """A two-task recipe with one typo'd path must NOT silently train
        half the recipe."""
        import numpy as np

        vocab = self._vocab(tmp_path)
        np.save(tmp_path / "train.en.npy",
                np.random.RandomState(0).randint(3, 50, 4000, np.int32))
        np.save(tmp_path / "valid.en.npy",
                np.random.RandomState(1).randint(3, 50, 400, np.int32))
        argv = ["--data_path", str(tmp_path), "--vocab_path", vocab,
                "--lgs", "en", "--mlm_steps", "en",
                "--cross_rel_steps", "coco-img"]
        cfg = args_to_config(get_parser().parse_args(argv))
        with pytest.raises(FileNotFoundError, match="coco"):
            load_data(cfg)

    def test_missing_vocab_errors(self, tmp_path):
        argv = ["--data_path", str(tmp_path),
                "--vocab_path", str(tmp_path / "nope.tsv"),
                "--lgs", "en", "--mlm_steps", "en"]
        cfg = args_to_config(get_parser().parse_args(argv))
        with pytest.raises(FileNotFoundError, match="nope.tsv"):
            load_data(cfg)
