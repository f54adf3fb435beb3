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
