"""Composed parallelism: seq/pp mesh axes drive real training from the CLI
and compose with data/tensor sharding in one step (round-2 VERDICT item 3 —
the SURVEY §2.3 "one mechanism — mesh + named sharding" promise).

The heavyweight loss-parity checks for the composed meshes live in
``__graft_entry__.dryrun_multichip`` (driver-run every round); here we cover
what the dryrun doesn't: CLI reachability (--mesh_seq / --pp_stages) and SP
on a TEXT objective (the dryrun composes the multimodal MCT step).
"""

import dataclasses
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _finetune_fixture(tmp_path, n=8, r=4):
    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram

    vocab = str(tmp_path / "vocab.tsv")
    train_unigram(["red cat dog runs blue tree house"] * 30,
                  vocab_size=80).save(vocab)
    rng = np.random.RandomState(0)
    root = tmp_path / "coco"
    root.mkdir()
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
    for split in ("train", "test"):
        with open(root / f"{split}.en.pkl", "wb") as f:
            pickle.dump(caps, f)
    # mono stream for the mlm objective
    from m3p_tpu.tokenization.tokenizer import XLMRTokenizer

    tok = XLMRTokenizer(vocab)
    stream = np.concatenate(
        [np.array([0] + tok.encode("red cat dog runs blue") + [2], np.int32)
         for _ in range(40)])
    np.save(tmp_path / "train.en.npy", stream)
    np.save(tmp_path / "valid.en.npy", stream[:200])
    return vocab, r


def test_cli_finetune_with_mesh_seq2(tmp_path):
    """A CLI fine-tune (rel + mlm) runs with --mesh_seq 2 on the 8 virtual
    devices: every objective's encoder is sequence-parallel (ring attention)
    while the batch shards over data=4."""
    from m3p_tpu.cli.train_x import main

    vocab, r = _finetune_fixture(tmp_path)
    argv = [
        "--data_path", str(tmp_path), "--vocab_path", vocab, "--lgs", "en",
        "--cross_rel_steps", "coco-img", "--mlm_steps", "en",
        "--max_region_num", str(r), "--sample_n", "2", "--batch_size", "4",
        "--max_len", "12", "--bptt", "12",
        "--emb_dim", "32", "--n_layers", "1", "--n_dec_layers", "1",
        "--n_heads", "2", "--refine_layers", "1", "--dropout", "0.0",
        "--attention_dropout", "0.0", "--fp16", "False",
        "--epoch_size", "8", "--max_epoch", "1", "--mesh_seq", "2",
        "--dump_path", str(tmp_path / "dump"), "--exp_name", "sp",
        "--exp_id", "1",
    ]
    main(argv)
    log = (tmp_path / "dump" / "sp" / "1" / "train.log").read_text()
    assert "sequence parallelism ON: seq=2" in log
    assert "__log__" in log


def test_cli_finetune_with_pp_stages2(tmp_path):
    """--pp_stages 2 pipelines the encoder stack from the CLI (pp=2 x
    data=4 mesh)."""
    from m3p_tpu.cli.train_x import main

    vocab, r = _finetune_fixture(tmp_path)
    argv = [
        "--data_path", str(tmp_path), "--vocab_path", vocab, "--lgs", "en",
        "--cross_rel_steps", "coco-img",
        "--max_region_num", str(r), "--sample_n", "2", "--batch_size", "4",
        "--max_len", "12",
        "--emb_dim", "32", "--n_layers", "2", "--n_dec_layers", "2",
        "--n_heads", "2", "--refine_layers", "1", "--dropout", "0.0",
        "--attention_dropout", "0.0", "--fp16", "False",
        "--epoch_size", "8", "--max_epoch", "1", "--pp_stages", "2",
        "--pp_microbatches", "2",
        "--dump_path", str(tmp_path / "dump"), "--exp_name", "pp",
        "--exp_id", "1",
    ]
    main(argv)
    log = (tmp_path / "dump" / "pp" / "1" / "train.log").read_text()
    assert "pipeline parallelism ON: pp=2" in log
    assert "__log__" in log


def test_sp_model_text_objective_parity(eight_devices):
    """SPModel matches the plain model on a TEXT objective (mlm, encoder
    sequence-sharded over seq=2 composed with data=2 x tensor=2) — the
    adapter covers encode_text, not just the joint stream."""
    from m3p_tpu.config import MeshConfig, small_test_config
    from m3p_tpu.data.masking import MaskingConfig
    from m3p_tpu.model import build_model
    from m3p_tpu.parallel.mesh import make_mesh
    from m3p_tpu.parallel.sp import SPModel
    from m3p_tpu.train import steps as S

    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=2, seq=2),
                     eight_devices)
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    sp_model = SPModel(model, mesh)
    mask_cfg = MaskingConfig(max_pred=4, n_words=cfg.model.n_words,
                             mask_index=cfg.model.mask_index)
    rng = np.random.RandomState(0)
    batch = {
        "tokens": jnp.asarray(rng.randint(4, cfg.model.n_words, (4, 16)),
                              jnp.int32),
        "lengths": jnp.asarray([16, 12, 16, 9], jnp.int32),
    }
    key = jax.random.PRNGKey(5)
    sp_fn = jax.jit(lambda p, b: S.mlm_loss(sp_model, p, b, key, mask_cfg,
                                            deterministic=True)[0])
    ref_fn = jax.jit(lambda p, b: S.mlm_loss(model, p, b, key, mask_cfg,
                                             deterministic=True)[0])
    np.testing.assert_allclose(float(sp_fn(params, batch)),
                               float(ref_fn(params, batch)), atol=2e-5)

    # seq-length padding path: S=15 is not divisible by seq=2
    batch15 = {"tokens": batch["tokens"][:, :15],
               "lengths": jnp.minimum(batch["lengths"], 15)}
    np.testing.assert_allclose(float(sp_fn(params, batch15)),
                               float(ref_fn(params, batch15)), atol=2e-5)
