"""Full-pipeline smoke test: synthetic corpus -> tokenizer -> h5 features ->
datasets -> Trainer multitask loop -> checkpoint resume -> Evaluator
run_all_evals (retrieval grid + captions + BLEU/CIDEr)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import small_test_config
from m3p_tpu.data.datasets import (
    CaptionDataset, ParallelDataset, RetrievalDataset,
    build_eval_retrieval_arrays)
from m3p_tpu.data.features import RegionFeatureStore, write_feature_shard
from m3p_tpu.eval.evaluator import Evaluator
from m3p_tpu.model import build_model
from m3p_tpu.tokenization.tokenizer import XLMRTokenizer
from m3p_tpu.tokenization.unigram import train_unigram
from m3p_tpu.train.trainer import Trainer

WORDS = ["red", "cat", "dog", "tree", "house", "runs", "blue", "small",
         "green", "bird"]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(0)

    corpus = [" ".join(rng.choice(WORDS, 6)) for _ in range(80)]
    tok_path = str(tmp / "model.tsv")
    train_unigram(corpus, vocab_size=150).save(tok_path)
    tokenizer = XLMRTokenizer(tok_path)

    n, r = 16, 8
    h5_path = str(tmp / "feats.h5")
    write_feature_shard(
        h5_path,
        features=rng.randn(n, r, 2048).astype(np.float32),
        boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 100,
        num_boxes=np.full(n, r, np.int64),
        wh=np.full((n, 2), 224, np.float32),
        image_ids=[f"img{i}" for i in range(n)],
        objects=rng.randint(0, 1600, (n, r)),
    )
    store = RegionFeatureStore(h5_path, max_region_num=r)
    captions = {img_id: [" ".join(rng.choice(WORDS, 5)) for _ in range(3)]
                for img_id in store.image_ids}

    cfg = small_test_config()
    # the tokenizer's vocab drives the model vocab
    model_cfg = dataclasses.replace(
        cfg.model, n_words=tokenizer.vocab_size,
        mask_index=tokenizer.mask_token_id, max_region_num=r)
    cfg = cfg.replace(
        model=model_cfg,
        cross_rel_steps="coco-img",
        cross_ic_steps="coco-img",
        epoch_size=8,
        dump_path=str(tmp / "dump"),
    )
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=2,
                                               sample_n=2, max_len=16))
    os.makedirs(cfg.dump_path, exist_ok=True)
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    return cfg, model, params, tokenizer, store, captions


def test_trainer_multitask_loop_and_resume(world):
    cfg, model, params, tokenizer, store, captions = world
    datasets = {
        ("rel", "coco"): RetrievalDataset(
            captions, store, tokenizer, sample_n=cfg.data.sample_n,
            max_len=cfg.data.max_len),
        ("ic", "coco"): CaptionDataset(captions, store, tokenizer,
                                       max_len=cfg.data.max_len),
    }
    # donate=True consumes the state buffers — give the trainer its own copy
    trainer = Trainer(cfg, model, jax.tree.map(jnp.array, params), datasets)
    tasks = trainer.active_tasks()
    kinds = {k for k, _ in tasks}
    assert kinds == {"rel", "ic"}

    trainer.train_epoch()
    assert trainer.n_total_iter > 0
    stats = trainer.stats.flush()

    trainer.end_epoch({})
    # resume into a fresh trainer
    trainer2 = Trainer(cfg, model, params, datasets)
    assert trainer2.reload_checkpoint()
    assert trainer2.epoch == trainer.epoch
    assert int(trainer2.state.step) == int(trainer.state.step)


def test_run_all_evals(world):
    cfg, model, params, tokenizer, store, captions = world
    ev = Evaluator(model, cfg)

    ret = RetrievalDataset(captions, store, tokenizer,
                           sample_n=cfg.data.sample_n,
                           max_len=cfg.data.max_len)
    valid_batches = [next(iter(b)) if False else b
                     for b, _ in [next(ret.epoch_iterator(2, 0))]]
    cap = CaptionDataset(captions, store, tokenizer, max_len=cfg.data.max_len)
    cap_batches = [next(cap.epoch_iterator(4, 0))]
    par = ParallelDataset([" ".join(["red", "cat"])] * 8,
                          ["blue dog runs"] * 8, tokenizer, max_len=12)
    mt_batches = [next(par.epoch_iterator(4, 0))]

    grid = build_eval_retrieval_arrays(captions, store, tokenizer,
                                       max_len=cfg.data.max_len,
                                       caps_per_image=2)
    cap_tokens, cap_len, cap_to_img, feats, locs, img_len = grid

    gen_batches = cap_batches
    references = [[captions[i][0]] for i in store.image_ids[:4]]

    scores = ev.run_all_evals(params, {
        "retrieval_valid_batches": valid_batches,
        "mt_batches": mt_batches,
        "caption_batches": cap_batches,
        "retrieval_test": (cap_tokens, cap_len, cap_to_img, feats, locs,
                           img_len, 16),
        "caption_gen": {"batches": gen_batches, "references": references,
                        "tokenizer": tokenizer, "lang_id": 0},
    })
    for key in ["retrieval_acc", "mt_ppl", "mt_acc", "ic_ppl", "i2t_r1",
                "t2i_r1", "mean_recall", "caption_bleu", "caption_cider"]:
        assert key in scores, key
        assert np.isfinite(scores[key]), (key, scores[key])
    assert 0 <= scores["mean_recall"] <= 100


def test_trainer_task_sampling(world):
    """lg_sampling_factor weights task order by corpus size."""
    cfg, model, params, tokenizer, store, captions = world
    from m3p_tpu.data.datasets import CaptionDataset, RetrievalDataset

    cfg2 = cfg.replace(lg_sampling_factor=0.5)
    datasets = {
        ("rel", "coco"): RetrievalDataset(
            captions, store, tokenizer, sample_n=cfg.data.sample_n,
            max_len=cfg.data.max_len),
        ("ic", "coco"): CaptionDataset(captions, store, tokenizer,
                                       max_len=cfg.data.max_len),
    }
    trainer = Trainer(cfg2, model, jax.tree.map(jnp.array, params), datasets)
    tasks = trainer.active_tasks()
    probs = trainer.task_sampling_probs(tasks)
    assert probs is not None and abs(sum(probs.values()) - 1.0) < 1e-9
    # CaptionDataset has 3x the items (3 captions/image) -> higher prob
    sizes = {i: len(datasets[key]) for i, (_, key) in enumerate(tasks)}
    big = max(sizes, key=sizes.get)
    assert probs[big] == max(probs.values())


def test_run_all_evals_int8_generation(world):
    """--eval_quant int8: generation evals decode through the frozen-weight
    int8 model (capture_q8) while loss/grid evals keep the exact path."""
    import dataclasses

    cfg, model, params, tokenizer, store, captions = world
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, quant="int8"))
    ev = Evaluator(model, cfg)
    assert ev.gen_model is not ev.model

    cap = CaptionDataset(captions, store, tokenizer, max_len=cfg.data.max_len)
    cap_batches = [next(cap.epoch_iterator(4, 0))]
    references = [[captions[i][0]] for i in store.image_ids[:4]]
    scores = ev.run_all_evals(params, {
        "caption_gen": {"batches": cap_batches, "references": references,
                        "tokenizer": tokenizer, "lang_id": 0},
    })
    assert np.isfinite(scores["caption_bleu"])
    assert np.isfinite(scores["caption_cider"])
    # q8 tables captured once and cached
    assert ev._q8_cache[1] is not None
