"""MASS/BART span masking, Poisson region noise, freeLB adversarial step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import PAD_IDX, small_test_config
from m3p_tpu.data.span_masking import bart_infill, mass_mask, poisson_region_noise
from m3p_tpu.data import synthetic
from m3p_tpu.model import build_model
from m3p_tpu.train.freelb import FreeLBConfig, make_freelb_itm_step
from m3p_tpu.train.optim import build_optimizer
from m3p_tpu.train.state import create_train_state
from m3p_tpu.train import steps as S


@pytest.fixture(scope="module")
def setup():
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    return cfg, model, params


def _tokens(rng, b, s, n_words):
    toks = rng.randint(4, n_words, (b, s)).astype(np.int64)
    toks[:, 0] = 0
    lengths = rng.randint(s - 3, s + 1, b)
    for i, l in enumerate(lengths):
        toks[i, l - 1] = 2
        toks[i, l:] = PAD_IDX
    return toks, lengths


def test_mass_mask_structure():
    rng = np.random.RandomState(0)
    toks, lens = _tokens(rng, 4, 16, 500)
    out = mass_mask(rng, toks, lens, word_mass=0.5, mask_index=511,
                    n_words=512)
    m = out["targets"].shape[1]
    assert m == round(lens.min() * 0.5)
    # decoder inputs are the tokens preceding each masked position
    for i in range(4):
        for j in range(m):
            pos = out["dec_pos"][i, j]
            assert toks[i, pos] == out["dec_tokens"][i, j]
            assert toks[i, pos + 1] == out["targets"][i, j]
    # encoder inputs differ from originals at the masked span
    assert (out["enc_tokens"] != toks.astype(np.int32)).sum() > 0


def test_bart_infill_structure():
    rng = np.random.RandomState(1)
    toks, lens = _tokens(rng, 4, 16, 500)
    out = bart_infill(rng, toks, lens, mask_index=511)
    # source is shorter (span collapsed to one mask token)
    assert (out["src_len"] <= lens).all()
    assert (out["src_tokens"] == 511).sum() == 4  # one mask per row
    np.testing.assert_array_equal(out["tgt_tokens"], toks)


def test_poisson_region_noise():
    rng = np.random.RandomState(2)
    feats = rng.randn(4, 8, 2048).astype(np.float32)
    noised = poisson_region_noise(rng, feats, np.full(4, 8))
    zero_rows = (np.abs(noised).sum(-1) == 0).sum()
    assert zero_rows >= 4  # at least one zeroed region per image


def test_mass_loss_runs(setup):
    cfg, model, params = setup
    rng = np.random.RandomState(3)
    toks, lens = _tokens(rng, 4, 16, cfg.model.n_words)
    batch = mass_mask(rng, toks, lens, 0.5, cfg.model.mask_index,
                      cfg.model.n_words)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, m = S.mass_loss(model, params, batch, jax.random.PRNGKey(0),
                          deterministic=True)
    assert np.isfinite(float(loss))


def test_freelb_itm_step(setup):
    cfg, model, params = setup
    tx, _ = build_optimizer("adam,lr=0.001")
    state = create_train_state(jax.tree.map(jnp.array, params), tx)
    rng = np.random.RandomState(4)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_retrieval_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len, cfg.data.max_region_num,
        cfg.model.n_words).items()}
    step = make_freelb_itm_step(model, cfg.data.sample_n,
                                FreeLBConfig(adv_steps=2), donate=False)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_freelb_pretrain_step(setup):
    """PGD around the full MCT multitask loss (`freelb_pretrain_under_step`,
    `xtrainer.py:2404-2594`)."""
    from m3p_tpu.data.masking import MaskingConfig
    from m3p_tpu.train.freelb import make_freelb_pretrain_step

    cfg, model, params = setup
    tx, _ = build_optimizer("adam,lr=0.001")
    state = create_train_state(jax.tree.map(jnp.array, params), tx)
    rng = np.random.RandomState(5)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_pretrain_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len, cfg.data.max_region_num,
        cfg.model.n_words).items()}
    mask_cfg = MaskingConfig(max_pred=4, n_words=cfg.model.n_words,
                             mask_index=cfg.model.mask_index)
    step = make_freelb_pretrain_step(model, cfg.data.sample_n, mask_cfg,
                                     FreeLBConfig(adv_steps=2), donate=False)
    losses = []
    # fixed PRNG -> fixed masking; otherwise per-step mask resampling noise
    # swamps 4 optimizer steps
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(0),
                              lambda_rel=1.0, lambda_mlm=1.0)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_freelb_ic_step(setup):
    """PGD around the captioning CE (`free_lb_ic_step`,
    `xtrainer.py:2853-2962`)."""
    from m3p_tpu.train.freelb import make_freelb_ic_step

    cfg, model, params = setup
    tx, _ = build_optimizer("adam,lr=0.001")
    state = create_train_state(jax.tree.map(jnp.array, params), tx)
    rng = np.random.RandomState(6)
    batch = {k: jnp.asarray(v) for k, v in synthetic.make_caption_batch(
        rng, 4, cfg.data.max_len, cfg.data.max_region_num,
        cfg.model.n_words).items()}
    step = make_freelb_ic_step(model, FreeLBConfig(adv_steps=2),
                               donate=False)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_trainer_freelb_runs_plain_plus_adversarial(setup):
    """is_freelb runs the plain step AND the adversarial one per batch
    (`train_x.py:454-456`, `xtrainer.py:1870-1876`)."""
    from m3p_tpu.train.trainer import Trainer
    from m3p_tpu.data.datasets import RetrievalDataset

    cfg, model, params = setup
    cfg2 = cfg.replace(is_freelb=True, adv_steps=2, cross_rel_steps="x-img")

    class FakeDS:
        def __len__(self):
            return 8

        def epoch_iterator(self, bs, epoch=0):
            rng = np.random.RandomState(epoch)
            for _ in range(4):
                yield {k: v for k, v in synthetic.make_retrieval_batch(
                    rng, bs, cfg.data.sample_n, cfg.data.max_len,
                    cfg.data.max_region_num, cfg.model.n_words).items()}

    trainer = Trainer(cfg2, model, jax.tree.map(jnp.array, params),
                      {("rel", "x"): FakeDS()})
    trainer.step_once("rel", ("rel", "x"))
    step0 = int(trainer.state.step)
    assert step0 == 2  # one plain + one adversarial optimizer update
