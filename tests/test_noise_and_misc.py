"""Word noise, concat_batches, TIFG/PC objectives, misc model surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import BOS_IDX, EOS_IDX, PAD_IDX, small_test_config
from m3p_tpu.data.noise import (add_noise, concat_batches, word_blank,
                                word_dropout, word_shuffle)
from m3p_tpu.data import synthetic
from m3p_tpu.model import build_model
from m3p_tpu.model.misc import CrossAlignMatrix, LatentDecoder, VaeEncoder
from m3p_tpu.train import steps as S


def _toks(rng, b, s, n_words=500):
    toks = rng.randint(4, n_words, (b, s)).astype(np.int32)
    lengths = rng.randint(5, s + 1, b).astype(np.int32)
    toks[:, 0] = BOS_IDX
    for i, l in enumerate(lengths):
        toks[i, l - 1] = EOS_IDX
        toks[i, l:] = PAD_IDX
    return toks, lengths


def test_word_shuffle_local_and_bos_fixed():
    rng = np.random.RandomState(0)
    toks, lens = _toks(rng, 8, 20)
    out = word_shuffle(rng, toks, lens, k=3.0)
    assert (out[:, 0] == BOS_IDX).all()
    for i in range(8):
        li = lens[i]
        assert out[i, li - 1] == EOS_IDX
        # same multiset of interior words
        assert sorted(out[i, 1:li - 1]) == sorted(toks[i, 1:li - 1])
    assert (out != toks).any()


def test_word_dropout_and_blank():
    rng = np.random.RandomState(1)
    toks, lens = _toks(rng, 8, 20)
    out, new_lens = word_dropout(rng, toks, lens, 0.3)
    assert (new_lens <= lens).all() and (new_lens >= 3).all()
    assert (out[:, 0] == BOS_IDX).all()
    blanked = word_blank(rng, toks, lens, 0.5, mask_index=499)
    assert (blanked == 499).sum() > 0
    assert (blanked[:, 0] == BOS_IDX).all()
    noised, nl = add_noise(rng, toks, lens, 3.0, 0.1, 0.1, mask_index=499)
    assert noised.shape[0] == 8


def test_concat_batches():
    rng = np.random.RandomState(2)
    x1, l1 = _toks(rng, 4, 10)
    x2, l2 = _toks(rng, 4, 8)
    toks, lens, pos, langs = concat_batches(x1, l1, 0, x2, l2, 1)
    assert (lens == l1 + l2 - 1).all()
    i = 0
    assert toks[i, 0] == BOS_IDX
    assert toks[i, l1[i] - 1] == EOS_IDX        # end of first sentence
    assert toks[i, lens[i] - 1] == EOS_IDX      # end of pair
    assert (langs[i, :l1[i]] == 0).all()
    assert (langs[i, l1[i]:lens[i]] == 1).all()
    assert pos[i, lens[i] - 1] == lens[i] - 1   # continuous positions


@pytest.fixture(scope="module")
def model_setup():
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    return cfg, model, params


def test_tifg_loss(model_setup):
    cfg, model, params = model_setup
    rng = np.random.RandomState(3)
    cap = synthetic.make_caption_batch(rng, 4, cfg.data.max_len,
                                       cfg.data.max_region_num,
                                       cfg.model.n_words)
    batch = {"tokens": jnp.asarray(cap["tokens"]),
             "text_len": jnp.asarray(cap["tgt_len"]),
             "feats": jnp.asarray(cap["feats"]),
             "locs": jnp.asarray(cap["locs"]),
             "img_len": jnp.asarray(cap["img_len"])}
    loss, m = S.tifg_loss(model, params, batch, jax.random.PRNGKey(0),
                          deterministic=True)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_pc_loss(model_setup):
    cfg, model, params = model_setup
    rng = np.random.RandomState(4)
    x1, l1 = _toks(rng, 4, 10, cfg.model.n_words)
    x2, l2 = _toks(rng, 4, 10, cfg.model.n_words)
    toks, lens, pos, langs = concat_batches(x1, l1, 0, x2, l2, 1)
    batch = {"tokens": jnp.asarray(toks), "lengths": jnp.asarray(lens),
             "positions": jnp.asarray(pos), "langs": jnp.asarray(langs),
             "labels": jnp.asarray(rng.randint(0, 2, 4))}
    loss, m = S.pc_loss(model, params, batch, jax.random.PRNGKey(0),
                        deterministic=True)
    assert np.isfinite(float(loss))


def test_misc_modules():
    rng = np.random.RandomState(5)
    d = 16
    c = jnp.asarray(rng.randn(2, 6, d), jnp.float32)
    q = jnp.asarray(rng.randn(2, 4, d), jnp.float32)
    q_mask = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 1, 1]]) > 0)
    m = CrossAlignMatrix(dim=d)
    params = m.init(jax.random.PRNGKey(0), c, q, q_mask)
    out = m.apply(params, c, q, q_mask)
    assert out.shape == (2, 6, d)
    # masked query position must not influence the output
    q2 = q.at[0, 3].set(99.0)
    out2 = m.apply(params, c, q2, q_mask)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                               atol=1e-5)

    vae = VaeEncoder(dim=d)
    # init non-deterministically so the logvar branch params exist
    vparams = vae.init(jax.random.PRNGKey(1), c, c, jax.random.PRNGKey(9),
                       False)
    z, kld = vae.apply(vparams, c, c, None, True)
    assert z.shape == c.shape and kld is None
    z2, kld2 = vae.apply(vparams, c, c, jax.random.PRNGKey(2), False)
    assert kld2.shape == (2, 6)

    dec = LatentDecoder(dim=d)
    dparams = dec.init(jax.random.PRNGKey(3), c)
    r = dec.apply(dparams, c)
    assert r.shape == c.shape and float(jnp.max(jnp.abs(r))) <= 1.0
