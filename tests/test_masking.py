"""On-device masking transforms: rates, 80/10/10 distribution, fixed shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from m3p_tpu.data.masking import MaskingConfig, mask_regions, mask_tokens

CFG = MaskingConfig(word_pred=0.15, obj_mask_ratio=0.15, max_pred=8,
                    n_words=512, mask_index=511, pad_index=1)


def test_mask_tokens_shapes_and_rate():
    rng = np.random.RandomState(0)
    B, S = 32, 32
    tokens = jnp.array(rng.randint(4, 500, (B, S)), jnp.int32)
    valid = jnp.ones((B, S), bool)
    masked, pos, labels, weights = mask_tokens(jax.random.PRNGKey(0), tokens,
                                               valid, CFG)
    assert masked.shape == (B, S)
    assert pos.shape == labels.shape == weights.shape == (B, CFG.max_pred)
    rate = float(jnp.sum(weights)) / (B * (S - 1))
    assert 0.08 < rate < 0.22, rate
    # labels at weighted slots == original tokens at those positions
    orig = jnp.take_along_axis(tokens, pos, axis=1)
    assert bool(jnp.all((orig == labels) | (weights == 0)))


def test_mask_tokens_never_masks_bos_or_pad():
    rng = np.random.RandomState(1)
    B, S = 16, 16
    tokens = jnp.array(rng.randint(4, 500, (B, S)), jnp.int32)
    tokens = tokens.at[:, 0].set(0).at[:, -4:].set(1)
    valid = jnp.array(np.arange(S)[None, :] < S - 4).repeat(B, 0)
    _, pos, _, weights = mask_tokens(jax.random.PRNGKey(1), tokens, valid, CFG)
    picked = np.asarray(pos)[np.asarray(weights) > 0]
    assert (picked != 0).all()
    assert (picked < S - 4).all()


def test_mask_tokens_801010_distribution():
    rng = np.random.RandomState(2)
    B, S = 64, 64
    cfg = MaskingConfig(word_pred=0.5, max_pred=40, n_words=512,
                        mask_index=511, pad_index=1)
    tokens = jnp.array(rng.randint(4, 500, (B, S)), jnp.int32)
    masked, pos, labels, weights = mask_tokens(jax.random.PRNGKey(2), tokens,
                                               jnp.ones((B, S), bool), cfg)
    new = np.asarray(jnp.take_along_axis(masked, pos, axis=1))
    labels, weights = np.asarray(labels), np.asarray(weights)
    sel = weights > 0
    frac_mask = ((new == 511) & sel).sum() / sel.sum()
    frac_keep = ((new == labels) & sel).sum() / sel.sum()
    assert 0.72 < frac_mask < 0.88, frac_mask
    assert 0.05 < frac_keep < 0.18, frac_keep


def test_mask_regions():
    rng = np.random.RandomState(3)
    B, R = 16, 36
    feats = jnp.array(rng.randn(B, R, 2048), jnp.float32)
    obj = jnp.array(rng.randint(0, 1600, (B, R)), jnp.int32)
    img_mask = jnp.ones((B, R), bool)
    mf, pos, labels, weights, tgt = mask_regions(jax.random.PRNGKey(3), feats,
                                                 obj, img_mask, CFG)
    assert mf.shape == feats.shape
    assert tgt.shape == (B, CFG.max_pred, 2048)
    # masked regions zeroed, others untouched
    pos_np, w_np = np.asarray(pos), np.asarray(weights)
    mf_np, f_np = np.asarray(mf), np.asarray(feats)
    for b in range(B):
        for j in range(CFG.max_pred):
            if w_np[b, j] > 0:
                assert np.abs(mf_np[b, pos_np[b, j]]).max() == 0.0
    # target feats are the originals at masked slots
    tgt_np = np.asarray(tgt)
    for b in range(2):
        for j in range(CFG.max_pred):
            if w_np[b, j] > 0:
                np.testing.assert_array_equal(tgt_np[b, j], f_np[b, pos_np[b, j]])


def test_masking_deterministic_per_key():
    rng = np.random.RandomState(4)
    tokens = jnp.array(rng.randint(4, 500, (4, 16)), jnp.int32)
    valid = jnp.ones((4, 16), bool)
    out1 = mask_tokens(jax.random.PRNGKey(7), tokens, valid, CFG)
    out2 = mask_tokens(jax.random.PRNGKey(7), tokens, valid, CFG)
    for a, b in zip(out1, out2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_tokens_all_padding_row_safe():
    """A fully-padded batch must not crash; it gets exactly the single forced
    prediction slot (reference `pred_mask[0,0]=1` fallback semantics —
    harmless PAD-predicts-PAD) and the inputs stay unchanged."""
    tokens = jnp.full((2, 8), 1, jnp.int32)  # all PAD
    valid = jnp.zeros((2, 8), bool)
    masked, pos, labels, weights = mask_tokens(jax.random.PRNGKey(0), tokens,
                                               valid, CFG)
    assert float(weights.sum()) == 1.0  # only the forced fallback slot
    np.testing.assert_array_equal(np.asarray(masked), np.asarray(tokens))


def test_mask_tokens_short_sequence_clamps_max_pred():
    """max_pred > seq length must clamp, not crash (found driving the CLI
    with bptt=12 < max_pred_per_seq=24)."""
    rng = np.random.RandomState(5)
    tokens = jnp.array(rng.randint(4, 500, (2, 6)), jnp.int32)
    cfg = MaskingConfig(word_pred=0.5, max_pred=24, n_words=512,
                        mask_index=511)
    masked, pos, labels, weights = mask_tokens(jax.random.PRNGKey(0), tokens,
                                               jnp.ones((2, 6), bool), cfg)
    assert pos.shape == (2, 6)
    assert float(weights.sum()) > 0


def test_mask_tokens_never_empty_selection():
    """A draw that selects nothing must force one slot (reference
    pred_mask[0,0]=1 fallback) — found via the CLI: fixed eval seed + small
    batches produced exactly-zero eval loss."""
    rng = np.random.RandomState(6)
    tokens = jnp.array(rng.randint(4, 500, (1, 4)), jnp.int32)
    cfg = MaskingConfig(word_pred=1e-9, max_pred=4, n_words=512,
                        mask_index=511)
    for k in range(5):
        _, pos, _, weights = mask_tokens(jax.random.PRNGKey(k), tokens,
                                         jnp.ones((1, 4), bool), cfg)
        assert float(weights.sum()) >= 1.0
        assert int(pos[0, 0]) == 1


def test_mask_tokens_sample_alpha_skew():
    """mask_scores skews selection toward high-score tokens
    (`xtrainer.py:393-402` sample_alpha path) while keeping the overall
    expected rate."""
    rng = np.random.RandomState(3)
    B, S = 64, 32
    # half the positions hold token 7, half hold token 9
    tokens = jnp.array(np.where(rng.rand(B, S) < 0.5, 7, 9), jnp.int32)
    valid = jnp.ones((B, S), bool)
    scores = np.zeros((512,), np.float32)
    scores[7] = 10.0    # rare word: 10x selection weight
    scores[9] = 1.0
    _, pos, labels, weights = mask_tokens(
        jax.random.PRNGKey(0), tokens, valid, CFG,
        mask_scores=jnp.asarray(scores))
    w = np.asarray(weights) > 0
    lab = np.asarray(labels)
    n7 = int(((lab == 7) & w).sum())
    n9 = int(((lab == 9) & w).sum())
    assert n7 > 3 * n9, (n7, n9)
    # expected total stays near word_pred * eligible
    rate = (n7 + n9) / (B * (S - 1))
    assert 0.06 < rate < 0.25, rate
