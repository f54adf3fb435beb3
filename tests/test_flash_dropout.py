"""In-kernel attention-weight dropout in the Pallas flash kernels.

The TPU hardware PRNG has no CPU interpret lowering, so these run on a TPU
backend only (same convention as tests/test_fused_dropout.py).

The verification trick: with V = I (identity), the attention output IS the
(dropped, keep-scaled) weight matrix W_d = M . softmax(S) / (1-r) — so the
mask, the keep-rate, and the kept values can all be checked exactly against
`mha_reference`'s undropped softmax.  The VJP checks rebuild the analytic
dq/dk/dv from W_d and compare, which catches any fwd/bwd mask divergence
(e.g. tile-id seeding errors in the transposed backward grids).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.ops.attention import (_attention_pallas,
                                   _attention_pallas_small, attention,
                                   mha_reference)

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="TPU hardware PRNG required")

RATE = 0.3


def _setup(s=256, d=None, h=2, masked_tail=0, seed=0):
    """q, k random; v = identity so out == W_d.  Multi-tile via 128 blocks."""
    d = d or s
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(1, h, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, h, s, d), jnp.float32)
    v = jnp.broadcast_to(jnp.eye(s, d, dtype=jnp.float32), (1, h, s, d))
    kv_mask = jnp.arange(s)[None, :] < (s - masked_tail)
    return q, k, v, kv_mask


def _run(q, k, v, kv_mask, seed, rate=RATE):
    return _attention_pallas(q, k, v, kv_mask,
                             jnp.asarray(seed, jnp.int32), False,
                             1.0 / (q.shape[-1] ** 0.5), rate, False)


@tpu_only
def test_flash_dropout_fwd_mask_and_scale():
    q, k, v, kv_mask, = _setup(masked_tail=40)
    # undropped weights along the SAME kernel arithmetic (rate=0 Pallas run):
    # with V=I the dropped run's kept entries must equal these / (1-rate) up
    # to MXU default-precision rounding of the value dot — the kernel feeds
    # bf16(p * 1/(1-r)) vs bf16(p) into the MXU, which differ by up to ~2^-8
    # rel (measured max 6.3e-3 on-chip) — this isolates the mask logic from
    # the larger XLA-softmax divergence that the mha_reference check bounds
    w_pal = np.asarray(_run(q, k, v, kv_mask, 7, rate=0.0))
    w_ref = np.asarray(mha_reference(q, k, v, kv_mask))
    out = np.asarray(_run(q, k, v, kv_mask, 7))

    # padding semantics unaffected: masked key columns stay exactly zero
    assert np.abs(out[..., -40:]).max() == 0.0

    kept = np.abs(out[..., :-40]) > 0
    keep_frac = kept.mean()
    assert 1 - RATE - 0.03 < keep_frac < 1 - RATE + 0.03, keep_frac
    # kept entries are the undropped kernel weights / (1 - rate)
    np.testing.assert_allclose(out[..., :-40][kept],
                               (w_pal[..., :-40] / (1 - RATE))[kept],
                               rtol=1e-2)
    # and track the XLA softmax within MXU default-precision noise
    np.testing.assert_allclose(out[..., :-40][kept],
                               (w_ref[..., :-40] / (1 - RATE))[kept],
                               rtol=3e-2)

    # deterministic per seed; different seeds give different masks
    out2 = np.asarray(_run(q, k, v, kv_mask, 7))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(_run(q, k, v, kv_mask, 8))
    assert (out != out3).any()


@tpu_only
def test_flash_dropout_vjp_regenerates_mask():
    """dv = W_d^T g and the analytic dS-based dq/dk — all from the SAME mask
    the forward used, across the transposed dkv/dq backward grids."""
    q, k, v, kv_mask = _setup()
    s = q.shape[2]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    seed = jnp.asarray(11, jnp.int32)

    out, vjp = jax.vjp(
        lambda q_, k_, v_: _attention_pallas(q_, k_, v_, kv_mask, seed,
                                             False, scale, RATE, False),
        q, k, v)
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(*out.shape), jnp.float32)
    dq, dk, dv = vjp(g)

    w_d = np.asarray(out, np.float64)              # == dropped weights (V=I)
    # undropped weights along the kernel's own arithmetic (see fwd test)
    w = np.asarray(_run(q, k, v, kv_mask, 11, rate=0.0), np.float64)
    g_np = np.asarray(g, np.float64)

    # Tolerances: the kernels run MXU default precision (bf16 operands,
    # ~2^-8 rel per product, accumulating over the 256-term contraction —
    # measured ≤3e-3 abs on-chip).  A fwd/bwd mask DIVERGENCE — the failure
    # mode under test — flips whole w/(1-r)·g terms, i.e. O(1e-1) abs
    # errors, 20x above this tolerance.
    TOL = dict(rtol=2e-2, atol=5e-3)

    # dv: W_d^T @ g per (b, h)
    dv_ref = np.einsum("bhqk,bhqd->bhkd", w_d, g_np)
    np.testing.assert_allclose(np.asarray(dv, np.float64), dv_ref, **TOL)

    # analytic dS: with V = I, dP = g; dW = M . g / (1-r) has nonzeros
    # exactly where w_d does, with the same scale factor
    m_scaled = np.where(w > 1e-30, w_d / np.maximum(w, 1e-30), 0.0)
    dw = m_scaled * g_np                           # M . g / (1-r)
    di = np.einsum("bhqd,bhqd->bhq", g_np, w_d)    # rowsum(dO . O)
    ds = w * (dw - di[..., None])
    dq_ref = np.einsum("bhqk,bhkd->bhqd",
                       ds, np.asarray(k, np.float64)) * scale
    dk_ref = np.einsum("bhqk,bhqd->bhkd",
                       ds, np.asarray(q, np.float64)) * scale
    np.testing.assert_allclose(np.asarray(dq, np.float64), dq_ref, **TOL)
    np.testing.assert_allclose(np.asarray(dk, np.float64), dk_ref, **TOL)


@tpu_only
def test_flash_dropout_multihead_layer_path():
    """MultiHeadAttention takes the fused path on TPU: finite output and
    grads, deterministic under a fixed dropout rng, varying across rngs."""
    from m3p_tpu.model.layers import MultiHeadAttention

    mha = MultiHeadAttention(n_heads=4, dim=64, dropout=0.2,
                             dtype=jnp.float32)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 24, 64), jnp.float32)
    mask = jnp.ones((2, 24), bool)
    params = mha.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      x, mask, deterministic=False)["params"]

    def loss(p, key):
        y, _ = mha.apply({"params": p}, x, mask, deterministic=False,
                         rngs={"dropout": key})
        return jnp.sum(y ** 2)

    k1, k2 = jax.random.PRNGKey(3), jax.random.PRNGKey(4)
    l1, g1 = jax.value_and_grad(loss)(params, k1)
    l1b = loss(params, k1)
    l2 = loss(params, k2)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) == float(l1b)           # same rng -> same mask
    assert float(l1) != float(l2)            # different rng -> different mask
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g1))


@tpu_only
def test_attention_entry_dropout_dispatch():
    """attention(dropout_rate>0) routes to Pallas regardless of KV length
    (below PALLAS_MIN_KV_LEN) and matches reference stats at rate->tiny."""
    q, k, v, kv_mask = _setup(s=128)   # 128 < PALLAS_MIN_KV_LEN
    out = attention(q, k, v, kv_mask, dropout_rate=RATE,
                    dropout_seed=jnp.asarray(5, jnp.int32))
    w_pal = np.asarray(_run(q, k, v, kv_mask, 5, rate=0.0))
    kept = np.abs(np.asarray(out)) > 0
    np.testing.assert_allclose(np.asarray(out)[kept],
                               (w_pal / (1 - RATE))[kept], rtol=1e-2)


# ---------------------------------------------------------------------------
# Small-sequence fused kernel (heads-in-block, single-call recompute bwd)
# ---------------------------------------------------------------------------


def _run_small(q, k, v, kv_mask, seed, rate=RATE, causal=False):
    return _attention_pallas_small(q, k, v, kv_mask,
                                   jnp.asarray(seed, jnp.int32), causal,
                                   1.0 / (q.shape[-1] ** 0.5), rate, False)


@tpu_only
def test_small_dropout_fwd_mask_and_scale():
    """Same V=I verification as the flash kernel, via the small kernel.

    h=2/d=256 forces the head-group VMEM clamp to hg=1, so the (batch,
    head-group) grid and the global-head tile seeding are both exercised."""
    q, k, v, kv_mask = _setup(s=256, masked_tail=40)
    w_small = np.asarray(_run_small(q, k, v, kv_mask, 7, rate=0.0))
    out = np.asarray(_run_small(q, k, v, kv_mask, 7))

    assert np.abs(out[..., -40:]).max() == 0.0      # padded keys stay zero
    kept = np.abs(out[..., :-40]) > 0
    assert 1 - RATE - 0.03 < kept.mean() < 1 - RATE + 0.03
    np.testing.assert_allclose(out[..., :-40][kept],
                               (w_small[..., :-40] / (1 - RATE))[kept],
                               rtol=1e-2)
    # per-head masks differ (global head index seeds the tile PRNG)
    assert (kept[0, 0] != kept[0, 1]).any()
    # deterministic per seed, varying across seeds
    np.testing.assert_array_equal(
        out, np.asarray(_run_small(q, k, v, kv_mask, 7)))
    assert (out != np.asarray(_run_small(q, k, v, kv_mask, 8))).any()
    # reference-tracking on kept entries
    w_ref = np.asarray(mha_reference(q, k, v, kv_mask))
    np.testing.assert_allclose(out[..., :-40][kept],
                               (w_ref[..., :-40] / (1 - RATE))[kept],
                               rtol=3e-2)


@tpu_only
@pytest.mark.parametrize("causal", [False, True])
def test_small_dropout_vjp_regenerates_mask(causal):
    """All three grads from the single fused backward match the analytic
    formulas built from the forward's own dropped weights (V=I)."""
    q, k, v, kv_mask = _setup(s=256)
    scale = 1.0 / (q.shape[-1] ** 0.5)

    out, vjp = jax.vjp(
        lambda q_, k_, v_: _run_small(q_, k_, v_, kv_mask, 11,
                                      causal=causal), q, k, v)
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(*out.shape), jnp.float32)
    dq, dk, dv = vjp(g)

    w_d = np.asarray(out, np.float64)
    w = np.asarray(_run_small(q, k, v, kv_mask, 11, rate=0.0,
                              causal=causal), np.float64)
    g_np = np.asarray(g, np.float64)
    # MXU default-precision accumulation; causal rows with few terms amplify
    # the V=I ratio reconstruction (observed single-element 9e-3 outliers)
    TOL = dict(rtol=2e-2, atol=1e-2)

    dv_ref = np.einsum("bhqk,bhqd->bhkd", w_d, g_np)
    np.testing.assert_allclose(np.asarray(dv, np.float64), dv_ref, **TOL)

    m_scaled = np.where(w > 1e-30, w_d / np.maximum(w, 1e-30), 0.0)
    dw = m_scaled * g_np
    di = np.einsum("bhqd,bhqd->bhq", g_np, w_d)
    ds = w * (dw - di[..., None])
    dq_ref = np.einsum("bhqk,bhkd->bhqd", ds, np.asarray(k, np.float64)) * scale
    dk_ref = np.einsum("bhqk,bhqd->bhkd", ds, np.asarray(q, np.float64)) * scale
    np.testing.assert_allclose(np.asarray(dq, np.float64), dq_ref, **TOL)
    np.testing.assert_allclose(np.asarray(dk, np.float64), dk_ref, **TOL)


# ---------------------------------------------------------------------------
# Packed layout-native kernel (attention_packed): the model's encoder
# self-attention path — (B, S, H*Dh) in/out, heads as static lane slices.
# ---------------------------------------------------------------------------

from m3p_tpu.ops.attention import attention_packed  # noqa: E402


def _to_packed(x):          # (B, H, S, D) -> (B, S, H*D)
    b, h, s, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, s, h * d)


def _from_packed(x, h):     # (B, S, H*D) -> (B, H, S, D)
    b, s, hd = x.shape
    return jnp.transpose(x.reshape(b, s, h, hd // h), (0, 2, 1, 3))


def _run_packed(q, k, v, kv_mask, seed, rate=RATE, causal=False,
                interpret=False):
    """bhsd operands -> packed kernel -> bhsd output (for shared checks)."""
    h = q.shape[1]
    out = attention_packed(
        _to_packed(q), _to_packed(k), _to_packed(v), kv_mask,
        None if rate == 0.0 else jnp.asarray(seed, jnp.int32), h, causal,
        1.0 / (q.shape[-1] ** 0.5), rate, interpret)
    return _from_packed(out, h)


def test_packed_rate0_parity_interpret():
    """Packed kernel == mha_reference at rate 0 (fwd + all grads), in
    interpret mode so CI covers the kernel math on CPU.  Odd head counts
    exercise the unaligned (non-128-lane) head slices."""
    rng = np.random.RandomState(0)
    b, h, s, d = 2, 3, 40, 16
    q = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    lens = np.array([s, 17])
    kv_mask = jnp.asarray(np.arange(s)[None, :] < lens[:, None])
    for causal in (False, True):
        out = _run_packed(q, k, v, kv_mask, 0, rate=0.0, causal=causal,
                          interpret=True)
        ref = mha_reference(q, k, v, kv_mask, causal=causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        def f_packed(q_, k_, v_):
            return jnp.sum(_run_packed(q_, k_, v_, kv_mask, 0, rate=0.0,
                                       causal=causal, interpret=True) ** 2)

        def f_ref(q_, k_, v_):
            return jnp.sum(mha_reference(q_, k_, v_, kv_mask,
                                         causal=causal) ** 2)

        gp = jax.grad(f_packed, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)


def test_packed_cross_shape_parity_interpret():
    """sq != sk (training-time cross-attention) through the packed kernel:
    fwd + grads == mha_reference."""
    rng = np.random.RandomState(3)
    b, h, sq, sk, d = 2, 3, 10, 37, 16
    q = jnp.asarray(rng.randn(b, h, sq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, sk, d), jnp.float32)
    lens = np.array([sk, 20])
    kv_mask = jnp.asarray(np.arange(sk)[None, :] < lens[:, None])
    out = _run_packed(q, k, v, kv_mask, 0, rate=0.0, interpret=True)
    ref = mha_reference(q, k, v, kv_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    gp = jax.grad(lambda *t: jnp.sum(
        _run_packed(*t, kv_mask, 0, rate=0.0, interpret=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *t: jnp.sum(
        mha_reference(*t, kv_mask) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


@tpu_only
def test_packed_dropout_fwd_mask_and_scale():
    """V=I verification in the packed layout (mask, keep rate, scale)."""
    q, k, v, kv_mask = _setup(s=256, masked_tail=40)
    w0 = np.asarray(_run_packed(q, k, v, kv_mask, 7, rate=0.0))
    out = np.asarray(_run_packed(q, k, v, kv_mask, 7))

    assert np.abs(out[..., -40:]).max() == 0.0      # padded keys stay zero
    kept = np.abs(out[..., :-40]) > 0
    assert 1 - RATE - 0.03 < kept.mean() < 1 - RATE + 0.03
    np.testing.assert_allclose(out[..., :-40][kept],
                               (w0[..., :-40] / (1 - RATE))[kept],
                               rtol=1e-2)
    # per-head masks differ (global head index seeds the tile PRNG)
    assert (kept[0, 0] != kept[0, 1]).any()
    # deterministic per seed, varying across seeds
    np.testing.assert_array_equal(
        out, np.asarray(_run_packed(q, k, v, kv_mask, 7)))
    assert (out != np.asarray(_run_packed(q, k, v, kv_mask, 8))).any()
    w_ref = np.asarray(mha_reference(q, k, v, kv_mask))
    np.testing.assert_allclose(out[..., :-40][kept],
                               (w_ref[..., :-40] / (1 - RATE))[kept],
                               rtol=3e-2)


@tpu_only
@pytest.mark.parametrize("causal", [False, True])
def test_packed_dropout_vjp_regenerates_mask(causal):
    """All three grads from the packed fused backward match the analytic
    formulas built from the forward's own dropped weights (V=I) — pins the
    inv-folded backward algebra AND fwd/bwd mask bitwise identity."""
    q, k, v, kv_mask = _setup(s=256)
    scale = 1.0 / (q.shape[-1] ** 0.5)

    out, vjp = jax.vjp(
        lambda q_, k_, v_: _run_packed(q_, k_, v_, kv_mask, 11,
                                       causal=causal), q, k, v)
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(*np.asarray(out).shape), jnp.float32)
    dq, dk, dv = vjp(g)

    w_d = np.asarray(out, np.float64)
    w = np.asarray(_run_packed(q, k, v, kv_mask, 11, rate=0.0,
                               causal=causal), np.float64)
    g_np = np.asarray(g, np.float64)
    TOL = dict(rtol=2e-2, atol=1e-2)

    dv_ref = np.einsum("bhqk,bhqd->bhkd", w_d, g_np)
    np.testing.assert_allclose(np.asarray(dv, np.float64), dv_ref, **TOL)

    m_scaled = np.where(w > 1e-30, w_d / np.maximum(w, 1e-30), 0.0)
    dw = m_scaled * g_np
    di = np.einsum("bhqd,bhqd->bhq", g_np, w_d)
    ds = w * (dw - di[..., None])
    dq_ref = np.einsum("bhqk,bhkd->bhqd", ds, np.asarray(k, np.float64)) * scale
    dk_ref = np.einsum("bhqk,bhqd->bhkd", ds, np.asarray(q, np.float64)) * scale
    np.testing.assert_allclose(np.asarray(dq, np.float64), dq_ref, **TOL)
    np.testing.assert_allclose(np.asarray(dk, np.float64), dk_ref, **TOL)


@tpu_only
def test_packed_layer_path_matches_xla():
    """The MultiHeadAttention layer routes encoder self-attention through
    the packed kernel on TPU; its deterministic output must match the
    use_pallas=False XLA path."""
    from m3p_tpu.model.layers import MultiHeadAttention

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 37, 64), jnp.float32)
    lens = np.array([37, 20, 5])
    mask = jnp.asarray(np.arange(37)[None, :] < lens[:, None])
    mha = MultiHeadAttention(n_heads=4, dim=64, dropout=0.1, use_pallas=True)
    variables = mha.init(jax.random.PRNGKey(0), x, mask,
                         deterministic=True)
    out_pallas, _ = mha.apply(variables, x, mask, deterministic=True)
    mha_x = MultiHeadAttention(n_heads=4, dim=64, dropout=0.1,
                               use_pallas=False)
    out_xla, _ = mha_x.apply(variables, x, mask, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_xla),
                               rtol=2e-2, atol=2e-2)
    # training mode with dropout: runs the packed in-kernel PRNG path
    out_tr, _ = mha.apply(variables, x, mask, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out_tr)).all()
    assert (np.asarray(out_tr) != np.asarray(out_pallas)).any()
