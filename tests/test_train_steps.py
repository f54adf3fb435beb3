"""Train-step tests: every objective runs, loss decreases, grads flow."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m3p_tpu.config import small_test_config
from m3p_tpu.data.masking import MaskingConfig
from m3p_tpu.data import synthetic
from m3p_tpu.model import build_model
from m3p_tpu.train.optim import build_optimizer
from m3p_tpu.train.state import create_train_state
from m3p_tpu.train import steps as S


@pytest.fixture(scope="module")
def setup():
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    tx, _ = build_optimizer("adam,lr=0.001", clip_grad_norm=5.0)
    state = create_train_state(params, tx)
    mask_cfg = MaskingConfig(max_pred=4, n_words=cfg.model.n_words,
                             mask_index=cfg.model.mask_index)
    return cfg, model, state, mask_cfg


def _np_batch(b):
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_mct_pretrain_step(setup):
    cfg, model, state, mask_cfg = setup
    rng = np.random.RandomState(0)
    batch = _np_batch(synthetic.make_pretrain_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words, with_clcm=True))

    def loss_fn(params, batch, key):
        return S.mct_pretrain_loss(
            model, params, batch, key, mask_cfg, cfg.data.sample_n,
            lambda_rel=1.0, lambda_mlm=1.0, lambda_mrm=1.0, lambda_mrfr=1.0,
            lambda_clcm=1.0, refine_image=True)

    step = S.make_train_step(loss_fn, donate=False)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        for k in ["rel", "mlm", "mrm", "mrfr", "clcm"]:
            assert np.isfinite(float(metrics[k])), k
    assert losses[-1] < losses[0], losses


def test_itm_finetune_step(setup):
    cfg, model, state, _ = setup
    rng = np.random.RandomState(1)
    batch = _np_batch(synthetic.make_retrieval_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words))

    def loss_fn(params, batch, key):
        return S.itm_finetune_loss(model, params, batch, key,
                                   cfg.data.sample_n, refine_image=True)

    step = S.make_train_step(loss_fn, donate=False)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_mlm_step(setup):
    cfg, model, state, mask_cfg = setup
    rng = np.random.RandomState(2)
    batch = _np_batch(synthetic.make_stream_batch(rng, 4, 16,
                                                  cfg.model.n_words))

    def loss_fn(params, batch, key):
        return S.mlm_loss(model, params, batch, key, mask_cfg)

    step = S.make_train_step(loss_fn, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["mlm"]))


def test_caption_step(setup):
    cfg, model, state, _ = setup
    rng = np.random.RandomState(3)
    batch = _np_batch(synthetic.make_caption_batch(
        rng, 4, cfg.data.max_len, cfg.data.max_region_num, cfg.model.n_words))

    def loss_fn(params, batch, key):
        return S.caption_loss(model, params, batch, key, refine_image=True)

    step = S.make_train_step(loss_fn, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["ce"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_caption_refine_encoder(setup):
    """`refine_encoder` applies the AoA refiner again after the encoder
    stack (`transformer.py:869-870`, `ic_step` `xtrainer.py:1495`) — it
    must change the loss and stay trainable."""
    cfg, model, state, _ = setup
    rng = np.random.RandomState(3)
    batch = _np_batch(synthetic.make_caption_batch(
        rng, 4, cfg.data.max_len, cfg.data.max_region_num, cfg.model.n_words))
    key = jax.random.PRNGKey(0)
    base, _ = S.caption_loss(model, state.params, batch, key,
                             refine_image=True, deterministic=True)
    refined, _ = S.caption_loss(model, state.params, batch, key,
                                refine_image=True, deterministic=True,
                                refine_encoder=True)
    assert np.isfinite(float(refined))
    assert abs(float(base) - float(refined)) > 1e-6

    step = S.make_train_step(
        lambda p, b, k: S.caption_loss(model, p, b, k, refine_encoder=True),
        donate=False)
    state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["ce"]))


def test_mt_and_mt_caption_steps(setup):
    cfg, model, state, _ = setup
    rng = np.random.RandomState(4)
    mt_batch = _np_batch(synthetic.make_mt_batch(rng, 4, cfg.data.max_len,
                                                 cfg.model.n_words))
    step = S.make_train_step(
        lambda p, b, k: S.mt_loss(model, p, b, k), donate=False)
    state, metrics = step(state, mt_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["ce"]))

    cap = synthetic.make_caption_batch(rng, 4, cfg.data.max_len,
                                       cfg.data.max_region_num,
                                       cfg.model.n_words)
    mmt_batch = _np_batch({
        "src_tokens": mt_batch["src_tokens"], "src_len": mt_batch["src_len"],
        "tgt_tokens": mt_batch["tgt_tokens"], "tgt_len": mt_batch["tgt_len"],
        "feats": cap["feats"], "locs": cap["locs"], "img_len": cap["img_len"],
    })
    step2 = S.make_train_step(
        lambda p, b, k: S.mt_caption_loss(model, p, b, k), donate=False)
    state, metrics = step2(state, mmt_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["ce"]))


def test_slide_step(setup):
    cfg, model, state, _ = setup
    rng = np.random.RandomState(5)
    batch = _np_batch(synthetic.make_slide_batch(
        rng, 4, cfg.data.max_len, cfg.data.max_region_num, cfg.model.n_words))
    step = S.make_train_step(
        lambda p, b, k: S.slide_loss(model, p, b, k), donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_itm_cls_loss_weights(setup):
    """--multi_cls_loss_weight / --bin_cls_loss_weight scale the CE and BCE
    terms of the ITM grid loss (`xtrainer.py:1938`)."""
    cfg, model, state, _ = setup
    rng = np.random.RandomState(7)
    batch = _np_batch(synthetic.make_retrieval_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words))
    key = jax.random.PRNGKey(0)

    def run(mw, bw):
        loss, m = S.itm_finetune_loss(
            model, state.params, batch, key, cfg.data.sample_n,
            deterministic=True, multi_cls_weight=mw, bin_cls_weight=bw)
        return float(loss), float(m["ce"]), float(m["bce"])

    loss_ce, ce, bce = run(1.0, 0.0)
    assert loss_ce == pytest.approx(ce)
    loss_bce, _, _ = run(0.0, 1.0)
    assert loss_bce == pytest.approx(bce)
    loss_w, _, _ = run(2.0, 0.5)
    assert loss_w == pytest.approx(2.0 * ce + 0.5 * bce, rel=1e-5)


def test_mt_only_text_routes_mt_ic(setup):
    """--mt_only_text trains multimodal-MT without the image stream
    (`mt_ic_step`, `xtrainer.py:1561`): the routed mt_ic step must run on a
    text-only batch (no feats/locs)."""
    cfg, model, state, _ = setup
    from m3p_tpu.train.trainer import Trainer

    # fresh param copies: the Trainer's compiled step donates its state,
    # which must not consume the module-scoped fixture's buffers
    own_params = jax.tree.map(jnp.array, state.params)
    t = Trainer(cfg.replace(mt_only_text=True), model, own_params,
                datasets=None)
    step = t._get_step("mt_ic")
    rng = np.random.RandomState(8)
    batch = _np_batch(synthetic.make_mt_batch(rng, 2, cfg.data.max_len,
                                              cfg.model.n_words))
    _, metrics = step(t.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["ce"]))


def test_lambda_zero_kills_objective(setup):
    """With all lambdas zero the total pretrain loss must be exactly 0."""
    cfg, model, state, mask_cfg = setup
    rng = np.random.RandomState(6)
    batch = _np_batch(synthetic.make_pretrain_batch(
        rng, 2, cfg.data.sample_n, cfg.data.max_len,
        cfg.data.max_region_num, cfg.model.n_words))
    loss, _ = S.mct_pretrain_loss(
        model, state.params, batch, jax.random.PRNGKey(0), mask_cfg,
        cfg.data.sample_n, lambda_rel=0.0, lambda_mlm=0.0, lambda_mrm=0.0,
        lambda_mrfr=0.0, lambda_clcm=0.0)
    assert float(loss) == 0.0


def test_optim_schedules():
    from m3p_tpu.train.optim import inverse_sqrt_schedule, cosine_schedule
    s = inverse_sqrt_schedule(5e-5, warmup_updates=4000)
    assert float(s(1)) < float(s(2000)) < float(s(3999))
    peak = float(s(4000))
    assert abs(peak - 5e-5) / 5e-5 < 1e-3
    assert float(s(16000)) == pytest.approx(peak / 2, rel=1e-3)
    c = cosine_schedule(1e-4, warmup_updates=100, init_period=1000)
    assert float(c(100)) == pytest.approx(1e-4, rel=1e-2)
    assert float(c(600)) < float(c(100))


def test_mu_dtype_spec():
    """``mu_dtype=bfloat16`` stores the first Adam moment in bf16 (halves the
    HBM traffic of the largest optimizer buffer) without changing the API."""
    import jax
    import jax.numpy as jnp
    from m3p_tpu.train.optim import build_optimizer

    tx, _ = build_optimizer("adam,lr=0.001,mu_dtype=bfloat16")
    params = {"w": jnp.ones(4, jnp.float32)}
    state = tx.init(params)
    mu_leaves = [leaf for leaf in jax.tree.leaves(state)
                 if getattr(leaf, "dtype", None) == jnp.bfloat16]
    assert mu_leaves, "no bf16 moment found in optimizer state"
    upd, state = tx.update({"w": jnp.full(4, 0.5)}, state, params)
    assert upd["w"].dtype == jnp.float32  # updates stay fp32


def test_skip_nonfinite_guard():
    import jax.numpy as jnp
    from m3p_tpu.train.optim import build_optimizer

    tx, _ = build_optimizer("sgd,lr=1.0", guard_nonfinite=True)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    good = {"w": jnp.ones(3) * 0.5}
    upd, state = tx.update(good, state, params)
    assert float(upd["w"][0]) != 0.0
    bad = {"w": jnp.array([1.0, float("nan"), 1.0])}
    upd, state = tx.update(bad, state, params)
    assert float(jnp.abs(upd["w"]).max()) == 0.0


def test_clm_step(setup):
    cfg, model, state, _ = setup
    rng = np.random.RandomState(7)
    batch = _np_batch(synthetic.make_stream_batch(rng, 4, 16,
                                                  cfg.model.n_words))
    step = S.make_train_step(
        lambda p, b, k: S.clm_loss(model, p, b, k), donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["clm"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_fused_adam_matches_optax_chain():
    """FusedAdam (fused=1) reproduces clip_by_global_norm->adam(schedule)
    exactly with fp32 moments."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state

    spec = "adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.01,warmup_updates=4"
    rng = np.random.RandomState(0)
    params = {"a": jnp.asarray(rng.randn(16, 8), jnp.float32),
              "b": {"w": jnp.asarray(rng.randn(32), jnp.float32)}}
    s_ref = create_train_state(params, build_optimizer(
        spec, clip_grad_norm=0.5)[0])
    s_fused = create_train_state(params, build_optimizer(
        spec + ",fused=1", clip_grad_norm=0.5)[0])

    for i in range(6):
        g = {"a": jnp.asarray(rng.randn(16, 8) * (i + 1), jnp.float32),
             "b": {"w": jnp.asarray(rng.randn(32) * 3, jnp.float32)}}
        s_ref = s_ref.apply_gradients(grads=g)
        s_fused = s_fused.apply_gradients(grads=g)
    for k in ("a",):
        np.testing.assert_allclose(np.asarray(s_ref.params[k]),
                                   np.asarray(s_fused.params[k]),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(s_ref.params["b"]["w"]),
                               np.asarray(s_fused.params["b"]["w"]),
                               rtol=2e-5, atol=2e-6)

    # bf16 moments stay close (storage precision only)
    s_bf = create_train_state(params, build_optimizer(
        spec + ",fused=1,mu_dtype=bfloat16,nu_dtype=bfloat16",
        clip_grad_norm=0.5)[0])
    rng2 = np.random.RandomState(0)
    _ = rng2.randn(16, 8)  # realign
    assert s_bf.opt_state["mu"]["a"].dtype == jnp.bfloat16
    assert s_bf.opt_state["nu"]["b"]["w"].dtype == jnp.bfloat16


def test_fused_adam_master_params():
    """master=1: live params stored bf16, fp32 master in opt_state; updates
    track the fp32 path within bf16 storage tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from m3p_tpu.train.optim import build_optimizer
    from m3p_tpu.train.state import create_train_state

    spec = "adam,lr=0.01,fused=1"
    rng = np.random.RandomState(0)
    params = {"w": jnp.asarray(rng.randn(64, 16), jnp.float32)}
    s_ref = create_train_state(params, build_optimizer(spec)[0])
    s_m = create_train_state(params, build_optimizer(spec + ",master=1")[0])
    assert s_m.params["w"].dtype == jnp.bfloat16
    assert s_m.opt_state["master"]["w"].dtype == jnp.float32
    for i in range(10):
        g = {"w": jnp.asarray(rng.randn(64, 16), jnp.float32)}
        s_ref = s_ref.apply_gradients(grads=g)
        s_m = s_m.apply_gradients(grads={"w": g["w"].astype(jnp.bfloat16)})
    np.testing.assert_allclose(
        np.asarray(s_ref.params["w"]),
        np.asarray(s_m.opt_state["master"]["w"]), rtol=0.05, atol=0.02)


def test_clm_context_size(setup):
    """--context_size excludes the first positions from CLM prediction
    (`xtrainer.py:712-713`)."""
    cfg, model, state, _ = setup
    rng = np.random.RandomState(9)
    batch = _np_batch(synthetic.make_stream_batch(rng, 2, 16,
                                                  cfg.model.n_words))
    key = jax.random.PRNGKey(0)
    full, _ = S.clm_loss(model, state.params, batch, key, deterministic=True)
    ctx, _ = S.clm_loss(model, state.params, batch, key, deterministic=True,
                        context_size=8)
    assert np.isfinite(float(ctx)) and float(ctx) != float(full)
    # excluding everything zeroes the loss (guarded denominator)
    allctx, _ = S.clm_loss(model, state.params, batch, key,
                           deterministic=True, context_size=16)
    assert float(allctx) == 0.0


def test_logged_lr_counts_updates_not_microiters():
    """With accumulate_gradients=k the APPLIED schedule advances once per k
    micro-steps (optax.MultiSteps), so the logged lr must be
    lr_schedule(n_total_iter // k) — logging the raw micro-iter count showed
    warmup ending k times early and understated the post-warmup lr by
    sqrt(k) (observed live: lr 1.9e-5 at iter 680 of a warmup-100 accum-4
    run whose real update count was 170 -> 3.8e-5)."""
    from types import SimpleNamespace

    from m3p_tpu.train.optim import inverse_sqrt_schedule
    from m3p_tpu.train.trainer import Trainer

    sched = inverse_sqrt_schedule(5e-5, warmup_updates=100)
    logged = {}

    class _Log:
        def info(self, fmt, *a):
            logged["lr"] = a[-1]

    stub = SimpleNamespace(
        speed=SimpleNamespace(
            rates=lambda: {"sentences_per_s": 0.0, "words_per_s": 0.0},
            reset=lambda: None),
        stats=SimpleNamespace(format=lambda: ""),
        lr_schedule=sched,
        n_total_iter=680,
        cfg=SimpleNamespace(optim=SimpleNamespace(accumulate_gradients=4)),
    )
    import m3p_tpu.train.trainer as trainer_mod

    orig = trainer_mod.logger
    trainer_mod.logger = _Log()
    try:
        Trainer.print_stats(stub)
    finally:
        trainer_mod.logger = orig
    # 680 micro-iters at accum 4 = 170 updates: 5e-5 * sqrt(100/170)
    assert abs(logged["lr"] - float(sched(170))) < 1e-12
    assert logged["lr"] > float(sched(680)) * 1.5
