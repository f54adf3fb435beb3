"""Config DSLs, schedules, sampling."""

import os

import numpy as np

from m3p_tpu.config import parse_lgs, parse_steps, small_test_config
from m3p_tpu.utils.schedules import LambdaSchedule
from m3p_tpu.utils.sampling import set_sampling_probs, shuf_order


def test_parse_lgs():
    assert parse_lgs("en-de-fr-cs") == {"en": 0, "de": 1, "fr": 2, "cs": 3}
    assert parse_lgs("en") == {"en": 0}


def test_parse_steps():
    assert parse_steps("coco-img,flicker-img") == [("coco", "img"), ("flicker", "img")]
    assert parse_steps("") == []
    assert parse_steps("mild") == [("mild", None)]


def test_lambda_constant():
    s = LambdaSchedule.parse("0.5")
    assert s(0) == 0.5 and s(10**6) == 0.5 and s.is_constant


def test_lambda_piecewise():
    s = LambdaSchedule.parse("0:1,1000:0")
    assert s(0) == 1.0
    assert s(1000) == 0.0
    assert abs(s(500) - 0.5) < 1e-9
    assert s(2000) == 0.0  # clamped


def test_lambda_multi_knot():
    s = LambdaSchedule.parse("0:0,100:1,200:0.5")
    assert abs(s(50) - 0.5) < 1e-9
    assert abs(s(150) - 0.75) < 1e-9


def test_sampling_probs_upweights_low_resource():
    probs = set_sampling_probs({"en": 1000000, "sw": 1000}, coeff=0.5)
    ratio_raw = 1000000 / 1000
    ratio_smoothed = probs["en"] / probs["sw"]
    assert ratio_smoothed < ratio_raw
    assert abs(sum(probs.values()) - 1.0) < 1e-9


def test_shuf_order_deterministic_and_distribution():
    rng = np.random.RandomState(0)
    items = ["a", "b", "c"]
    out = shuf_order(items, n=5, rng=rng)
    assert len(out) == 5 and set(out) <= set(items)
    probs = {"a": 0.98, "b": 0.01, "c": 0.01}
    rng = np.random.RandomState(0)
    out = shuf_order(items, probs=probs, n=200, rng=rng)
    assert out.count("a") > 150


def test_small_config():
    cfg = small_test_config()
    assert cfg.model.ffn_dim == 4 * cfg.model.emb_dim
    assert cfg.model.head_dim * cfg.model.n_heads == cfg.model.emb_dim
    assert cfg.lang2id == {"en": 0}


def test_reference_metric_names_resolve(tmp_path):
    """--validation_metrics valid_mean_recall / --stopping_criterion
    valid_mean_recall,10 (the reference README recipe) must track this
    framework's unprefixed score keys."""
    import jax
    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.train.trainer import Trainer

    cfg = small_test_config().replace(
        dump_path=str(tmp_path),
        validation_metrics="valid_mean_recall",
        stopping_criterion="valid_mean_recall,0")
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    t = Trainer(cfg, model, params, datasets=None)
    t.save_best_model({"mean_recall": 41.0})
    assert t.best_metrics.get("mean_recall") == 41.0
    t.end_epoch({"mean_recall": 41.0})
    t.end_epoch({"mean_recall": 40.0})   # worse -> patience 0 exceeded
    assert t.should_stop


def test_weighted_sampling_draws_per_group(tmp_path):
    """Weighted task sampling draws 3 per STEP GROUP (reference
    `shuf_order(steps, params, n=3)` per DSL group) — a flat weighted draw
    would starve small-corpus objectives."""
    import jax
    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.train.trainer import Trainer

    cfg = small_test_config().replace(dump_path=str(tmp_path))
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    t = Trainer(cfg, model, params, datasets=None)
    tasks = [("mlm", ("mlm", "en")), ("mlm", ("mlm", "de")),
             ("rel", ("rel", "coco"))]
    # extreme skew: mlm corpora vastly larger than rel
    probs = {0: 0.699, 1: 0.3, 2: 0.001}
    order = t._round_order(tasks, probs)
    kinds = [tasks[i][0] for i in order]
    assert kinds.count("rel") == 3       # its own group: always drawn
    assert kinds.count("mlm") == 3       # 3 draws within the mlm group
    # uniform mode: every task exactly once
    assert sorted(t._round_order(tasks, None)) == [0, 1, 2]


def test_preemption_handler_install_restore(tmp_path):
    """install_preemption_handler is process-global; uninstall must restore
    the prior SIGTERM disposition.  A leaked handler makes any in-process
    caller (pytest itself, an embedder) immune to SIGTERM forever — this
    exact leak once let a `timeout`-wrapped suite run past its kill."""
    import signal

    import jax
    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.train.trainer import Trainer

    sentinel_hits = []

    def sentinel(signum, frame):
        sentinel_hits.append(signum)

    prev = signal.signal(signal.SIGTERM, sentinel)
    try:
        cfg = small_test_config().replace(dump_path=str(tmp_path))
        model, params = build_model(cfg.model, jax.random.PRNGKey(0))
        t = Trainer(cfg, model, params, datasets=None)
        t.install_preemption_handler()
        assert signal.getsignal(signal.SIGTERM) is not sentinel
        signal.raise_signal(signal.SIGTERM)     # -> schedules a save
        assert t._pending_save and not sentinel_hits
        t.uninstall_preemption_handler()
        assert signal.getsignal(signal.SIGTERM) is sentinel
        t.uninstall_preemption_handler()        # idempotent
        assert signal.getsignal(signal.SIGTERM) is sentinel
        # a None saved disposition means the prior handler was installed
        # OUTSIDE Python (signal.signal returns None then) — uninstall must
        # still clear the trainer handler, restoring SIG_DFL, not no-op
        t.install_preemption_handler()
        t._prev_sigterm = None
        t.uninstall_preemption_handler()
        assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_persistent_xla_cache_config(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at an on-disk cache dir, honors
    the M3P_XLA_CACHE override, and M3P_XLA_CACHE=0 disables."""
    import jax

    from m3p_tpu.utils.xla_cache import enable_persistent_cache

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        target = str(tmp_path / "xla")
        monkeypatch.setenv("M3P_XLA_CACHE", target)
        assert enable_persistent_cache() == target
        assert jax.config.jax_compilation_cache_dir == target
        assert os.path.isdir(target)
        # explicit path wins over env
        explicit = str(tmp_path / "explicit")
        assert enable_persistent_cache(explicit) == explicit
        monkeypatch.setenv("M3P_XLA_CACHE", "0")
        assert enable_persistent_cache() == ""
        # auto mode (no env/path): DISABLED on the CPU backend and in
        # multi-process runs, config untouched — XLA:CPU AOT entries can
        # fail machine-feature checks at load (observed SIGILL warning +
        # stall), and partially-populated shared caches desynchronize
        # resumed ranks past the 30 s Gloo rendezvous (both seen in the
        # 4-process kill-and-resume test)
        monkeypatch.delenv("M3P_XLA_CACHE")
        before = jax.config.jax_compilation_cache_dir
        assert jax.default_backend() == "cpu"   # the test env
        assert enable_persistent_cache() == ""
        assert jax.config.jax_compilation_cache_dir == before
        # ...but an explicit env dir is operator intent: honored on any
        # backend, even multi-process
        monkeypatch.setenv("M3P_XLA_CACHE", target)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        assert enable_persistent_cache() == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)
