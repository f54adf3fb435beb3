"""Training orchestration: the reference Trainer/XTrainer control plane
(`/root/reference/M3P/src/xtrainer.py:35-826, 1128-1205`; driver loop
`train_x.py:394-521`) rebuilt functionally.

One `Trainer` owns: the jitted per-objective steps (compiled once per batch
spec), the train state (optionally mesh-sharded), lambda schedules updated
per optimizer step without recompilation, per-task stats with deferred host
transfer, shuffled task dispatch (`shuf_order`), epoch-shard dataset updates,
checkpoint save/reload incl. best-metric tracking and early stopping, and
SIGTERM-triggered checkpointing (the TPU-native replacement for the SLURM
SIGUSR1 requeue handler, `slurm.py:20-43`).
"""

from __future__ import annotations

import functools
import logging
import os
import signal
import sys
import time
import zlib
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m3p_tpu.config import TrainConfig
from m3p_tpu.data.masking import MaskingConfig
from m3p_tpu.data.pipeline import prefetch_to_device
from m3p_tpu.model.transformer import M3PModel
from m3p_tpu.train.optim import build_optimizer
from m3p_tpu.train.state import TrainState, create_train_state
from m3p_tpu.train import steps as S
from m3p_tpu.utils.metrics import SpeedMeter, StatsAccumulator
from m3p_tpu.utils.sampling import shuf_order
from m3p_tpu.utils.schedules import parse_lambda_config, update_lambdas
from m3p_tpu import checkpoint as ckpt

logger = logging.getLogger("m3p_tpu")


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        model: M3PModel,
        params,
        datasets: Optional[Dict[Tuple[str, str], Any]] = None,
        mesh=None,
        state_shardings=None,
        batch_sharding=None,
        tokenizer=None,
    ):
        self.cfg = cfg
        self.model = model
        self.datasets = datasets or {}
        self.mesh = mesh
        # sequence / pipeline parallelism: swap the model handle so EVERY
        # objective's encoder stack runs sharded (SPModel/PPModel duck-type
        # the apply(method=...) surface; m3p_tpu.parallel.sp docstring)
        if mesh is not None and mesh.shape.get("seq", 1) > 1:
            from m3p_tpu.parallel.sp import SPModel

            assert mesh.shape.get("pp", 1) == 1, \
                "seq and pp cannot both be >1 (stack sharded once)"
            self.model = SPModel(model, mesh)
            logger.info("sequence parallelism ON: seq=%d (ring attention)",
                        mesh.shape["seq"])
        elif mesh is not None and mesh.shape.get("pp", 1) > 1:
            from m3p_tpu.parallel.pipeline import PPModel

            self.model = PPModel(model, mesh,
                                 n_microbatches=cfg.mesh.pp_microbatches)
            logger.info("pipeline parallelism ON: pp=%d stages, %d "
                        "microbatches", mesh.shape["pp"],
                        cfg.mesh.pp_microbatches)
        self.state_shardings = state_shardings
        self.batch_sharding = batch_sharding

        tx, self.lr_schedule = build_optimizer(
            cfg.optim.spec, clip_grad_norm=cfg.optim.clip_grad_norm,
            accumulate_gradients=cfg.optim.accumulate_gradients,
            weight_decay=cfg.optim.weight_decay)
        self.state = create_train_state(params, tx)
        if mesh is not None and state_shardings is None:
            # derive FSDP/TP shardings from the model's logical axes
            from m3p_tpu.parallel.sharding import (
                batch_sharding as _bsh, model_param_pspecs,
                train_state_shardings)

            pspecs = model_param_pspecs(cfg.model)
            state_shardings = train_state_shardings(self.state, mesh, pspecs)
            self.state_shardings = state_shardings
            if batch_sharding is None:
                self.batch_sharding = _bsh(mesh)
        if mesh is not None and state_shardings is not None:
            self.state = jax.tree.map(jax.device_put, self.state,
                                      state_shardings)

        self.mask_cfg = MaskingConfig(
            word_pred=cfg.data.word_pred,
            mask_keep_rand=tuple(
                float(x) for x in cfg.data.word_mask_keep_rand.split(",")),
            obj_mask_ratio=cfg.data.obj_mask_ratio,
            max_pred=cfg.data.max_pred_per_seq,
            n_words=cfg.model.n_words,
            mask_index=cfg.model.mask_index,
            pad_index=cfg.model.pad_index)
        # sample_alpha > 0: skew MLM selection toward rare words —
        # ``counts**-alpha`` with specials zeroed (`fp16_trainer.py:96-98`).
        # Piece frequencies come from the unigram model's log-probs
        # (counts ∝ exp(score)); runs without a tokenizer fall back to None.
        self.mask_scores = None
        if cfg.data.sample_alpha > 0 and tokenizer is not None:
            self.mask_scores = _mask_scores_from_tokenizer(
                tokenizer, cfg.model.n_words, cfg.data.sample_alpha,
                cfg.model.pad_index)

        self.schedules = parse_lambda_config({
            "mlm": cfg.lambda_mlm, "rel": cfg.lambda_rel,
            "mrm": cfg.lambda_mrm, "mrfr": cfg.lambda_mrfr,
            "clcm": cfg.lambda_clcm, "ic": cfg.lambda_ic,
            "mt": cfg.lambda_mt, "t2i": cfg.lambda_t2i,
            "i2t": cfg.lambda_i2t, "clm": cfg.lambda_clm,
            "mass": cfg.lambda_mass, "imlm": cfg.lambda_imlm,
            "ida": cfg.lambda_ida, "tifg": cfg.lambda_tifg,
            "pc": cfg.lambda_pc, "ae": cfg.lambda_ae,
        })

        self.stats = StatsAccumulator()
        self.speed = SpeedMeter()
        self.rng = np.random.RandomState(cfg.seed)
        self.epoch = 0
        self.n_total_iter = 0
        self.n_sentences = 0
        self.best_metrics: Dict[str, float] = {}
        self.decrease_counts = 0
        self.should_stop = False
        self._steps: Dict[str, Callable] = {}
        self._iterators: Dict[Tuple[str, str], Iterator] = {}
        self._grain_iterators: Dict[Tuple[str, str], Any] = {}
        self._resume_sentences = 0
        self._pending_save = False

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------

    def _get_step(self, kind: str) -> Callable:
        if kind in self._steps:
            return self._steps[kind]
        model, cfg = self.model, self.cfg
        if kind == "mlm":
            def loss_fn(p, b, key, **lam):
                loss, m = S.mlm_loss(model, p, b, key, self.mask_cfg,
                                     mask_scores=self.mask_scores)
                return lam.get("lambda_mlm", 1.0) * loss, m
        elif kind == "clm":
            def loss_fn(p, b, key, **lam):
                loss, m = S.clm_loss(model, p, b, key,
                                     context_size=cfg.context_size)
                return lam.get("lambda_clm", 1.0) * loss, m
        elif kind in ("rel", "pretrain_rel"):
            if kind == "rel":
                def loss_fn(p, b, key, **lam):
                    return S.itm_finetune_loss(
                        model, p, b, key, cfg.data.sample_n,
                        refine_image=cfg.refine_image,
                        multi_cls_weight=cfg.multi_cls_loss_weight,
                        bin_cls_weight=cfg.bin_cls_loss_weight)
            else:
                def loss_fn(p, b, key, **lam):
                    return S.mct_pretrain_loss(
                        model, p, b, key, self.mask_cfg, cfg.data.sample_n,
                        lambda_rel=lam.get("lambda_rel", 1.0),
                        lambda_mlm=lam.get("lambda_mlm", 1.0),
                        lambda_mrm=lam.get("lambda_mrm", 1.0),
                        lambda_mrfr=lam.get("lambda_mrfr", 1.0),
                        lambda_clcm=lam.get("lambda_clcm", 1.0),
                        mask_scores=self.mask_scores,
                        pack_ratio=cfg.data.mlm_pack_ratio,
                        refine_image=cfg.refine_image,
                        multi_cls_weight=cfg.multi_cls_loss_weight,
                        bin_cls_weight=cfg.bin_cls_loss_weight)
        elif kind == "ic":
            def loss_fn(p, b, key, **lam):
                loss, m = S.caption_loss(model, p, b, key,
                                         refine_image=cfg.refine_image,
                                         refine_encoder=cfg.refine_encoder)
                return lam.get("lambda_ic", 1.0) * loss, m
        elif kind in ("mt", "ntg"):
            def loss_fn(p, b, key, **lam):
                loss, m = S.mt_loss(model, p, b, key)
                return lam.get("lambda_mt", 1.0) * loss, m
        elif kind == "mt_ic":
            if cfg.mt_only_text:
                # `--mt_only_text`: multimodal-MT trained without the image
                # stream (`mt_ic_step`, `xtrainer.py:1561`)
                def loss_fn(p, b, key, **lam):
                    loss, m = S.mt_loss(model, p, b, key)
                    return lam.get("lambda_mt", 1.0) * loss, m
            else:
                def loss_fn(p, b, key, **lam):
                    loss, m = S.mt_caption_loss(
                        model, p, b, key, refine_image=cfg.refine_image)
                    return lam.get("lambda_mt", 1.0) * loss, m
        elif kind == "slide":
            def loss_fn(p, b, key, **lam):
                return S.slide_loss(model, p, b, key)
        elif kind in ("mass", "bart", "ae", "bart_img"):
            # batches come pre-noised from the loader's host transforms
            # (span_masking.mass_mask / bart_infill, noise.add_noise,
            # span_masking.poisson_region_noise)
            if kind == "mass":
                def loss_fn(p, b, key, **lam):
                    loss, m = S.mass_loss(model, p, b, key)
                    return lam.get("lambda_mass", 1.0) * loss, m
            elif kind == "bart":
                def loss_fn(p, b, key, **lam):
                    loss, m = S.mt_loss(model, p, b, key)
                    return lam.get("lambda_imlm", 1.0) * loss, m
            elif kind == "ae":
                def loss_fn(p, b, key, **lam):
                    loss, m = S.mt_loss(model, p, b, key)
                    return lam.get("lambda_ae", 1.0) * loss, m
            else:  # bart_img: IDA region-denoising captioning
                def loss_fn(p, b, key, **lam):
                    # reference bart_img_step passes params.refine_image
                    # (`xtrainer.py:1789`)
                    loss, m = S.caption_loss(
                        model, p, b, key, refine_image=cfg.refine_image)
                    return lam.get("lambda_ida", 1.0) * loss, m
        elif kind == "tifg":
            def loss_fn(p, b, key, **lam):
                loss, m = S.tifg_loss(model, p, b, key)
                return lam.get("lambda_tifg", 1.0) * loss, m
        elif kind == "pc":
            def loss_fn(p, b, key, **lam):
                loss, m = S.pc_loss(model, p, b, key)
                return lam.get("lambda_pc", 1.0) * loss, m
        else:
            raise ValueError(f"unknown step kind: {kind}")

        step = S.make_train_step(loss_fn, donate=True,
                                 state_shardings=self.state_shardings)

        if cfg.is_freelb and kind in ("rel", "pretrain_rel", "ic"):
            # reference dispatch runs the plain step AND the adversarial one
            # (`train_x.py:454-456`, `xtrainer.py:1870-1876`)
            from m3p_tpu.train.freelb import (
                FreeLBConfig, make_freelb_ic_step, make_freelb_itm_step,
                make_freelb_pretrain_step)

            fl = FreeLBConfig(adv_steps=cfg.adv_steps, adv_lr=cfg.adv_lr,
                              adv_max_norm=cfg.adv_max_norm,
                              norm_type=cfg.norm_type,
                              free_text=cfg.free_text,
                              free_img=cfg.free_img)
            if kind == "rel":
                adv0 = make_freelb_itm_step(
                    model, cfg.data.sample_n, fl,
                    refine_image=cfg.refine_image,
                    state_shardings=self.state_shardings)

                def adv(st, b, k, **lam):
                    return adv0(st, b, k)
            elif kind == "pretrain_rel":
                adv = make_freelb_pretrain_step(
                    model, cfg.data.sample_n, self.mask_cfg, fl,
                    refine_image=cfg.refine_image,
                    state_shardings=self.state_shardings)
            else:
                adv = make_freelb_ic_step(
                    model, fl, refine_image=cfg.refine_image,
                    refine_encoder=cfg.refine_encoder,
                    state_shardings=self.state_shardings)

            def combined(st, b, k, **lam):
                st, m = step(st, b, k, **lam)
                st, m_adv = adv(st, b, k, **lam)
                m = dict(m)
                m["adv_loss"] = m_adv["loss"]
                return st, m

            self._steps[kind] = combined
            return combined

        self._steps[kind] = step
        return step

    # ------------------------------------------------------------------
    # data plumbing
    # ------------------------------------------------------------------

    def _get_batch(self, task: Tuple[str, str]):
        it = self._iterators.get(task)
        if it is None:
            it = self._make_iterator(task)
        try:
            return next(it)
        except StopIteration:
            self._iterators[task] = self._make_iterator(task)
            try:
                return next(self._iterators[task])
            except StopIteration:
                raise ValueError(
                    f"dataset for {task} yields no batches (fewer records "
                    "than one batch after sharding?)") from None

    def _with_clcm(self) -> bool:
        """CLCM rides pretrain i2t batches only when --cross_clcm_steps is
        non-empty (`xtrainer.py:2380`)."""
        return self.cfg.is_pretrain and bool(self.cfg.cross_clcm_steps)

    def _make_iterator(self, task: Tuple[str, str]):
        from m3p_tpu.data.datasets import PretrainDataset
        from m3p_tpu.data.grain_pipeline import (make_grain_loader,
                                                 supports_grain)

        dataset = self.datasets[task]
        # multi-host: each process builds its slice of the GLOBAL batch;
        # stage_array assembles them via make_array_from_process_local_data
        # (the loaders shard records per process — grain ShardByJaxProcess,
        # stream feeder subselect)
        local_bs = self.cfg.data.batch_size
        if jax.process_count() > 1 and self.batch_sharding is not None:
            assert local_bs % jax.process_count() == 0, \
                (local_bs, jax.process_count())
            local_bs //= jax.process_count()
        if self.cfg.data.use_grain and supports_grain(dataset):
            # the production path: deterministic, process-sharded,
            # checkpointable (state saved in save_checkpoint)
            git = iter(make_grain_loader(
                dataset, local_bs, seed=self.cfg.seed,
                epoch=self.epoch, with_clcm=self._with_clcm(),
                worker_count=self.cfg.data.num_workers))
            self._grain_iterators[task] = git
            it = self._stage_iterator(git)
        else:
            if self._with_clcm() and isinstance(dataset, PretrainDataset):
                # CLCM concat-caption pairs ride the i2t pretrain batches
                # (`sample_captions`, `dataset_pretrain.py:412-497`)
                raw = dataset.epoch_iterator(local_bs,
                                             self.epoch, with_clcm=True)
            else:
                raw = dataset.epoch_iterator(local_bs, self.epoch)
            if (jax.process_count() > 1 and self.batch_sharding is not None
                    and getattr(dataset, "n_feeders", 1) <= 1):
                # non-grain iterators are seeded identically on every
                # process — interleave batches so each process contributes
                # DISTINCT local slices to the assembled global batch
                # (without this, every sample appears process_count times).
                # Datasets already feeder-sharded (--split_data streams,
                # per-feeder pretrain shards) are skipped: their records
                # are disjoint per process by construction.
                import itertools

                raw = itertools.islice(raw, jax.process_index(), None,
                                       jax.process_count())
            it = prefetch_to_device(raw, sharding=self.batch_sharding)
        self._iterators[task] = it
        return it

    def _stage_iterator(self, it):
        """Inline device staging for grain iterators — keeps get_state()
        exact (a background prefetcher would run the state ahead of the
        batches actually consumed)."""

        from m3p_tpu.data.pipeline import stage_array

        for batch in it:
            yield jax.tree.map(
                lambda x: stage_array(x, self.batch_sharding), batch)

    # ------------------------------------------------------------------
    # the loop
    # ------------------------------------------------------------------

    def step_once(self, kind: str, task: Tuple[str, str]) -> None:
        """Run one optimization step of the given objective."""
        batch = self._get_batch(task)
        lambdas = update_lambdas(self.schedules, self.n_total_iter)
        # every schedule value goes in as a scalar kwarg; each loss_fn picks
        # the coefficients it uses (scalars never trigger recompiles)
        lam_kwargs = {f"lambda_{k}": v for k, v in lambdas.items()}
        step = self._get_step(kind)
        # stable across processes/restarts: Python's hash() is salted per
        # process (PYTHONHASHSEED), which would resume with different
        # randomness per task after preemption
        task_h = zlib.crc32("-".join(map(str, task)).encode()) % 10007
        key = jax.random.PRNGKey(
            self.cfg.seed + self.n_total_iter * 977 + task_h)
        def stat_value(metrics):
            for name in ("loss", "ce", kind):
                if name in metrics:
                    return metrics[name]
            return next((v for k, v in metrics.items() if k != "acc"), 0.0)

        if isinstance(batch, tuple):  # (t2i, i2t) paired batches
            # --t2i_flag/--i2t_flag train a single direction
            # (`rel_step`, `xtrainer.py:1871-1877`)
            gates = (self.cfg.t2i_flag, self.cfg.i2t_flag)
            for b, on in zip(batch, gates):
                if not on:
                    continue
                self.state, metrics = step(self.state, b, key, **lam_kwargs)
                self.stats.add(f"{kind}-{task[1]}", stat_value(metrics))
        else:
            self.state, metrics = step(self.state, batch, key, **lam_kwargs)
            self.stats.add(f"{kind}-{task[1]}", stat_value(metrics))
        bs = self.cfg.data.batch_size
        self.n_sentences += bs
        self.speed.update(bs, bs * self.cfg.data.max_len)
        self.iter()

    def iter(self) -> None:
        self.n_total_iter += 1
        if self.n_total_iter % 20 == 0:
            self.print_stats()

    def print_stats(self) -> None:
        rates = self.speed.rates()
        # the APPLIED schedule counts optimizer updates (optax.MultiSteps
        # advances the inner scale_by_schedule count only on the k-th
        # micro-step), so the logged lr must divide micro-iters by the
        # accumulation factor — logging lr_schedule(n_total_iter) under
        # accumulate_gradients=k would show warmup ending k times early
        # and understate the post-warmup lr by sqrt(k)
        k = max(1, self.cfg.optim.accumulate_gradients)
        lr = float(self.lr_schedule(self.n_total_iter // k))
        logger.info("iter %d - %s - %.1f sent/s - %.0f words/s - lr %.3e",
                    self.n_total_iter, self.stats.format(),
                    rates["sentences_per_s"], rates["words_per_s"], lr)
        self.speed.reset()

    # dataset-key prefix -> step kind; "rel"/"mt" resolve per config below
    _TASK_KINDS = ("mlm", "clm", "rel", "ic", "mt", "ntg", "slide", "mass",
                   "bart", "pc", "tifg", "bart_img", "ae")

    def active_tasks(self) -> List[Tuple[str, Tuple[str, str]]]:
        """(step_kind, dataset_key) pairs.

        Derived from the loaded dataset keys (which carry per-language
        suffixes in multi-language runs); falls back to the config step DSLs
        when the Trainer was constructed without datasets (dry runs).  The
        reference derives the same dispatch from the step DSLs directly
        (`train_x.py:427-480`)."""

        def kind_of(prefix: str) -> str:
            if prefix == "rel":
                return "pretrain_rel" if self.cfg.is_pretrain else "rel"
            if prefix == "mt":
                return "mt_ic" if self.cfg.is_mt else "mt"
            return prefix

        if self.datasets:
            return [(kind_of(key[0]), key)
                    for key in sorted(self.datasets.keys())
                    if key[0] in self._TASK_KINDS]

        from m3p_tpu.config import parse_steps

        out: List[Tuple[str, Tuple[str, str]]] = []
        cfg = self.cfg
        for lang, _ in parse_steps(cfg.mlm_steps):
            out.append(("mlm", ("mlm", lang)))
            if cfg.is_generation:
                # `train_x.py:457-460`
                out.append(("bart", ("bart", lang)))
                out.append(("mass", ("mass", lang)))
        for lang, _ in parse_steps(cfg.clm_steps):
            out.append(("clm", ("clm", lang)))
        for lang, _ in parse_steps(cfg.mass_steps):
            out.append(("mass", ("mass", lang)))
        for lang, _ in parse_steps(cfg.ae_steps):
            out.append(("ae", ("ae", lang)))
        for a, _ in parse_steps(cfg.pc_steps):
            out.append(("pc", ("pc", a)))
        for ds, _ in parse_steps(cfg.cross_rel_steps):
            out.append((kind_of("rel"), ("rel", ds)))
        for ds, _ in parse_steps(cfg.cross_ic_steps):
            out.append(("ic", ("ic", ds)))
        for ds, _ in parse_steps(cfg.tifg_steps):
            out.append(("tifg", ("tifg", ds)))
        for ds, _ in parse_steps(cfg.cross_ae_steps):
            out.append(("bart_img", ("bart_img", ds)))
        for a, _ in parse_steps(cfg.cross_mt_steps):
            out.append((kind_of("mt"), ("mt", a)))
        ntg_steps = cfg.ntg_steps or (cfg.text_steps if cfg.is_ntg else "")
        for a, _ in parse_steps(ntg_steps):
            out.append(("ntg", ("ntg", a)))
        for a, _ in parse_steps(cfg.slide_steps):
            out.append(("slide", ("slide", a)))
        return out

    def task_sampling_probs(self, tasks) -> Optional[Dict[int, float]]:
        """Corpus-size-proportional task sampling smoothed by
        lg_sampling_factor (`set_sampling_probs`, `utils.py:296-320`);
        None -> uniform shuffling."""
        coeff = getattr(self.cfg, "lg_sampling_factor", -1.0)
        if coeff is None or coeff <= 0:
            return None
        from m3p_tpu.utils.sampling import set_sampling_probs

        sizes = {}
        for i, (_, key) in enumerate(tasks):
            ds = self.datasets.get(key)
            sizes[i] = len(ds) if ds is not None and hasattr(ds, "__len__") \
                else 1
        return set_sampling_probs(sizes, coeff)

    def _round_order(self, tasks, probs) -> List[int]:
        """One round's task order.  Uniform mode runs every configured task
        (the reference's full permutation, `utils.py:380-385`).  Weighted
        mode draws 3 per STEP GROUP with the corpus-size probs normalized
        within each group (`shuf_order(steps, params, n=3)` per DSL group,
        `train_x.py:427-480`) — a single flat weighted draw would starve
        small-corpus objectives entirely."""
        idx = list(range(len(tasks)))
        if probs is None:
            return shuf_order(idx, n=len(idx), rng=self.rng)
        groups: Dict[str, List[int]] = {}
        for i, (kind, _) in enumerate(tasks):
            groups.setdefault(kind, []).append(i)
        order: List[int] = []
        for kind in sorted(groups):
            g = groups[kind]
            order.extend(shuf_order(g, probs={i: probs[i] for i in g},
                                    n=3, rng=self.rng))
        return order

    def train_epoch(self) -> None:
        tasks = self.active_tasks()
        assert tasks, "no active training tasks configured"
        probs = self.task_sampling_probs(tasks)
        # continue the epoch's sentence budget after a mid-epoch resume
        self.n_sentences = self._resume_sentences
        self._resume_sentences = 0
        while self.n_sentences < self.cfg.epoch_size and not self.should_stop:
            order = self._round_order(tasks, probs)
            for ti in order:
                kind, task = tasks[ti]
                self.step_once(kind, task)
                if self._should_save_now():
                    self.save_checkpoint()
                    self._pending_save = False
                if self.n_sentences >= self.cfg.epoch_size:
                    break

    # ------------------------------------------------------------------
    # checkpoint / end-of-epoch control
    # ------------------------------------------------------------------

    def checkpoint_path(self, name: str = "checkpoint") -> str:
        return os.path.join(self.cfg.dump_path, name)

    def _should_save_now(self) -> bool:
        """Whether to checkpoint at THIS step boundary.  The Orbax save is
        collective, so in multi-process runs the decision must be too: SIGTERM
        delivery can straddle a step boundary (process A checks its flag after
        step k, process B's handler fires a hair later), and a lone process
        entering the save barrier while the rest block in step k+1's psum is a
        deadlock.  A 1-float allgather makes every process see "any rank
        pending" at the same boundary — but it is a blocking host round-trip
        (16.1ms/step at 4 localhost processes, tools/bench_save_decision.py;
        DCN on a real pod), so it runs only every ``save_check_every``
        boundaries.  n_total_iter advances identically on every process (same
        seeded task order), so all ranks agree on which boundaries check; the
        local flag is deliberately NOT consulted in between (that asymmetric
        path is exactly the deadlock).  Worst case adds N steps of
        SIGTERM-to-checkpoint latency; epoch end saves unconditionally."""
        if jax.process_count() == 1:
            return self._pending_save
        every = max(int(getattr(self.cfg, "save_check_every", 1)), 1)
        if self.n_total_iter % every != 0:
            return False
        from jax.experimental import multihost_utils

        flag = multihost_utils.process_allgather(
            np.float32(self._pending_save))
        return bool(np.max(flag) > 0)

    def save_checkpoint(self, name: str = "checkpoint") -> None:
        from m3p_tpu.data.grain_pipeline import save_loader_state

        logger.info("checkpointing at iter %d (%d sentences)",
                    self.n_total_iter, self.n_sentences)
        loader_state = {}
        for task, git in self._grain_iterators.items():
            try:
                loader_state["|".join(map(str, task))] = \
                    save_loader_state(git)
            except Exception:  # exhausted/closed iterators
                pass
        extra = {"epoch": self.epoch, "n_total_iter": self.n_total_iter,
                 "best_metrics": self.best_metrics,
                 "n_sentences": self.n_sentences,
                 "loader_state": loader_state}
        ckpt.save_checkpoint(self.checkpoint_path(name), self.state, extra)
        logger.info("saved checkpoint %s (epoch %d)", name, self.epoch)

    def reload_checkpoint(self, name: str = "checkpoint") -> bool:
        from m3p_tpu.data.grain_pipeline import restore_loader_state

        path = self.checkpoint_path(name)
        if not os.path.isdir(path):
            return False
        self.state, extra = ckpt.restore_checkpoint(path, self.state)
        self.n_total_iter = int(extra.get("n_total_iter", 0))
        self.best_metrics = dict(extra.get("best_metrics", {}))
        n_sent = int(extra.get("n_sentences", 0) or 0)
        loader_state = extra.get("loader_state") or {}
        if 0 < n_sent < self.cfg.epoch_size and loader_state:
            # mid-epoch (preemption) checkpoint: stay in the epoch and seek
            # the grain iterators back to their positions — training resumes
            # without repeating or skipping batches
            self.epoch = int(extra.get("epoch", 0))
            self._resume_sentences = n_sent
            for key_str, st in loader_state.items():
                task = tuple(key_str.split("|"))
                if task in self.datasets:
                    self._make_iterator(task)
                    try:
                        restore_loader_state(self._grain_iterators[task], st)
                    except ValueError as e:
                        # states from an incompatible loader generation
                        # (e.g. the pre-lazy multiprocess format) don't
                        # restore; fall back to a fresh iterator — only the
                        # mid-epoch position is lost, not correctness
                        logger.warning(
                            "loader state for %s not restorable (%s) - "
                            "restarting that iterator from the epoch head",
                            task, e)
            logger.info("resumed MID-EPOCH from %s (epoch %d, %d sentences, "
                        "%d loader states)", path, self.epoch, n_sent,
                        len(loader_state))
        else:
            self.epoch = int(extra.get("epoch", 0)) + 1
            logger.info("resumed from %s at epoch %d", path, self.epoch)
        return True

    def install_preemption_handler(self) -> None:
        """SIGTERM -> checkpoint at the next step boundary (replacing the
        SLURM SIGUSR1 requeue dance, `slurm.py:20-43`).

        Pair with :meth:`uninstall_preemption_handler`: the handler is
        process-global, so an embedder (or a test driving main() in-process)
        that outlives this trainer would otherwise have its SIGTERM silently
        redirected at a dead trainer forever — the process becomes
        untERMinatable."""

        def handler(signum, frame):
            logger.warning("received signal %d - scheduling checkpoint",
                           signum)
            self._pending_save = True

        self._prev_sigterm = signal.signal(signal.SIGTERM, handler)

    # distinct 'never installed' sentinel: signal.signal() legitimately
    # returns None when the previous handler was installed OUTSIDE Python
    # (e.g. by an embedding C runtime), so None cannot double as the marker
    _SIGTERM_UNSET = object()

    def uninstall_preemption_handler(self) -> None:
        """Restore the SIGTERM disposition that preceded install (no-op if
        install never ran).  A saved disposition of None (handler installed
        outside Python) restores SIG_DFL — the closest reachable state; the
        trainer handler must not leak process-wide either way."""
        prev = getattr(self, "_prev_sigterm", Trainer._SIGTERM_UNSET)
        if prev is not Trainer._SIGTERM_UNSET:
            signal.signal(signal.SIGTERM,
                          signal.SIG_DFL if prev is None else prev)
            self._prev_sigterm = Trainer._SIGTERM_UNSET

    @staticmethod
    def _resolve_metric(name: str, scores: Dict[str, float]) -> Optional[str]:
        """Match a reference metric name to this framework's score keys:
        exact first, then with the reference's `valid_`/`test_` split prefix
        stripped (the recipes pass e.g. `valid_mean_recall`,
        `README.md:158-216`; scores here are unprefixed)."""
        if name in scores:
            return name
        for pre in ("valid_", "test_"):
            if name.startswith(pre) and name[len(pre):] in scores:
                return name[len(pre):]
        return None

    def save_best_model(self, scores: Dict[str, float]) -> None:
        for metric in [m for m in self.cfg.validation_metrics.split(",") if m]:
            sign = -1.0 if metric.startswith("_") else 1.0
            name = self._resolve_metric(metric.lstrip("_"), scores)
            if name is None:
                continue
            value = sign * scores[name]
            if value > self.best_metrics.get(name, -1e18):
                self.best_metrics[name] = value
                self.save_checkpoint(f"best-{name}")
                logger.info("new best %s: %.4f", name, scores[name])

    def end_epoch(self, scores: Dict[str, float]) -> None:
        crit = self.cfg.stopping_criterion
        if crit:
            metric, patience = crit.split(",")
            sign = -1.0 if metric.startswith("_") else 1.0
            name = self._resolve_metric(metric.lstrip("_"), scores)
            if name is not None:
                value = sign * scores[name]
                key = f"stop-{name}"
                if value > self.best_metrics.get(key, -1e18):
                    self.best_metrics[key] = value
                    self.decrease_counts = 0
                else:
                    self.decrease_counts += 1
                if self.decrease_counts > int(patience):
                    logger.info("early stopping after %d non-improving "
                                "epochs", self.decrease_counts)
                    self.should_stop = True
        if self.cfg.save_periodic > 0 and \
                self.epoch % self.cfg.save_periodic == 0:
            self.save_checkpoint(f"periodic-{self.epoch}")
        if self.cfg.is_pretrain and self.cfg.save_every_epoch > 0 and \
                self.epoch % self.cfg.save_every_epoch == 0:
            # per-epoch pretrain snapshots (`model_pretrain_%i`,
            # `train_x.py:505-506`)
            self.save_checkpoint(f"model_pretrain_{self.epoch}")
        self.save_checkpoint()
        self.epoch += 1
        # epoch-shard datasets re-open next epoch
        self._iterators.clear()
        self._grain_iterators.clear()


def _mask_scores_from_tokenizer(tokenizer, n_words: int, alpha: float,
                                pad_index: int):
    """``counts ** -alpha`` per token id for sample_alpha masking
    (`fp16_trainer.py:96-98`), with pad/special ids zeroed.  Counts are
    reconstructed from the unigram piece log-probabilities (counts ∝
    exp(score)); ids beyond the piece table (e.g. <mask>) get score 0."""
    import numpy as np

    scores = np.zeros((n_words,), np.float32)
    model = getattr(tokenizer, "_py_model", None) or \
        getattr(tokenizer, "model", None)
    piece_scores = getattr(model, "scores", None)
    if piece_scores is None:
        return None
    logp = np.asarray(piece_scores, np.float32)
    counts = np.exp(logp - logp.max())
    # fairseq offset: piece i -> id i + 1 (`tokenization.py:29-41`)
    ids = np.arange(len(counts)) + 1
    ok = ids < n_words
    scores[ids[ok]] = np.maximum(counts[ok], 1e-12) ** -alpha
    scores[:4] = 0.0          # <s>/<pad>/</s>/<unk>
    scores[pad_index] = 0.0
    import jax.numpy as jnp

    return jnp.asarray(scores)
