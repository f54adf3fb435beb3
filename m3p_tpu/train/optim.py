"""Optimizers: optax factories with the reference string-spec surface.

Parity with `/root/reference/M3P/src/optim.py`:
  * spec strings ``"adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005"``
    (`optim.py:211-270`)
  * AdamInverseSqrtWithWarmup — linear warmup from ``warmup_init_lr`` to ``lr``
    over ``warmup_updates`` steps, then ``lr * sqrt(warmup_updates / step)``
    (`optim.py:89-139`)
  * AdamCosineWithWarmup — warmup then cosine cycles with period doubling and
    lr shrinking (`optim.py:142-208`)

On TPU there is no loss-scaling/AMP machinery (bf16 has fp32 range); gradient
clipping and accumulation compose as optax transforms.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def parse_optim_spec(spec: str) -> Tuple[str, Dict[str, Any]]:
    """``"adam_inverse_sqrt,beta1=0.9,lr=0.0001"`` -> (name, kwargs).
    Non-numeric values (e.g. ``mu_dtype=bfloat16``) pass through as strings."""
    parts = spec.split(",")
    name = parts[0]
    kwargs: Dict[str, Any] = {}
    for p in parts[1:]:
        if not p:
            continue
        k, v = p.split("=")
        try:
            kwargs[k] = float(v)
        except ValueError:
            kwargs[k] = v
    return name, kwargs


def inverse_sqrt_schedule(
    lr: float,
    warmup_updates: int = 4000,
    warmup_init_lr: float = 1e-7,
    exp_factor: float = 0.5,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(t) = warmup_init + t*(lr-warmup_init)/W for t<W else
    lr * W^exp / t^exp (`optim.py:128-134`)."""
    decay_factor = lr * warmup_updates ** exp_factor

    def schedule(step):
        step = jnp.maximum(step, 1)
        warm = warmup_init_lr + step * (lr - warmup_init_lr) / warmup_updates
        decay = decay_factor * step ** (-exp_factor)
        return jnp.where(step < warmup_updates, warm, decay)

    return schedule


def cosine_schedule(
    lr: float,
    warmup_updates: int = 4000,
    warmup_init_lr: float = 1e-7,
    min_lr: float = 1e-9,
    init_period: int = 1000000,
    period_mult: float = 1.0,
    lr_shrink: float = 0.75,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Warmup then (optionally restarting) cosine decay (`optim.py:142-208`).
    With the default period_mult=1 this is plain repeated cosine cycles."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_init_lr + step * (lr - warmup_init_lr) / warmup_updates
        t = jnp.maximum(step - warmup_updates, 0.0)
        if period_mult == 1.0:
            cycle = jnp.floor(t / init_period)
            t_cur = t - cycle * init_period
            period = float(init_period)
        else:
            cycle = jnp.floor(jnp.log1p(t / init_period * (period_mult - 1.0))
                              / math.log(period_mult))
            cycle_start = init_period * (period_mult ** cycle - 1.0) / (period_mult - 1.0)
            t_cur = t - cycle_start
            period = init_period * period_mult ** cycle
        shrink = lr_shrink ** cycle
        lo, hi = min_lr * shrink, lr * shrink
        cos = lo + 0.5 * (hi - lo) * (1.0 + jnp.cos(jnp.pi * t_cur / period))
        return jnp.where(step < warmup_updates, warm, cos)

    return schedule


def skip_nonfinite() -> optax.GradientTransformation:
    """Zero the whole update when any gradient is non-finite — the safe
    version of the reference's log-NaN-and-continue (`xtrainer.py:209-212`):
    the step is skipped instead of corrupting optimizer moments."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(u)) for u in jax.tree.leaves(updates)]))
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        return updates, state

    return optax.GradientTransformation(init, update)


class FusedAdam:
    """Single-pass Adam(+warmup schedule, +global-norm clip) update.

    The optax chain (clip -> scale_by_adam -> schedule) materializes an
    intermediate updates tree between stages and applies params in a separate
    ``apply_updates`` pass; on the v5e the optimizer chain measures ~16% of
    the MCT step, nearly all HBM traffic over the 280M-param state.  This
    transformation computes the clipped, bias-corrected update AND the new
    params/moments in ONE elementwise pass per leaf (read grad+mu+nu+param,
    write mu+nu+param), with optional bf16 moment storage halving the
    largest optimizer buffers.  Semantics match
    ``clip_by_global_norm(clip) -> adam(schedule, b1, b2, eps)`` exactly
    (up to moment storage precision).

    Engaged via ``fused=1`` in the optimizer spec; `TrainState.
    apply_gradients` dispatches to :meth:`fused_apply`.
    """

    def __init__(self, schedule: Callable, beta1: float = 0.9,
                 beta2: float = 0.999, eps: float = 1e-8,
                 clip_norm: float = 0.0, mu_dtype=None, nu_dtype=None,
                 master: bool = False):
        self.schedule = schedule
        self.beta1 = beta1
        self.beta2 = beta2
        self.eps = eps
        self.clip_norm = clip_norm
        self.mu_dtype = mu_dtype
        self.nu_dtype = nu_dtype
        self.master = master
        # create_train_state casts the live params to this dtype (master=1:
        # GEMMs read bf16 weights straight from HBM — no per-step fp32->bf16
        # cast pass — while updates apply to the fp32 master kept here)
        self.param_store_dtype = jnp.bfloat16 if master else None

    def init(self, params):
        def zeros_like(p, dt):
            return jnp.zeros(p.shape, dt or p.dtype)

        state = {
            "mu": jax.tree.map(lambda p: zeros_like(p, self.mu_dtype), params),
            "nu": jax.tree.map(lambda p: zeros_like(p, self.nu_dtype), params),
        }
        if self.master:
            state["master"] = jax.tree.map(
                lambda p: jnp.asarray(p, jnp.float32), params)
        return state

    def fused_apply(self, params, opt_state, grads, step):
        """(params, {mu, nu}, grads, step) -> (new_params, new_opt_state).

        ``step`` is the number of PREVIOUS updates (TrainState.step); the
        schedule reads the pre-increment count and bias correction uses
        t = step + 1 — exactly optax's scale_by_schedule / scale_by_adam."""
        t = (step + 1).astype(jnp.float32)
        lr = self.schedule(step.astype(jnp.float32))
        scale = jnp.float32(1.0)
        if self.clip_norm and self.clip_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.where(gnorm > self.clip_norm,
                              self.clip_norm / gnorm, 1.0)
        bc1 = 1.0 - self.beta1 ** t
        bc2 = 1.0 - self.beta2 ** t
        masters = opt_state.get("master") if self.master else None

        def leaf(p32, m, v, g):
            g32 = g.astype(jnp.float32) * scale
            m32 = m.astype(jnp.float32) * self.beta1 + (1 - self.beta1) * g32
            v32 = v.astype(jnp.float32) * self.beta2 + \
                (1 - self.beta2) * g32 * g32
            upd = lr * (m32 / bc1) / (jnp.sqrt(v32 / bc2) + self.eps)
            return ((p32 - upd.astype(p32.dtype)),
                    m32.astype(m.dtype), v32.astype(v.dtype))

        out = jax.tree.map(leaf, masters if self.master else params,
                           opt_state["mu"], opt_state["nu"], grads)
        _istup = lambda o: isinstance(o, tuple)  # noqa: E731
        new_p32 = jax.tree.map(lambda o: o[0], out, is_leaf=_istup)
        new_mu = jax.tree.map(lambda o: o[1], out, is_leaf=_istup)
        new_nu = jax.tree.map(lambda o: o[2], out, is_leaf=_istup)
        new_opt = {"mu": new_mu, "nu": new_nu}
        if self.master:
            new_opt["master"] = new_p32
            new_params = jax.tree.map(
                lambda p32, p: p32.astype(p.dtype), new_p32, params)
        else:
            new_params = new_p32
        return new_params, new_opt


def build_optimizer(
    spec: str,
    clip_grad_norm: float = 0.0,
    accumulate_gradients: int = 1,
    weight_decay: float = 0.0,
    guard_nonfinite: bool = False,
) -> Tuple[optax.GradientTransformation, Callable]:
    """Build the optax chain from a reference-style spec string.

    Returns (optimizer, lr_schedule) — the schedule is exposed for logging.
    """
    name, kw = parse_optim_spec(spec)
    beta1 = kw.pop("beta1", 0.9)
    beta2 = kw.pop("beta2", 0.999)
    eps = kw.pop("eps", 1e-8)
    lr = kw.pop("lr", 1e-3)
    wd = kw.pop("weight_decay", weight_decay)
    # first-moment dtype: "bfloat16" halves the HBM traffic of the largest
    # optimizer buffers (mu is smooth; nu stays fp32 — optax exposes only mu)
    _dt = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
           "float32": None, None: None}
    mu_dtype = _dt[kw.pop("mu_dtype", None)]
    nu_dtype = _dt[kw.pop("nu_dtype", None)]
    fused = bool(kw.pop("fused", 0))

    if fused:
        if name == "adam_inverse_sqrt":
            schedule = inverse_sqrt_schedule(
                lr,
                warmup_updates=int(kw.pop("warmup_updates", 4000)),
                warmup_init_lr=kw.pop("warmup_init_lr", 1e-7),
                exp_factor=kw.pop("exp_factor", 0.5))
        elif name == "adam_cosine":
            schedule = cosine_schedule(
                lr,
                warmup_updates=int(kw.pop("warmup_updates", 4000)),
                warmup_init_lr=kw.pop("warmup_init_lr", 1e-7))
        elif name == "adam":
            schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        else:
            raise ValueError(f"fused=1 supports adam variants, not {name!r}")
        assert accumulate_gradients <= 1 and not wd and not guard_nonfinite, \
            "fused=1 composes with plain adam only (no accum/wd/guard)"
        tx = FusedAdam(schedule, beta1=beta1, beta2=beta2, eps=eps,
                       clip_norm=clip_grad_norm, mu_dtype=mu_dtype,
                       nu_dtype=nu_dtype, master=bool(kw.pop("master", 0)))
        return tx, schedule

    if name == "adam_inverse_sqrt":
        schedule = inverse_sqrt_schedule(
            lr,
            warmup_updates=int(kw.pop("warmup_updates", 4000)),
            warmup_init_lr=kw.pop("warmup_init_lr", 1e-7),
            exp_factor=kw.pop("exp_factor", 0.5),
        )
        core = optax.adamw(schedule, b1=beta1, b2=beta2, eps=eps,
                           weight_decay=wd, mu_dtype=mu_dtype) if wd else \
            optax.adam(schedule, b1=beta1, b2=beta2, eps=eps,
                       mu_dtype=mu_dtype)
    elif name == "adam_cosine":
        schedule = cosine_schedule(
            lr,
            warmup_updates=int(kw.pop("warmup_updates", 4000)),
            warmup_init_lr=kw.pop("warmup_init_lr", 1e-7),
            min_lr=kw.pop("min_lr", 1e-9),
            init_period=int(kw.pop("init_period", 1000000)),
            period_mult=kw.pop("period_mult", 1.0),
            lr_shrink=kw.pop("lr_shrink", 0.75),
        )
        core = optax.adam(schedule, b1=beta1, b2=beta2, eps=eps,
                          mu_dtype=mu_dtype)
    elif name == "adam":
        schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        core = optax.adamw(lr, b1=beta1, b2=beta2, eps=eps,
                           weight_decay=wd, mu_dtype=mu_dtype) if wd else \
            optax.adam(lr, b1=beta1, b2=beta2, eps=eps, mu_dtype=mu_dtype)
    elif name == "sgd":
        schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        core = optax.sgd(lr, momentum=kw.pop("momentum", 0.0))
    elif name == "adagrad":
        schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        core = optax.adagrad(lr)
    elif name == "rmsprop":
        schedule = lambda step: jnp.asarray(lr)  # noqa: E731
        core = optax.rmsprop(lr)
    else:
        raise ValueError(f"unknown optimizer: {name!r}")

    chain = []
    if guard_nonfinite:
        chain.append(skip_nonfinite())
    if clip_grad_norm and clip_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    chain.append(core)
    tx = optax.chain(*chain)
    if accumulate_gradients > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_gradients)
    return tx, schedule
