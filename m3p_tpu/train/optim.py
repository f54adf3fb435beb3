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
    mu_dtype = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                "float32": None, None: None}[kw.pop("mu_dtype", None)]

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
