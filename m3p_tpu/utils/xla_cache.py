"""Persistent XLA compilation cache.

Flagship-shape graphs take 5-25 min each to compile on the tunneled TPU
backend (remote compile, latency highly variable — STATUS round-2 notes),
and every CLI phase of a multi-phase workflow (pretrain -> fine-tune ->
eval, `tools/rehearse_north_star.py`) is a fresh process that would
recompile identical graphs from scratch.  The reference amortizes nothing
here either (torch re-JITs per process), but on TPU the compile cost is the
dominant fixed cost of short runs, so an on-disk cache is the difference
between a 2-minute and a 25-minute `--eval_only` repeat.

JAX's persistent cache is keyed by (HLO, compile options, backend
version); backends whose PJRT plugin cannot serialize executables simply
log a warning and skip caching — enabling it is always safe.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    ``M3P_XLA_CACHE`` overrides the location; ``M3P_XLA_CACHE=0`` disables.
    Returns the cache dir ("" when disabled).
    """
    import jax

    env = os.environ.get("M3P_XLA_CACHE")
    if env == "0":
        return ""
    cache_dir = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "m3p_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took meaningful compile time; the default (1s)
    # would skip mid-sized eval graphs that still cost minutes remotely
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
