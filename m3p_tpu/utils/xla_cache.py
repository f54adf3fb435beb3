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

    Without the env override, the cache auto-enables ONLY for single-process
    runs on a non-CPU backend.  The cache exists for the tunneled TPU's
    5-25 min remote compiles; everywhere else it is all risk, no reward —
    both failure modes were OBSERVED in the 4-process CPU kill-and-resume
    test the moment the cache shipped un-gated:

    * XLA:CPU serializes AOT machine code whose target features can
      mismatch at load time (`cpu_aot_loader: Target machine feature
      +prefer-no-gather is not supported on the host machine ... SIGILL`),
      stalling workers that hit a cache written by a sibling process.
    * Multi-process ranks race on the shared directory, and a killed run
      (preemption -> SIGTERM -> collective checkpoint -> relaunch is a
      supported path) leaves it partially populated: on resume, cache-hit
      ranks enter the first collective in milliseconds while the rest
      recompile for minutes, and the 30 s CPU/Gloo rendezvous times out
      (`GetKeyValue() timed out ... cpu:gloo/...`).

    An explicit ``M3P_XLA_CACHE=<dir>`` (or ``path`` argument) is operator
    intent and force-enables at that location regardless of backend.
    """
    import jax

    env = os.environ.get("M3P_XLA_CACHE")
    if env == "0":
        return ""
    if not (env or path):
        # auto mode: remote-compile chip only — compile-time symmetry
        # matters more than warm starts wherever ranks must rendezvous,
        # and XLA:CPU AOT deserialization is not trustworthy across procs
        if jax.process_count() > 1 or jax.default_backend() == "cpu":
            return ""
    cache_dir = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "m3p_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took meaningful compile time; the default (1s)
    # would skip mid-sized eval graphs that still cost minutes remotely
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
