"""Measure the multi-process save-decision overhead (VERDICT r3 item 5).

`Trainer._should_save_now` must be a COLLECTIVE decision in multi-process
runs (a lone rank entering the Orbax save barrier while the rest block in the
next step's psum is a deadlock — found by the 4-process kill-and-resume
test).  The original design paid one `process_allgather` per step boundary:
a blocking host round-trip (DCN on a real pod).  This tool quantifies that
cost at 4 processes and the amortized every-N variant the Trainer now uses.

Usage:  python tools/bench_save_decision.py [--steps 300] [--nproc 4]

Prints (rank 0) one JSON line:
  {"per_step_ms": {"baseline": ..., "allgather_every_1": ...,
                   "allgather_every_10": ...}, "overhead_every_1_ms": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def worker(steps: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from m3p_tpu.parallel.mesh import auto_init_distributed

    auto_init_distributed()

    @jax.jit
    def step(x):
        return x @ x + 1.0

    x = jnp.ones((256, 256), jnp.float32)
    # warm up compile + collective channel
    x = step(x)
    float(x[0, 0])
    multihost_utils.process_allgather(np.float32(0.0))

    def run(check_every: int | None) -> float:
        nonlocal x
        t0 = time.perf_counter()
        for i in range(steps):
            x = step(x)
            if check_every and (i % check_every == 0):
                flag = multihost_utils.process_allgather(np.float32(0.0))
                assert float(np.max(flag)) == 0.0
        float(x[0, 0])  # sync
        return (time.perf_counter() - t0) / steps * 1000.0

    results = {
        "baseline": run(None),
        "allgather_every_1": run(1),
        "allgather_every_10": run(10),
    }
    if jax.process_index() == 0:
        out = {
            "nproc": jax.process_count(),
            "steps": steps,
            "per_step_ms": {k: round(v, 4) for k, v in results.items()},
            "overhead_every_1_ms": round(
                results["allgather_every_1"] - results["baseline"], 4),
            "overhead_every_10_ms": round(
                results["allgather_every_10"] - results["baseline"], 4),
        }
        print("RESULT " + json.dumps(out), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--nproc", type=int, default=4)
    args = p.parse_args()

    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(args.nproc):
        env = dict(os.environ,
                   XLA_FLAGS="--xla_force_host_platform_device_count=2",
                   JAX_PLATFORMS="cpu",
                   JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES=str(args.nproc),
                   JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu'); "
             "import sys; sys.path.insert(0, %r); "
             "from tools.bench_save_decision import worker; worker(%d)"
             % (REPO, args.steps)],
            env=env, cwd=REPO,
            stdout=None if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if pid == 0 else subprocess.DEVNULL))
    rc = [q.wait(timeout=600) for q in procs]
    assert all(r == 0 for r in rc), rc


if __name__ == "__main__":
    main()
