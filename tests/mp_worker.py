"""Worker for the REAL 2-process `jax.distributed` test (test_multiprocess.py).

Launched as: ``python tests/mp_worker.py <process_id> <nprocs> <port> <outdir>``.
Each worker is a separate OS process with its own JAX runtime (4 virtual CPU
devices), connected through the distributed coordination service — the
actual multi-host wiring of the framework, not the in-process simulation of
`test_eval.py::test_retrieval_grid_process_sharding_merges`.  Exercised:

* `auto_init_distributed()` env bootstrap — the launcher contract
  (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), the
  TPU-native analog of the reference's SLURM env detection
  (`/root/reference/M3P/src/slurm.py:60-127`).
* process-interleaved retrieval grid scoring + `merge_process_scores`
  (cross-process allgather) — replaces the reference's per-rank `.npy`
  dumps + offline merge (`xevaluator.py:1616-1619`).
* a jitted reduction over a GLOBAL mesh spanning both processes' devices
  (cross-process all-reduce compiled by XLA) — the mechanism DP gradient
  sync uses on real multi-host pods.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mp_env  # noqa: E402

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

mp_env.setup(pid, nproc, port)

import jax  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from m3p_tpu.parallel.mesh import auto_init_distributed, make_mesh  # noqa: E402
from m3p_tpu.config import MeshConfig, small_test_config  # noqa: E402
from m3p_tpu.model import build_model  # noqa: E402
from m3p_tpu.eval.retrieval import (  # noqa: E402
    merge_process_scores, retrieval_grid_scores)


def main():
    assert auto_init_distributed(), "env bootstrap did not trigger"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid, jax.process_index()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    # --- process-sharded retrieval grid + cross-process merge -------------
    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    n_img, n_cap, S, R = 4, 6, 10, 8
    cap_tokens = rng.randint(4, 500, (n_cap, S)).astype(np.int32)
    cap_len = np.full(n_cap, S, np.int32)
    feats = rng.randn(n_img, R, 2048).astype(np.float32)
    locs = rng.rand(n_img, R, 5).astype(np.float32)
    img_len = np.full(n_img, R, np.int32)

    part = retrieval_grid_scores(
        model, params, cap_tokens, cap_len, feats, locs, img_len,
        chunk_size=4, process_index=jax.process_index(),
        process_count=jax.process_count())
    scored_here = int((part != 0).sum())
    merged = merge_process_scores(part)

    # --- jitted reduction over a global mesh (cross-process all-reduce) ---
    mesh = make_mesh(MeshConfig(data=-1, fsdp=1, seq=1, tensor=1))
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    local = np.full((n_local, 2), float(pid + 1), np.float32)
    global_arr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    total = jax.jit(jnp.sum, out_shardings=None)(global_arr)
    # the jitted reduction's output is replicated over the global mesh;
    # float() is legal on fully-replicated global arrays
    total = float(total)

    np.savez(os.path.join(outdir, f"out_{pid}.npz"),
             merged=merged, scored_here=scored_here, total=total,
             n_global=n_global)
    print(f"worker {pid}: ok (scored {scored_here} entries, total={total})",
          flush=True)


if __name__ == "__main__":
    main()
