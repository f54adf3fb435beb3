"""REAL multi-process distributed runtime test.

Spawns two OS processes, each with its own JAX runtime (4 virtual CPU
devices), connected via `jax.distributed` (Gloo collectives) — validating
the multi-host mechanisms (`auto_init_distributed`, cross-process eval
merge, global-mesh all-reduce) with actual process boundaries instead of
the in-process simulations used elsewhere in the suite.  This is the
closest a single machine gets to the reference's multi-node SLURM launch
(`/root/reference/M3P/src/slurm.py:46-170`).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mp_worker.py")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
                        "JAX_NUM_PROCESSES", "JAX_PROCESS_ID")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    r0 = np.load(tmp_path / "out_0.npz")
    r1 = np.load(tmp_path / "out_1.npz")

    # both processes saw the same 8-device global topology
    assert int(r0["n_global"]) == int(r1["n_global"]) == 8

    # each process scored a strict subset; the allgather-merged matrices are
    # identical on both hosts and fully populated
    full = int(r0["merged"].size)
    assert 0 < int(r0["scored_here"]) < full
    assert 0 < int(r1["scored_here"]) < full
    assert int(r0["scored_here"]) + int(r1["scored_here"]) == full
    np.testing.assert_allclose(r0["merged"], r1["merged"], atol=1e-6)

    # single-process golden: the merged grid must equal the unsharded scores
    from m3p_tpu.config import small_test_config
    from m3p_tpu.model import build_model
    from m3p_tpu.eval.retrieval import retrieval_grid_scores
    import jax

    cfg = small_test_config()
    model, params = build_model(cfg.model, jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    n_img, n_cap, S, R = 4, 6, 10, 8
    cap_tokens = rng.randint(4, 500, (n_cap, S)).astype(np.int32)
    cap_len = np.full(n_cap, S, np.int32)
    feats = rng.randn(n_img, R, 2048).astype(np.float32)
    locs = rng.rand(n_img, R, 5).astype(np.float32)
    img_len = np.full(n_img, R, np.int32)
    golden = retrieval_grid_scores(model, params, cap_tokens, cap_len, feats,
                                   locs, img_len, chunk_size=4)
    np.testing.assert_allclose(r0["merged"], golden, atol=1e-5)

    # cross-process all-reduce over the global mesh: hosts contributed
    # 4x2 ones and 4x2 twos -> 8 + 16
    assert float(r0["total"]) == float(r1["total"]) == 24.0
