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


@pytest.mark.slow
def test_two_process_full_cli(tmp_path):
    """The FULL CLI as a 2-process multi-host job: global 8-device mesh,
    per-process Grain shards assembled into global batches, COLLECTIVE
    Orbax checkpoint save, then a 2-process --eval_only resume that must
    reproduce the scores byte-identically on both hosts."""
    import pickle
    import subprocess as sp

    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram

    data = tmp_path / "data"
    (data / "coco").mkdir(parents=True)
    rng = np.random.RandomState(0)
    words = ["red", "cat", "dog", "tree", "house", "runs", "blue", "small"]
    corpus = [" ".join(rng.choice(words, 6)) for _ in range(400)]
    train_unigram(corpus, vocab_size=90).save(str(data / "vocab.tsv"))
    n, r = 24, 6
    for split in ("train", "test"):
        write_feature_shard(
            str(data / "coco" / f"{split}.h5"),
            features=rng.randn(n, r, 2048).astype(np.float32),
            boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
            num_boxes=np.full(n, r, np.int64),
            wh=np.full((n, 2), 100, np.float32),
            image_ids=[f"{split}{k}" for k in range(n)])
        caps = {f"{split}{k}": [" ".join(rng.choice(words, 4))
                                for _ in range(2)] for k in range(n)}
        with open(data / "coco" / f"{split}.en.pkl", "wb") as f:
            pickle.dump(caps, f)
    # binarized mono stream for the mlm task
    from m3p_tpu.cli.preprocess import main as preprocess_main

    (data / "corpus.txt").write_text("\n".join(corpus))
    preprocess_main(["binarize", str(data / "corpus.txt"),
                     "--vocab", str(data / "vocab.tsv"),
                     "--out", str(data / "train.en.npy")])
    (data / "valid.en.npy").write_bytes(
        (data / "train.en.npy").read_bytes())

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mp_cli_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}

    def run(extra):
        port = _free_port()
        procs = [sp.Popen(
            [sys.executable, worker, str(i), "2", str(port),
             str(data), str(tmp_path / "dump")] + extra,
            env=env, stdout=sp.PIPE, stderr=sp.STDOUT, text=True)
            for i in range(2)]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    run([])                 # train 1 epoch + eval + collective save
    log = (tmp_path / "dump" / "mh" / "1" / "train.log").read_text()
    assert "saved checkpoint checkpoint" in log
    first = log.rsplit("__log__:", 1)[1].splitlines()[0]

    run(["--eval_only"])    # collective restore on both processes
    log2 = (tmp_path / "dump" / "mh" / "1" / "train.log").read_text()
    assert "resumed from" in log2
    assert log2.rsplit("__log__:", 1)[1].splitlines()[0] == first


@pytest.mark.slow
def test_four_process_pretrain_kill_and_resume(tmp_path):
    """The PRETRAIN family as a 4-process x 2-device multi-host job (round-2
    VERDICT item 6 — beyond 2 processes): shard-scheduled google-img rel task
    (train_order.json) + xMLM, collective Orbax save.  The whole process
    group is SIGTERMed MID-EPOCH (preemption -> collective mid-epoch
    checkpoint incl. per-rank Grain loader state), hard-killed, and
    relaunched: it must resume mid-epoch, finish the epoch, and a final
    4-process --eval_only must reproduce the scores byte-identically."""
    import pickle
    import signal
    import subprocess as sp
    import time

    from m3p_tpu.data.features import write_feature_shard
    from m3p_tpu.tokenization.unigram import train_unigram

    data = tmp_path / "data"
    (data / "google").mkdir(parents=True)
    (data / "order").mkdir()
    rng = np.random.RandomState(0)
    words = ["red", "cat", "dog", "tree", "house", "runs", "blue", "small"]
    corpus = [" ".join(rng.choice(words, 6)) for _ in range(400)]
    train_unigram(corpus, vocab_size=90).save(str(data / "vocab.tsv"))
    # 64 images/shard: 4 processes x bs 2 x up-to-4 grain workers must each
    # still fill whole batches after double (process, worker) sharding
    n, r = 64, 4
    for shard in (0, 1):
        write_feature_shard(
            str(data / "google" / f"train.{shard}.h5"),
            features=rng.randn(n, r, 2048).astype(np.float32),
            boxes=np.abs(rng.rand(n, r, 4)).astype(np.float32) * 50,
            num_boxes=np.full(n, r, np.int64),
            wh=np.full((n, 2), 100, np.float32),
            image_ids=[f"g{shard}_{k}" for k in range(n)])
        caps = {f"g{shard}_{k}": [" ".join(rng.choice(words, 4))
                                  for _ in range(2)] for k in range(n)}
        with open(data / "google" / f"train.{shard}.en.pkl", "wb") as f:
            pickle.dump(caps, f)
    with open(data / "order" / "google_train_order.json", "w") as f:
        f.write("[[0, 1], [1, 0]]")
    from m3p_tpu.cli.preprocess import main as preprocess_main

    (data / "corpus.txt").write_text("\n".join(corpus))
    preprocess_main(["binarize", str(data / "corpus.txt"),
                     "--vocab", str(data / "vocab.tsv"),
                     "--out", str(data / "train.en.npy")])
    (data / "valid.en.npy").write_bytes((data / "train.en.npy").read_bytes())

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mp_pretrain_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    log_path = tmp_path / "dump" / "mh4" / "1" / "train.log"

    def launch(extra):
        port = _free_port()
        return [sp.Popen(
            [sys.executable, worker, str(i), "4", str(port),
             str(data), str(tmp_path / "dump")] + extra,
            env=env, stdout=sp.PIPE, stderr=sp.STDOUT, text=True)
            for i in range(4)]

    def wait_for(needle, timeout, procs):
        t0 = time.time()
        while time.time() - t0 < timeout:
            if log_path.exists() and needle in log_path.read_text():
                return
            if all(p.poll() is not None for p in procs):
                break
            time.sleep(0.1)
        for p in procs:
            p.kill()
        tails = "\n---\n".join(
            (p.communicate(timeout=30)[0] or "")[-2000:] for p in procs)
        raise AssertionError(
            f"'{needle}' never appeared in {log_path}:\n"
            f"{log_path.read_text()[-3000:] if log_path.exists() else ''}"
            f"\nworker tails:\n{tails}")

    # ---- phase A: train, SIGTERM the group mid-epoch, hard-kill ----------
    procs = launch([])
    try:
        wait_for("iter 20 -", 900, procs)      # training is underway
        for p in procs:
            p.send_signal(signal.SIGTERM)       # preemption notice
        wait_for("saved checkpoint", 300, procs)
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait(timeout=60)
    log = log_path.read_text()
    assert "saved checkpoint checkpoint" in log
    assert "resumed" not in log

    # ---- phase B: relaunch; must resume MID-EPOCH and finish -------------
    procs = launch([])
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    log = log_path.read_text()
    assert "resumed MID-EPOCH from" in log
    assert "__log__" in log
    first = log.rsplit("__log__:", 1)[1].splitlines()[0]

    # ---- phase C: 4-process --eval_only reproduces byte-identically ------
    procs = launch(["--eval_only"])
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    log2 = log_path.read_text()
    assert log2.rsplit("__log__:", 1)[1].splitlines()[0] == first


def test_save_decision_cadence(monkeypatch):
    """_should_save_now allgathers only every save_check_every boundaries in
    multi-process runs (measured 16.1ms/step at 4 procs otherwise —
    tools/bench_save_decision.py), never consults the local flag in between
    (the asymmetric path is the deadlock), and stays per-step when single
    process."""
    from types import SimpleNamespace

    import jax
    from jax.experimental import multihost_utils

    from m3p_tpu.train.trainer import Trainer

    calls = []

    def fake_allgather(x):
        calls.append(float(x))
        return np.array([0.0, float(x)])  # rank 1 pending iff x

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)

    stub = SimpleNamespace(cfg=SimpleNamespace(save_check_every=10),
                           _pending_save=False, n_total_iter=0)
    should = Trainer._should_save_now

    # off-cadence boundaries never allgather, even with the flag set locally
    stub._pending_save = True
    for it in range(1, 10):
        stub.n_total_iter = it
        assert should(stub) is False
    assert calls == []
    # the cadence boundary checks collectively and sees the pending rank
    stub.n_total_iter = 10
    assert should(stub) is True
    assert len(calls) == 1
    # cadence boundary with nothing pending anywhere -> no save
    stub._pending_save = False
    stub.n_total_iter = 20
    assert should(stub) is False
    assert len(calls) == 2

    # single process: local flag, no collective, every step
    monkeypatch.setattr(jax, "process_count", lambda: 1)
    stub._pending_save = True
    stub.n_total_iter = 3
    assert should(stub) is True
    assert len(calls) == 2
