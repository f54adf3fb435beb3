"""Full-dress north-star rehearsal: the reference README recipe end-to-end.

One command chain on the faux-Multi30K corpus, through the REAL CLI
(`m3p_tpu.cli.train_x`) as separate OS processes — exactly the reference's
pretrain -> fine-tune -> evaluate workflow (`/root/reference/README.md:158-216`):

  0. corpus   make_soak_corpus: 1000 train + 1000 test images x 5 captions
              per language (the Multi30K test-grid shape: 1000 x 5000),
              8 CC-layout pretrain shards + train_order.json, en/de text
              streams binarized to {train,valid}.<lang>.npy.
  1. pretrain CLI `--is_pretrain`: MCT rel over the google shards on the
              shard schedule + xMLM en,de streams.
  2. finetune CLI multi-language retrieval (`--ft_lgs en-de`) from the
              pretrained checkpoint (`--reload_model <orbax dir>`, weights
              only, fresh optimizer — the recipe's .pth reload analogue),
              per-epoch evals capped at --eval_images 150 for speed.
  3. eval     CLI `--eval_only` over the FULL 1000x5000 grid per language
              (--eval_images -1) — run TWICE; the two score lines must be
              byte-identical (checkpoint restore is exact).

Wall-clock per phase and per-language R@k land in <root>/report.json.

Usage:
  python tools/rehearse_north_star.py --root /tmp/northstar          # full
  python tools/rehearse_north_star.py --root /tmp/ns --quick         # smoke
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# `JAX_PLATFORMS=cpu` env is overridden by the axon sitecustomize; forcing
# CPU (for the --quick smoke, so it never contends for the one TPU chip)
# must happen via jax.config BEFORE the CLI touches devices.
CPU_STUB = (
    "import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
    "from m3p_tpu.cli.train_x import main; "
    "sys.argv = ['train_x.py'] + sys.argv[1:]; main()")


def run_phase(name: str, cmd: list, log_path: str, env=None) -> float:
    print(f"[{name}] {' '.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                              cwd=REPO, env=env)
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        tail = open(log_path).read()[-4000:]
        raise SystemExit(f"phase {name} failed (rc={proc.returncode}, "
                         f"{dt:.0f}s):\n{tail}")
    print(f"[{name}] done in {dt / 60:.1f} min", flush=True)
    return dt


def last_score_line(train_log: str) -> str:
    """The evaluator's final `__log__:{scores}` line (verbatim)."""
    lines = [ln.split("__log__:", 1)[1] for ln in
             open(train_log).read().splitlines() if "__log__:" in ln]
    if not lines:
        raise SystemExit(f"no __log__ score line in {train_log}")
    return lines[-1]


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes (CI smoke): 2L model, 60x300 grid")
    p.add_argument("--cpu", action="store_true",
                   help="run the CLI phases on CPU (smoke only)")
    p.add_argument("--regions", type=int, default=20)
    p.add_argument("--pretrain_epochs", type=int, default=2)
    p.add_argument("--pretrain_epoch_size", type=int, default=25600)
    p.add_argument("--ft_epochs", type=int, default=6)
    p.add_argument("--ft_epoch_size", type=int, default=8192)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--fresh", action="store_true",
                   help="wipe --root first (default resumes/reuses)")
    args = p.parse_args(argv)

    root = os.path.abspath(args.root)
    if args.fresh and os.path.isdir(root):
        shutil.rmtree(root)
    data = os.path.join(root, "data")
    dump = os.path.join(root, "dump")
    logs = os.path.join(root, "logs")
    os.makedirs(logs, exist_ok=True)
    py = sys.executable
    cli = [py, "-c", CPU_STUB] if args.cpu else [py, "-m",
                                                 "m3p_tpu.cli.train_x"]
    report: dict = {"phases": {}, "config": vars(args)}

    n_test = 60 if args.quick else 1000
    n_train = 100 if args.quick else 1000
    model_flags = (["--emb_dim", "128", "--n_layers", "2", "--n_heads", "4",
                    "--n_dec_layers", "1", "--refine_layers", "1"]
                   if args.quick else
                   # flagship: the CLI defaults (12L/768d/12h, refine 3)
                   [])
    if args.quick:
        args.pretrain_epoch_size, args.ft_epoch_size = 512, 512
        args.batch_size = 16

    # ---- phase 0: corpus -------------------------------------------------
    if not os.path.exists(os.path.join(data, "vocab.tsv")):
        t0 = time.perf_counter()
        run_phase("corpus", [
            py, os.path.join(HERE, "make_soak_corpus.py"), "--out", data,
            "--train-images", str(n_train), "--test-images", str(n_test),
            "--regions", str(args.regions), "--signed", "--sigma", "0.02",
            "--concepts-per-image", "2", "--pretrain-shards", "8",
            "--shard-images", str(60 if args.quick else 250),
        ], os.path.join(logs, "corpus.log"))
        for lang in ("en", "de"):
            txt = os.path.join(data, f"corpus.{lang}.txt")
            lines = open(txt).read().splitlines()
            cut = max(len(lines) - 500, 1)
            trn, val = lines[:cut], lines[cut:]
            trn_txt = os.path.join(data, f"train.{lang}.txt")
            val_txt = os.path.join(data, f"valid.{lang}.txt")
            open(trn_txt, "w").write("\n".join(trn) + "\n")
            open(val_txt, "w").write("\n".join(val) + "\n")
            for split, path in (("train", trn_txt), ("valid", val_txt)):
                subprocess.run([
                    py, "-m", "m3p_tpu.cli.preprocess", "binarize", path,
                    "--vocab", os.path.join(data, "vocab.tsv"),
                    "--out", os.path.join(data, f"{split}.{lang}.npy")],
                    check=True, cwd=REPO)
        report["phases"]["corpus"] = {
            "wall_s": round(time.perf_counter() - t0, 1)}

    common = [
        "--data_path", data, "--vocab_path", os.path.join(data, "vocab.tsv"),
        "--dump_path", dump, "--batch_size", str(args.batch_size),
        "--max_region_num", str(args.regions), "--max_len", "16",
        "--bptt", "16", "--sample_n", "4",
    ] + model_flags

    # ---- phase 1: pretrain ----------------------------------------------
    pre_dump = os.path.join(dump, "pretrain", "1")
    if not os.path.exists(os.path.join(pre_dump, "checkpoint")):
        dt = run_phase("pretrain", cli + [
            "--is_pretrain", "True",
            "--lgs", "en-de", "--mlm_steps", "en,de",
            "--cross_rel_steps", "google-img",
            "--google_path", os.path.join(data, "google"),
            "--train_order_path", os.path.join(data, "order"),
            "--epoch_size", str(args.pretrain_epoch_size),
            "--max_epoch", str(args.pretrain_epochs),
            "--exp_name", "pretrain", "--exp_id", "1",
        ] + common, os.path.join(logs, "pretrain.log"))
        report["phases"]["pretrain"] = {"wall_s": round(dt, 1)}

    # ---- phase 2: multi-language fine-tune ------------------------------
    ft_flags = cli + [
        "--lgs", "en-de", "--ft_lgs", "en-de",
        "--cross_rel_steps", "coco-img",
        "--coco_path", os.path.join(data, "coco"),
        "--exp_name", "finetune", "--exp_id", "1",
    ] + common
    ft_dump = os.path.join(dump, "finetune", "1")
    ft_log = os.path.join(ft_dump, "train.log")
    if not os.path.exists(os.path.join(ft_dump, "checkpoint")):
        dt = run_phase("finetune", ft_flags + [
            "--reload_model", os.path.join(pre_dump, "checkpoint"),
            "--epoch_size", str(args.ft_epoch_size),
            "--max_epoch", str(args.ft_epochs),
            "--eval_images", "150",     # cap per-epoch monitoring evals
        ], os.path.join(logs, "finetune.log"))
        report["phases"]["finetune"] = {"wall_s": round(dt, 1),
                                        "last_scores": last_score_line(ft_log)}

    # ---- phase 3: FULL-GRID --eval_only, twice, byte-identical ----------
    lines = []
    for rep in ("a", "b"):
        dt = run_phase(f"eval_only_{rep}", ft_flags + [
            "--eval_only", "True", "--eval_images", "-1",
        ], os.path.join(logs, f"eval_only_{rep}.log"))
        line = last_score_line(ft_log)
        lines.append(line)
        report["phases"][f"eval_only_{rep}"] = {"wall_s": round(dt, 1),
                                                "scores": line}
    assert lines[0] == lines[1], (
        "eval_only reproduction NOT byte-identical:\n"
        f"a: {lines[0]}\nb: {lines[1]}")
    report["byte_identical_eval"] = True

    # headline per-language R@k (regex over the logged dict repr — values
    # may be numpy scalars whose repr literal_eval can't parse)
    import re

    pairs = re.findall(r"'([^']+)':\s*(?:np\.\w+\()?([-\d.eE+]+)\)?",
                       lines[0])
    report["full_grid_scores"] = {
        k: float(v) for k, v in pairs
        if any(t in k for t in ("r1", "r5", "r10", "recall", "acc"))}
    out = os.path.join(root, "report.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    print(f"\nreport -> {out}")


if __name__ == "__main__":
    main()
