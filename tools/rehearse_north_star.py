"""Full-dress north-star rehearsal: the reference README recipe end-to-end.

One command chain on the faux-Multi30K corpus, through the REAL CLI
(`m3p_tpu.cli.train_x`) as separate OS processes — the reference's
pretrain -> fine-tune -> evaluate workflow for BOTH flagship task families
(`/root/reference/README.md:158-216`, captioning eval
`/root/reference/M3P/src/evaluation/xevaluator.py:903-1117`), at the
reference RECIPE SHAPES by default (max_len 64, 100 regions, bs 24 x
grad-accum 4, flagship 12L/768d — epochs reduced; the recipe's 150x150k
epoch schedule is a multi-week cluster run):

  0. corpus    make_soak_corpus: 1000 train + 1000 test images x 5 captions
               per language (the Multi30K test-grid shape: 1000 x 5000),
               8 CC-layout pretrain shards + train_order.json, en/de text
               streams binarized to {train,valid}.<lang>.npy.
  1. pretrain  CLI `--is_pretrain`: MCT rel over the google shards on the
               shard schedule + xMLM en,de streams.
  2. finetune  CLI multi-language retrieval (`--ft_lgs en-de`) from the
               pretrained checkpoint (`--reload_model <orbax dir>`, weights
               only, fresh optimizer — the recipe's .pth reload analogue),
               per-epoch evals capped at --eval_images 150 for speed.
  3. caption   CLI captioning fine-tune (`--cross_modal_steps coco-img
               --is_generation`) from the SAME pretrain checkpoint — the
               reference's second flagship workflow.
  4. caption_eval  CLI `--eval_only` beam-5 decode over every test image,
               all four caption metrics (Bleu/METEOR/ROUGE_L/CIDEr) — run
               EXACT then `--fast_beam` (approx top-k), metrics + wall-clock
               for both ride in the report.
  5. eval      CLI `--eval_only` over the FULL 1000x5000 retrieval grid per
               language (--eval_images -1) — run --eval_repeats times; all
               score lines must be byte-identical (checkpoint restore is
               exact).

Phase completion is stamped in ``<root>/stamps/<phase>.done`` written as the
LAST act of each phase — a killed phase re-runs on resume (keying on an
early artifact like vocab.tsv once skipped a half-built corpus; the loader's
fail-fast caught it, the resume logic now cannot).

Wall-clock per phase and per-language metrics land in <root>/report.json.

Usage:
  python tools/rehearse_north_star.py --root /tmp/northstar          # full
  python tools/rehearse_north_star.py --root /tmp/ns --quick --cpu   # smoke
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


# --------------------------------------------------------------------------
# phase-completion stamps (unit-tested in tests/test_rehearsal.py)
# --------------------------------------------------------------------------

def phase_done(root: str, name: str) -> bool:
    """True iff the phase stamped completion.  The stamp is written as the
    phase's LAST act, so a partially-built phase (e.g. vocab.tsv present but
    train.de.npy missing after a kill) re-runs."""
    return os.path.exists(os.path.join(root, "stamps", f"{name}.done"))


def mark_done(root: str, name: str) -> None:
    os.makedirs(os.path.join(root, "stamps"), exist_ok=True)
    with open(os.path.join(root, "stamps", f"{name}.done"), "w") as fh:
        fh.write(f"{time.time()}\n")


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


def parse_scores(line: str) -> dict:
    """Metric dict from the logged repr (values may be numpy scalars whose
    repr literal_eval can't parse)."""
    import re

    pairs = re.findall(r"'([^']+)':\s*(?:np\.\w+\()?([-\d.eE+]+)\)?", line)
    return {k: float(v) for k, v in pairs}


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes (CI smoke): 2L model, 60x300 grid")
    p.add_argument("--cpu", action="store_true",
                   help="run the CLI phases on CPU (smoke only)")
    # reference recipe shapes (`/root/reference/README.md:158-216`):
    # max_len 64, 100 regions, bs 24 x accumulate_gradients 4, 12L/768d
    p.add_argument("--regions", type=int, default=100)
    p.add_argument("--max_len", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--accum", type=int, default=4)
    # epochs REDUCED vs the recipe's 150x150k (multi-week at cluster scale)
    p.add_argument("--pretrain_epochs", type=int, default=1)
    p.add_argument("--pretrain_epoch_size", type=int, default=12800)
    p.add_argument("--ft_epochs", type=int, default=4)
    p.add_argument("--ft_epoch_size", type=int, default=4096)
    p.add_argument("--cap_epochs", type=int, default=2)
    p.add_argument("--cap_epoch_size", type=int, default=4096)
    p.add_argument("--eval_repeats", type=int, default=2,
                   help="full-grid --eval_only runs; all score lines must "
                        "be byte-identical")
    # the recipe's adam_inverse_sqrt warmup (4000 updates) is sized for its
    # 150x150k-sample schedule; a reduced rehearsal finishes INSIDE that
    # warmup (lr peaked at ~3e-6 of the 5e-5 target and retrieval stayed at
    # chance).  The lr and optimizer family stay the recipe's; only the
    # warmup horizon scales with the reduced run.
    p.add_argument("--warmup_updates", type=int, default=100)
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

    n_test = 60 if args.quick else 1000
    n_train = 100 if args.quick else 1000
    model_flags = (["--emb_dim", "128", "--n_layers", "2", "--n_heads", "4",
                    "--n_dec_layers", "1", "--refine_layers", "1"]
                   if args.quick else
                   # flagship: the CLI defaults (12L/768d/12h, refine 3)
                   [])
    if args.quick:
        args.pretrain_epoch_size = args.ft_epoch_size = 512
        args.cap_epoch_size = 256
        args.batch_size, args.accum = 16, 1
        args.regions, args.max_len = 20, 16

    report: dict = {"phases": {}, "config": vars(args)}
    # a resumed root keeps the wall-clocks/scores of already-done phases
    report_path = os.path.join(root, "report.json")
    if os.path.exists(report_path):
        try:
            prior = json.load(open(report_path))
            report["phases"].update(prior.get("phases", {}))
        except (ValueError, OSError):
            pass

    def flush_report():
        with open(report_path, "w") as fh:
            json.dump(report, fh, indent=2)

    # ---- phase 0: corpus -------------------------------------------------
    if not phase_done(root, "corpus"):
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
        mark_done(root, "corpus")
        flush_report()

    common = [
        "--data_path", data, "--vocab_path", os.path.join(data, "vocab.tsv"),
        "--dump_path", dump, "--batch_size", str(args.batch_size),
        "--accumulate_gradients", str(args.accum),
        "--max_region_num", str(args.regions),
        "--max_len", str(args.max_len), "--bptt", str(args.max_len),
        "--sample_n", "4",
        "--optimizer", ("adam_inverse_sqrt,beta1=0.9,beta2=0.98,lr=0.00005,"
                        f"warmup_updates={args.warmup_updates}"),
    ] + model_flags

    # ---- phase 1: pretrain ----------------------------------------------
    pre_dump = os.path.join(dump, "pretrain", "1")
    if not phase_done(root, "pretrain"):
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
        mark_done(root, "pretrain")
        flush_report()

    # ---- phase 2: multi-language retrieval fine-tune --------------------
    ft_flags = cli + [
        "--lgs", "en-de", "--ft_lgs", "en-de",
        "--cross_rel_steps", "coco-img",
        "--coco_path", os.path.join(data, "coco"),
        "--exp_name", "finetune", "--exp_id", "1",
    ] + common
    ft_dump = os.path.join(dump, "finetune", "1")
    ft_log = os.path.join(ft_dump, "train.log")
    if not phase_done(root, "finetune"):
        dt = run_phase("finetune", ft_flags + [
            "--reload_model", os.path.join(pre_dump, "checkpoint"),
            "--epoch_size", str(args.ft_epoch_size),
            "--max_epoch", str(args.ft_epochs),
            "--eval_images", "150",     # cap per-epoch monitoring evals
        ], os.path.join(logs, "finetune.log"))
        report["phases"]["finetune"] = {"wall_s": round(dt, 1),
                                        "last_scores": last_score_line(ft_log)}
        mark_done(root, "finetune")
        flush_report()

    # ---- phase 3: captioning fine-tune (the 2nd flagship workflow) ------
    cap_flags = cli + [
        "--lgs", "en-de", "--cross_modal_steps", "coco-img",
        "--is_generation", "True",
        "--coco_path", os.path.join(data, "coco"),
        "--coco_method", "Bleu,METEOR,ROUGE_L,CIDEr",
        "--exp_name", "caption", "--exp_id", "1",
    ] + common
    cap_dump = os.path.join(dump, "caption", "1")
    cap_log = os.path.join(cap_dump, "train.log")
    if not phase_done(root, "caption"):
        dt = run_phase("caption", cap_flags + [
            "--reload_model", os.path.join(pre_dump, "checkpoint"),
            "--epoch_size", str(args.cap_epoch_size),
            "--max_epoch", str(args.cap_epochs),
            "--beam_size", "1",         # greedy monitoring decodes
        ], os.path.join(logs, "caption.log"))
        report["phases"]["caption"] = {"wall_s": round(dt, 1),
                                       "last_scores": last_score_line(cap_log)}
        mark_done(root, "caption")
        flush_report()

    # ---- phase 4: caption eval — beam-5 EXACT vs --fast_beam ------------
    beam = "2" if args.quick else "5"
    if not phase_done(root, "caption_eval"):
        for mode, extra in (("exact", []), ("fast", ["--fast_beam", "True"])):
            # --eval_path: the decoded hypotheses land as
            # caption_translate.<lang>.json artifacts (the reference's
            # caption export, `xevaluator.py:986-993`) — without them an
            # all-zero metric can't be diagnosed post-hoc
            hyp_dir = os.path.join(root, f"hyps_{mode}")
            dt = run_phase(f"caption_eval_{mode}", cap_flags + [
                "--eval_only", "True", "--beam_size", beam,
                "--eval_path", hyp_dir] + extra,
                os.path.join(logs, f"caption_eval_{mode}.log"))
            line = last_score_line(cap_log)
            report["phases"][f"caption_eval_{mode}"] = {
                "wall_s": round(dt, 1), "scores": line, "hyp_dir": hyp_dir,
                "metrics": {k: v for k, v in parse_scores(line).items()
                            if "caption" in k}}
        mark_done(root, "caption_eval")
        flush_report()

    # ---- phase 5: FULL-GRID retrieval --eval_only, byte-identical -------
    lines = []
    for rep in range(args.eval_repeats):
        tag = chr(ord("a") + rep)
        dt = run_phase(f"eval_only_{tag}", ft_flags + [
            "--eval_only", "True", "--eval_images", "-1",
        ], os.path.join(logs, f"eval_only_{tag}.log"))
        line = last_score_line(ft_log)
        lines.append(line)
        report["phases"][f"eval_only_{tag}"] = {"wall_s": round(dt, 1),
                                                "scores": line}
        flush_report()
    assert all(ln == lines[0] for ln in lines), (
        "eval_only reproduction NOT byte-identical:\n" +
        "\n".join(f"{i}: {ln}" for i, ln in enumerate(lines)))
    report["byte_identical_eval"] = len(lines) > 1

    # headline per-language R@k
    report["full_grid_scores"] = {
        k: v for k, v in parse_scores(lines[0]).items()
        if any(t in k for t in ("r1", "r5", "r10", "recall", "acc"))}
    flush_report()
    print(json.dumps(report, indent=2))
    print(f"\nreport -> {report_path}")


if __name__ == "__main__":
    main()
