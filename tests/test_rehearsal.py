"""CI smoke + unit tests for the north-star rehearsal orchestrator.

`tools/rehearse_north_star.py` chains the full reference recipe — corpus ->
CLI pretrain -> retrieval fine-tune -> captioning fine-tune -> caption eval
(exact vs --fast_beam) -> full-grid --eval_only repeats
(`/root/reference/README.md:158-216`, `xevaluator.py:903-1117`) — as
subprocesses.  The full-dress run executes on-chip at reference shapes
(report committed as REHEARSAL_r*.json); this test keeps the ORCHESTRATION
itself exercised in CI at tiny shapes on CPU, so the tool can never regress
back into unexecuted code.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_phase_resume_markers(tmp_path):
    """Phase-done detection keys on an explicit end-of-phase stamp, not an
    early artifact: a root holding vocab.tsv (written near the START of
    corpus building) but no stamp — e.g. after a mid-corpus kill left
    train.de.npy missing — must re-run phase 0."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from rehearse_north_star import mark_done, phase_done
    finally:
        sys.path.pop(0)

    root = str(tmp_path / "ns")
    data = os.path.join(root, "data")
    os.makedirs(data)
    # the half-built state that once fooled the vocab.tsv check
    open(os.path.join(data, "vocab.tsv"), "w").write("tok\t1\n")
    assert not phase_done(root, "corpus")       # must re-run
    mark_done(root, "corpus")
    assert phase_done(root, "corpus")           # stamped -> skipped
    assert not phase_done(root, "pretrain")     # stamps are per-phase


@pytest.mark.slow
def test_rehearsal_quick_smoke(tmp_path):
    root = tmp_path / "ns"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rehearse_north_star.py"),
         "--root", str(root), "--quick", "--cpu",
         "--pretrain_epochs", "1", "--ft_epochs", "1", "--cap_epochs", "1"],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]

    report = json.loads((root / "report.json").read_text())
    # every phase ran and was timed — including the captioning family
    for phase in ("corpus", "pretrain", "finetune", "caption",
                  "caption_eval_exact", "caption_eval_fast",
                  "eval_only_a", "eval_only_b"):
        assert phase in report["phases"], report["phases"].keys()
        assert report["phases"][phase]["wall_s"] > 0
    # the full-grid eval_only runs reproduced byte-identically
    assert report["byte_identical_eval"] is True
    assert (report["phases"]["eval_only_a"]["scores"]
            == report["phases"]["eval_only_b"]["scores"])
    # caption eval reported all four metrics, exact and fast
    for mode in ("exact", "fast"):
        m = report["phases"][f"caption_eval_{mode}"]["metrics"]
        for met in ("caption_bleu", "caption_cider", "caption_meteor",
                    "caption_rouge_l"):
            assert any(met in k for k in m), (mode, m)
    # per-language R@k extracted from the grid eval
    scores = report["full_grid_scores"]
    assert scores, "no R@k/acc scores extracted from the eval log"
    for k, v in scores.items():
        assert 0.0 <= v <= 100.0, (k, v)
    # every phase stamped completion (resume machinery end-to-end)
    for phase in ("corpus", "pretrain", "finetune", "caption",
                  "caption_eval"):
        assert (root / "stamps" / f"{phase}.done").exists()
    # decoded hypotheses exported per language and mode
    # (`xevaluator.py:986-993` export convention)
    for mode in ("exact", "fast"):
        for lang in ("en", "de"):
            hyp = root / f"hyps_{mode}" / f"caption_translate.{lang}.json"
            assert hyp.exists(), hyp
            rows = json.loads(hyp.read_text())
            assert rows and {"image_id", "caption"} <= set(rows[0])
