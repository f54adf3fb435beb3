"""CI smoke for the north-star rehearsal orchestrator.

`tools/rehearse_north_star.py` chains the full reference recipe — corpus ->
CLI pretrain -> multi-language fine-tune -> full-grid --eval_only twice
(`/root/reference/README.md:158-216`) — as subprocesses.  The full-dress run
executes on-chip (report committed under reports/); this test keeps the
ORCHESTRATION itself exercised in CI at tiny shapes on CPU, so the tool can
never regress back into unexecuted code.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_rehearsal_quick_smoke(tmp_path):
    root = tmp_path / "ns"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rehearse_north_star.py"),
         "--root", str(root), "--quick", "--cpu",
         "--pretrain_epochs", "1", "--ft_epochs", "1"],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]

    report = json.loads((root / "report.json").read_text())
    # every phase ran and was timed
    for phase in ("corpus", "pretrain", "finetune", "eval_only_a",
                  "eval_only_b"):
        assert phase in report["phases"], report["phases"].keys()
        assert report["phases"][phase]["wall_s"] > 0
    # the two full-grid eval_only runs reproduced byte-identically
    assert report["byte_identical_eval"] is True
    assert (report["phases"]["eval_only_a"]["scores"]
            == report["phases"]["eval_only_b"]["scores"])
    # per-language R@k extracted from the grid eval
    scores = report["full_grid_scores"]
    assert scores, "no R@k/acc scores extracted from the eval log"
    for k, v in scores.items():
        assert 0.0 <= v <= 100.0, (k, v)
