"""Golden-parity harness smoke: the one-command runner must stay green.

Runs ``scripts/golden_eval.py --mode smoke`` for the cheapest config (train)
in a subprocess (smoke mode pins jax_platforms itself, so it must not share
this process). The full five-config smoke is the same code path
config-by-config and runs in ~10 min; CI-time budget keeps this to one.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_golden_eval_smoke_train(tmp_path):
    script = os.path.join(REPO, "scripts", "golden_eval.py")
    proc = subprocess.run(
        [sys.executable, script, "--mode", "smoke",
         "--output", str(tmp_path), "--configs", "train"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    with open(tmp_path / "golden_eval.json") as f:
        report = json.load(f)
    assert report["mode"] == "smoke"
    train = report["configs"]["train"]
    assert train["status"] == "ok", train
    assert train["samples_per_s"] and train["samples_per_s"] > 0
