"""Golden-parity harness smoke: the one-command runner must stay green.

Runs ``scripts/golden_eval.py --mode smoke`` in a subprocess (smoke mode
pins jax_platforms itself, so it must not share this process). The default
suite runs only the cheapest config (train); the full five-config smoke —
harness-level wiring of chili/wolf/tiger/long — runs under the ``slow``
marker (~10 min; VERDICT r4 item 7).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_smoke(tmp_path, configs, timeout):
    script = os.path.join(REPO, "scripts", "golden_eval.py")
    proc = subprocess.run(
        [sys.executable, script, "--mode", "smoke",
         "--output", str(tmp_path), "--configs", *configs],
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    with open(tmp_path / "golden_eval.json") as f:
        return json.load(f)


@pytest.mark.slow
def test_golden_eval_smoke_train(tmp_path):
    report = _run_smoke(tmp_path, ["train"], timeout=900)
    assert report["mode"] == "smoke"
    train = report["configs"]["train"]
    assert train["status"] == "ok", train
    assert train["samples_per_s"] and train["samples_per_s"] > 0


@pytest.mark.slow
def test_golden_eval_smoke_all_motion_configs(tmp_path):
    """Harness-level wiring of the four motion configs: chili/wolf (mesh+
    video), tiger (video-only incl. shape gen), long (sliding window). Each
    must produce a result GLB, a rasterized render, and a metric summary."""
    report = _run_smoke(tmp_path, ["chili", "wolf", "tiger", "long"],
                        timeout=1800)
    for name in ("chili", "wolf", "tiger", "long"):
        cfg = report["configs"][name]
        assert cfg["status"] == "ok", (name, cfg)
        assert os.path.exists(cfg["result_glb"]), name
        assert os.path.exists(cfg["render"]), name
        assert "metrics" in cfg and cfg["metrics"], name
