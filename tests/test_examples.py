"""Smoke tests: the examples/ scripts run end-to-end in a fresh
subprocess (catches import/path bugs the in-process suite can't)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, env_extra, *args):
    env = dict(os.environ)
    env.update(env_extra)
    # Match the suite's virtual CPU backend in the child process.
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.pop("XLA_FLAGS", None)
    # Generous timeout: this box has ONE cpu — a concurrently running
    # job can triple the subprocess's wall time.
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, env=env, cwd="/", timeout=1800,
    )


def test_synthetic_end_to_end_smoke(tmp_path):
    r = _run("synthetic_end_to_end.py",
             {"MGR_TPU_EXAMPLE_EPOCHS": "2"}, str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MLF scoring:" in r.stdout


def test_curriculum_bench_smoke():
    r = _run("curriculum_bench.py", {
        "MGR_TPU_CB_NTRAIN": "4", "MGR_TPU_CB_NVAL": "2",
        "MGR_TPU_CB_EPOCHS": "2", "MGR_TPU_CB_MAXLEN": "16",
        "MGR_TPU_CB_BATCH": "2", "MGR_TPU_CB_HIDDEN_SCALE": "0.02",
    })
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "curriculum_wall_clock"
    assert set(out["stages"]) == {"speech", "skeletal", "late_fusion"}
    for stage in out["stages"].values():
        assert stage["epoch_s"] > 0


def test_curriculum_bench_measured_smoke():
    """Measured mode: 500-epoch ceiling runs with per-stage decode
    accuracy (toy geometry here; the real run happens on the chip)."""
    r = _run("curriculum_bench.py", {
        "MGR_TPU_CB_NTRAIN": "4", "MGR_TPU_CB_NVAL": "2",
        "MGR_TPU_CB_EPOCHS": "2", "MGR_TPU_CB_MAXLEN": "16",
        "MGR_TPU_CB_BATCH": "2", "MGR_TPU_CB_HIDDEN_SCALE": "0.02",
        "MGR_TPU_CB_MEASURED": "1",
    })
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["measured"] is True
    assert out["measured_total_s"] > 0
    for stage in out["stages"].values():
        assert "train_accuracy" in stage and "epochs_run" in stage
