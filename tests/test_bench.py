"""bench.py driver-contract tests.

The driver runs ``python bench.py`` once per round and records the one
JSON line it prints; a line that fails to appear within the driver's
budget loses the round's perf artifact (BENCH_r04 was rc=124). These
tests pin the two halves of the contract:

  1. Stale fallback — under an unreachable backend, bench.py must still
     print one parseable JSON line (the cached last-good measurement,
     flagged ``stale``) and exit 0 within the configured deadline.
  2. Live path — on the CPU backend at toy geometry, the real
     measurement prints an unflagged line.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, *args, timeout=600):
    env = dict(os.environ)
    env.update(env_extra)
    env.pop("XLA_FLAGS", None)
    return subprocess.run(
        [sys.executable, BENCH, *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )


def test_stale_fallback_under_dead_backend(tmp_path):
    """A wedged/unreachable relay must yield the cached line + rc 0.

    A bogus JAX platform makes the canary subprocess fail instantly;
    the 1-second deadline forbids cooldown sleeps; the isolated lock
    path keeps the test out of any live chip campaign's way."""
    r = _run({
        "JAX_PLATFORMS": "definitely_not_a_platform",
        "MGR_TPU_BENCH_DEADLINE": "1",
        "MGR_TPU_BENCH_RETRIES": "1",
        "MGR_TPU_BENCH_CANARY_TIMEOUT": "30",
        "MGR_TPU_CHIP_LOCK": str(tmp_path / "lock"),
    }, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["stale"] is True
    assert out["stale_reason"]
    assert out["metric"] == "train_seqs_per_sec_per_chip"
    # The committed seed cache (round-4 capture) backs a fresh checkout.
    assert out["value"] > 0


@pytest.mark.slow  # full bench subprocess, ~80 s
def test_cpu_smoke_live_line(tmp_path):
    """The live path prints one unflagged JSON line on the CPU backend
    (toy geometry; CPU runs skip the relay gate and never write the
    last-good cache)."""
    r = _run({
        "JAX_PLATFORMS": "cpu",
        "MGR_TPU_CHIP_LOCK": str(tmp_path / "lock"),
    }, "--maxlen", "32", "--batch", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "stale" not in out
    assert out["metric"] == "train_seqs_per_sec_per_chip"
    assert out["value"] > 0
    assert out["decode_seqs_per_sec_per_chip"] > 0
