"""Chip-campaign lock behavior (VERDICT r3 item 6).

The lock is a machine-wide mutual-exclusion file guarding the
relay-attached chip: campaigns acquire, everything else defers. These
tests pin acquire/steal/release semantics and the conftest skip wiring.
"""

import json
import os
import subprocess
import sys

import pytest

from mgr_tpu.core import campaign


@pytest.fixture
def lockfile(tmp_path, monkeypatch):
    path = str(tmp_path / "chip.lock")
    monkeypatch.setenv("MGR_TPU_CHIP_LOCK", path)
    return path


def test_acquire_release_roundtrip(lockfile):
    assert campaign.holder() is None
    campaign.acquire("unit-test")
    rec = campaign.holder()
    assert rec["pid"] == os.getpid()
    assert rec["tag"] == "unit-test"
    campaign.release()
    assert campaign.holder() is None
    assert not os.path.exists(lockfile)


def test_second_acquire_by_live_owner_is_reentrant(lockfile):
    campaign.acquire("first")
    campaign.acquire("second")  # same pid: refresh, not deadlock
    assert campaign.holder()["tag"] == "second"
    campaign.release()


def test_live_foreign_owner_blocks(lockfile):
    # A real live foreign pid: a sleeping child.
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        with open(lockfile, "w") as f:
            json.dump({"pid": child.pid, "tag": "campaign", "ts": 0.0}, f)
        with pytest.raises(campaign.CampaignLockHeld):
            campaign.acquire("intruder")
        assert campaign.holder()["pid"] == child.pid
        assert not campaign.wait_free(timeout_s=0.0)
    finally:
        child.kill()
        child.wait()
    # Owner died -> stale -> stealable.
    assert campaign.holder() is None
    campaign.acquire("after-steal")
    campaign.release()


def test_stale_lock_is_cleared(lockfile):
    with open(lockfile, "w") as f:
        json.dump({"pid": 2**30, "tag": "dead", "ts": 0.0}, f)
    assert campaign.holder() is None  # clears it
    assert not os.path.exists(lockfile)


def test_corrupt_lock_is_cleared(lockfile):
    with open(lockfile, "w") as f:
        f.write("not json")
    assert campaign.holder() is None
    assert not os.path.exists(lockfile)


def test_release_does_not_drop_foreign_lock(lockfile):
    child = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        with open(lockfile, "w") as f:
            json.dump({"pid": child.pid, "tag": "campaign", "ts": 0.0}, f)
        campaign.release()  # not ours: must be a no-op
        assert os.path.exists(lockfile)
    finally:
        child.kill()
        child.wait()


def test_context_manager(lockfile):
    with campaign.lock("ctx"):
        assert campaign.holder()["tag"] == "ctx"
    assert campaign.holder() is None


def test_wait_free_single_check(lockfile):
    assert campaign.wait_free(timeout_s=0.0)
