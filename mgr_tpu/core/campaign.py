"""Chip-campaign lock: one TPU process at a time.

The relay-attached chip in this environment wedges for ~20-40 minutes
when two processes hit it concurrently (measured round 3: the test
suite's example smokes collided with the fusion campaign and the
round's bench artifact came back rc=1). The reference has no notion of
device ownership — single GPU, single process — so this is a
framework-native operational guard with no reference counterpart.

Protocol: a long-running chip campaign calls :func:`acquire` (or the
``lock`` context manager) before first backend use; every other
TPU-touching entry point (bench.py, examples, test smokes) calls
:func:`holder` and defers/skips while the lock is live. Locks are
stamped with the owner pid and become STALE (auto-stealable) when that
pid is gone, so a crashed campaign never deadlocks the chip.

The lock file location is shared machine-wide via ``MGR_TPU_CHIP_LOCK``
(default ``/tmp/mgr_tpu_chip.lock``). CPU-pinned processes never need
the lock — it guards the relay, not the code.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Optional


class CampaignLockHeld(RuntimeError):
    """Another live process owns the chip."""


def lock_path() -> str:
    return os.environ.get("MGR_TPU_CHIP_LOCK", "/tmp/mgr_tpu_chip.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def holder() -> Optional[dict]:
    """Return the live lock record, clearing a stale one.

    None means the chip is free. A record means a LIVE pid owns it
    (``{"pid": int, "tag": str, "ts": float}``)."""
    path = lock_path()
    try:
        with open(path) as f:
            rec = json.load(f)
    except FileNotFoundError:
        return None
    except (json.JSONDecodeError, OSError):
        # Unreadable lock: treat as stale, clear it.
        _unlink_quiet(path)
        return None
    if not isinstance(rec, dict) or not _pid_alive(int(rec.get("pid", -1))):
        _unlink_quiet(path)
        return None
    return rec


def _unlink_quiet(path: str) -> None:
    try:
        os.unlink(path)
    except OSError:
        pass


def acquire(tag: str) -> str:
    """Take the chip lock for this process, or raise CampaignLockHeld.

    Stale locks (dead owner pid) are stolen. Returns the lock path."""
    path = lock_path()
    rec = holder()  # clears stale locks as a side effect
    if rec is not None and int(rec["pid"]) != os.getpid():
        raise CampaignLockHeld(
            f"chip lock held by pid {rec['pid']} ({rec.get('tag', '?')}) "
            f"since {time.strftime('%H:%M:%S', time.localtime(rec.get('ts', 0)))}"
        )
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid(), "tag": tag, "ts": time.time()}, f)
    os.replace(tmp, path)  # atomic on POSIX
    return path


def release() -> None:
    """Drop the lock if this process owns it (no-op otherwise)."""
    path = lock_path()
    try:
        with open(path) as f:
            rec = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return
    if isinstance(rec, dict) and int(rec.get("pid", -1)) == os.getpid():
        _unlink_quiet(path)


@contextmanager
def lock(tag: str):
    """``with campaign.lock("fusion-wd8"): ...`` — acquire/release."""
    acquire(tag)
    try:
        yield
    finally:
        release()


def own_chip_or_exit(tag: str) -> None:
    """Entry-point guard for chip campaigns (examples, CLI runs).

    CPU-pinned processes (JAX_PLATFORMS=cpu — test smokes, local dev)
    no-op: the lock guards the relay-attached chip, not the code. On a
    chip target, acquire the lock or exit(75) (EX_TEMPFAIL: retryable)
    with the holder's identity instead of colliding (two TPU processes
    wedge the relay). 75 is deliberately DISTINCT from the campaign
    scripts' own semantic exit codes (tpu_convergence_check's
    REQUIRE_ENC abort uses 3) so a queue's ok_rc list can never mistake
    a lock collision for a measured result (review r5 finding). The
    lock is released at process exit; a crash leaves a stale lock the
    next acquirer steals."""
    import atexit
    import sys

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    try:
        acquire(tag)
    except CampaignLockHeld as e:
        print(f"{tag}: {e} — refusing to collide; retry when free",
              file=sys.stderr)
        raise SystemExit(75)
    atexit.register(release)


def wait_free(timeout_s: float = 0.0, poll_s: float = 30.0) -> bool:
    """Block until the chip is free or ``timeout_s`` elapses.

    timeout_s=0 is a single non-blocking check. Returns True when free."""
    deadline = time.time() + timeout_s
    while True:
        if holder() is None:
            return True
        if time.time() >= deadline:
            return False
        time.sleep(min(poll_s, max(deadline - time.time(), 0.1)))
