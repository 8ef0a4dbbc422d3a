"""Chip-health canary with the steady-latency discriminator.

Gate long chip queues on this script (committed here because the
round-4/5 host reset wiped the /root/r5 copy — the ops lesson is that
anything a queue needs must live in the repo).

Why two measurements: a RECOVERING relay answers the FIRST op in
100-240 s (remote compile latency through the tunnel) while
post-compile fetches take ~0 s — a single first-fetch threshold parks
the queue needlessly for hours (measured round 5: fusion_b8 ran at
full speed despite a 104 s first fetch). So the canary times a SECOND,
cache-hit op and gates on STEADY latency only.

Exit 0 = healthy (steady fetch < MGR_TPU_CANARY_STEADY_S, default 20).
Exit 1 = wedged/unhealthy. Run under `timeout` from the queue: backend
init on a truly wedged relay hangs indefinitely and can only be killed
from outside.

Usage (chip queue gate):
    timeout 300 python examples/canary.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgr_tpu.core.platform import apply_env_platform

apply_env_platform()

STEADY_S = float(os.environ.get("MGR_TPU_CANARY_STEADY_S", "20"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((256, 256))
    first = float((x @ x).sum())  # scalar fetch = real sync through the relay
    t_first = time.time() - t0

    # Cache-hit op: same computation, new input — compile is amortized,
    # so this times the steady-state host<->chip round trip the training
    # loop will actually see.
    t1 = time.time()
    y = jnp.full((256, 256), 2.0)
    second = float((y @ y).sum())
    t_steady = time.time() - t1

    ok = t_steady < STEADY_S
    print(
        f"canary first={t_first:.1f}s steady={t_steady:.1f}s "
        f"(threshold {STEADY_S:.0f}s) vals=({first:.0f},{second:.0f}) "
        f"-> {'OK' if ok else 'WEDGED'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
