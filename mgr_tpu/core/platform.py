"""Platform selection that survives site-hook pinning.

Some managed TPU environments install a ``sitecustomize`` that registers
the TPU plugin at interpreter start and re-pins ``jax_platforms`` via
``jax.config`` — which OVERRIDES the ``JAX_PLATFORMS`` environment
variable. A child process launched with ``JAX_PLATFORMS=cpu`` then still
initializes the remote TPU backend: measured in this round, the test
suite's subprocess smokes silently landed on the relay-attached chip and
collided with the training campaign running there (two TPU processes
wedge the relay for ~20-40 min).

``apply_env_platform()`` re-asserts the env var through ``jax.config``
before any backend initializes, making ``JAX_PLATFORMS=cpu <script>``
mean what it says. In environments without the site hook this is a
no-op (the config already reflects the env var).
"""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    """Make the JAX_PLATFORMS env var authoritative for this process.

    Must run before the first computation/backend query (jax.devices,
    any jnp op). Safe to call multiple times."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
