"""Test harness setup: force an 8-device virtual CPU backend BEFORE jax
initializes, so mesh/collective code paths are exercised without TPUs
(the standard JAX fake-backend idiom; see SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize hook may register a remote TPU plugin and force
# jax_platforms to it; flip back to the virtual-CPU backend for tests
# (compiles are local and fast, and we get 8 devices for mesh tests).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
