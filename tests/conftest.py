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


# ---- chip-campaign lock (mgr_tpu/core/campaign.py) ----
# The suite itself is CPU-pinned above, so no in-process test can touch
# the relay-attached chip; subprocess smokes (test_examples.py,
# test_multihost.py, test_utils.py) all pass JAX_PLATFORMS=cpu
# explicitly, which every entry point re-asserts via
# apply_env_platform(). As belt-and-braces, any test that DOES opt into
# the real chip must carry @pytest.mark.chip, and those are skipped
# while a live campaign holds the chip lock (one TPU process at a time;
# two wedge the relay for ~20-40 min — measured round 3).
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "chip: touches the real relay-attached TPU chip"
    )


def pytest_collection_modifyitems(config, items):
    from mgr_tpu.core import campaign

    rec = campaign.holder()
    if rec is None:
        return
    skip = pytest.mark.skip(
        reason=f"chip lock held by pid {rec['pid']} ({rec.get('tag')})"
    )
    for item in items:
        if "chip" in item.keywords:
            item.add_marker(skip)
