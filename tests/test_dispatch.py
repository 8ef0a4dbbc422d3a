"""Kernel-backend dispatch policy (mgr_tpu.ops.dispatch)."""

import pytest

from mgr_tpu.ops import dispatch
from mgr_tpu.ops import lstm


@pytest.fixture(autouse=True)
def _reset_mode():
    yield
    dispatch.set_mode("auto")


def test_forced_modes():
    dispatch.set_mode("pallas")
    assert dispatch.pallas_ok()
    dispatch.set_mode("xla")
    assert not dispatch.pallas_ok()


def test_invalid_mode_rejected():
    with pytest.raises(ValueError):
        dispatch.set_mode("cuda")


def test_auto_off_tpu_is_xla():
    # This suite runs on the virtual CPU backend.
    dispatch.set_mode("auto")
    assert not dispatch.pallas_ok()


def test_auto_on_tpu_multidevice_needs_shard_local(monkeypatch):
    """On a multi-device TPU, auto engages Pallas ONLY inside the
    shard_map-local context (GSPMD would all-gather otherwise)."""
    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    dispatch.set_mode("auto")
    # 8 virtual devices here -> blocked outside shard_local.
    assert not dispatch.pallas_ok()
    with dispatch.shard_local():
        assert dispatch.in_shard_local()
        assert dispatch.pallas_ok()
    assert not dispatch.in_shard_local()
    assert not dispatch.pallas_ok()


def test_shard_local_context_restores_on_error(monkeypatch):
    monkeypatch.setattr(dispatch, "_on_tpu", lambda: True)
    dispatch.set_mode("auto")
    with pytest.raises(RuntimeError):
        with dispatch.shard_local():
            raise RuntimeError("boom")
    assert not dispatch.in_shard_local()


def test_use_pallas_wrapper_delegates():
    lstm.use_pallas(True)
    assert dispatch.MODE == "pallas" and lstm._pallas_active()
    lstm.use_pallas(False)
    assert dispatch.MODE == "xla" and not lstm._pallas_active()
