"""Driver contract: entry() jits; dryrun_multichip runs a dp x tp (x sp)
sharded step on virtual devices."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_shapes():
    fn, args = graft.entry()
    params, x = args
    assert x.shape[1:] == (1900, 39)
    # Jit-compile on the (CPU) test backend at reduced batch for speed.
    out = jax.jit(fn)(params, x[:1, :64])
    assert out.shape == (1, 64, 44)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow  # ~90 s; the driver runs dryrun directly each round
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.slow  # ~90 s; the driver runs dryrun directly each round
def test_dryrun_multichip_2():
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    graft.dryrun_multichip(2)
