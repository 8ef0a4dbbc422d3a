"""Pallas fused BLSTM scan vs the pure lax.scan implementation —
forward values and custom-VJP gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mgr_tpu.ops.lstm as lstm
from mgr_tpu.ops import pallas_kernels as pk


def _case(D=2, B=4, T=12, H=8, seed=0):
    k1, k2 = jax.random.split(jax.random.key(seed))
    xp = jax.random.normal(k1, (D, B, T, 4, H), jnp.float32)
    U = 0.5 * jax.random.normal(k2, (D, H, 4, H), jnp.float32)
    return xp, U


def test_forward_matches_lax_scan():
    xp, U = _case()
    want = lstm._recurrent_scan(xp, U, jnp.float32, unroll=1)
    got = pk.pallas_recurrent_scan(xp, U, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2
    )


def test_forward_matches_with_padding():
    # H=8 pads to 128 lanes; padded lanes must not leak into real ones.
    xp, U = _case(H=8, T=7, B=2)
    want = lstm._recurrent_scan(xp, U, jnp.float32, unroll=1)
    got = pk.pallas_recurrent_scan(xp, U, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2
    )


def test_gradients_match_autodiff():
    xp, U = _case(T=6, B=2, H=8, seed=3)
    tangent = jax.random.normal(jax.random.key(9), xp.shape[:3] + (xp.shape[4],))

    def loss_pure(xp, U):
        hs = lstm._recurrent_scan(xp, U, jnp.float32, unroll=1)
        return jnp.sum(hs * tangent)

    def loss_pallas(xp, U):
        hs = pk.pallas_recurrent_scan(xp, U, interpret=True)
        return jnp.sum(hs * tangent)

    g_pure = jax.grad(loss_pure, argnums=(0, 1))(xp, U)
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(xp, U)
    for a, b, name in zip(g_pallas, g_pure, ("dxp", "dU")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(
            a / denom, b / denom, atol=5e-2, err_msg=name
        )


def test_bilstm_layer_with_pallas_backend():
    params = lstm.init_bilstm_params(jax.random.key(0), 5, 8)
    x = jax.random.normal(jax.random.key(1), (2, 10, 5))
    want = lstm.bilstm_layer(params, x, compute_dtype=jnp.float32)
    lstm.use_pallas(True)
    try:
        got = lstm.bilstm_layer(params, x, compute_dtype=jnp.float32)
    finally:
        lstm.use_pallas(False)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2
    )
