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


# ---------------------------------------------------------------------------
# Pallas CTC vs the XLA phi/emit scan (values + gradients).
# ---------------------------------------------------------------------------

from mgr_tpu.ops import ctc as ctc_lib


def _ctc_case(seed, B=3, T=14, K=6, N=5):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    lab_len = rng.integers(1, N + 1, size=B)
    in_len = rng.integers(2 * N + 1, T + 1, size=B)
    labels = np.full((B, N), -1, np.int32)
    for b in range(B):
        labels[b, : lab_len[b]] = rng.integers(0, K - 1, size=lab_len[b])
    return (jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(in_len),
            jnp.asarray(lab_len))


def test_pallas_ctc_matches_xla_values():
    lp, labels, in_len, lab_len = _ctc_case(0)
    want = ctc_lib.ctc_loss(lp, labels, in_len, lab_len, backend="xla")
    got = pk.pallas_ctc_loss(lp, labels, in_len, lab_len, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_pallas_ctc_repeats_blank_label_and_empty():
    B, T, K, N = 3, 12, 5, 4
    rng = np.random.default_rng(1)
    lp = jnp.asarray(np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, K)).astype(np.float32)), -1
    )))
    labels = jnp.asarray(
        np.array([[2, 2, 2, -1], [K - 1, -1, -1, -1], [0, 0, 0, 0]],
                 np.int32)
    )
    lab_len = jnp.asarray([3, 1, 0])
    in_len = jnp.asarray([12, 10, 8])
    want = ctc_lib.ctc_loss(lp, labels, in_len, lab_len, backend="xla")
    got = pk.pallas_ctc_loss(lp, labels, in_len, lab_len, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_pallas_ctc_gradients_match_xla():
    lp, labels, in_len, lab_len = _ctc_case(2)

    def loss_xla(lp):
        return ctc_lib.ctc_loss(
            lp, labels, in_len, lab_len, backend="xla"
        ).sum()

    def loss_pal(lp):
        return pk.pallas_ctc_loss(
            lp, labels, in_len, lab_len, interpret=True
        ).sum()

    g_xla = np.asarray(jax.grad(loss_xla)(lp))
    g_pal = np.asarray(jax.grad(loss_pal)(lp))
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-3, atol=1e-4)


def test_pallas_ctc_grad_through_logits_chain():
    # End-to-end: logits -> log_softmax -> pallas ctc; grads finite and
    # match the xla chain.
    lp, labels, in_len, lab_len = _ctc_case(3, B=2, T=10, K=5, N=3)
    logits = lp * 2.0  # arbitrary pre-softmax tensor

    def chain(backend):
        def f(lg):
            lsp = jax.nn.log_softmax(lg, axis=-1)
            if backend == "xla":
                return ctc_lib.ctc_loss(
                    lsp, labels, in_len, lab_len, backend="xla"
                ).mean()
            return pk.pallas_ctc_loss(
                lsp, labels, in_len, lab_len, interpret=True
            ).mean()
        return f

    g_xla = np.asarray(jax.grad(chain("xla"))(logits))
    g_pal = np.asarray(jax.grad(chain("pallas"))(logits))
    np.testing.assert_allclose(g_pal, g_xla, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# Time-major BLSTM path vs the batch-major reference implementation.
# ---------------------------------------------------------------------------

def test_tm_kernels_match_batch_major():
    params = lstm.init_bilstm_params(jax.random.key(30), 5, 8)
    x = jax.random.normal(jax.random.key(31), (3, 11, 5))  # (B, T, F)
    want = lstm.bilstm_layer(params, x, compute_dtype=jnp.float32)

    x_tm = jnp.swapaxes(x, 0, 1)
    # XLA fallback path
    got_xla = lstm.bilstm_layer_tm(params, x_tm, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got_xla, 0, 1)), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )
    # Pallas interpret path
    lstm.use_pallas(True)
    try:
        got_pal = lstm.bilstm_layer_tm(
            params, x_tm, compute_dtype=jnp.float32
        )
    finally:
        lstm.use_pallas(False)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got_pal, 0, 1)), np.asarray(want),
        rtol=3e-2, atol=3e-2,
    )


def test_tm_pallas_gradients_match_xla_fallback():
    params = lstm.init_bilstm_params(jax.random.key(32), 4, 8)
    x_tm = jax.random.normal(jax.random.key(33), (9, 2, 4))  # (T, B, F)
    tang = jax.random.normal(jax.random.key(34), (9, 2, 16))

    def loss(p, use_pallas):
        lstm.use_pallas(use_pallas)
        try:
            out = lstm.bilstm_layer_tm(p, x_tm, compute_dtype=jnp.float32)
        finally:
            lstm.use_pallas(False)
        return jnp.sum(out * tang)

    g_xla = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    for (ka, a), (kb, b) in zip(
        sorted(g_xla.items()), sorted(g_pal.items())
    ):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(
            b / denom, a / denom, atol=5e-2, err_msg=ka
        )


def test_tm_input_gradients_match():
    params = lstm.init_bilstm_params(jax.random.key(35), 3, 8)
    x_tm = jax.random.normal(jax.random.key(36), (7, 2, 3))

    def loss(x, use_pallas):
        lstm.use_pallas(use_pallas)
        try:
            out = lstm.bilstm_layer_tm(
                params, x, compute_dtype=jnp.float32
            )
        finally:
            lstm.use_pallas(False)
        return jnp.sum(out ** 2)

    g_xla = np.asarray(jax.grad(lambda x: loss(x, False))(x_tm))
    g_pal = np.asarray(jax.grad(lambda x: loss(x, True))(x_tm))
    denom = np.abs(g_xla).max() + 1e-6
    np.testing.assert_allclose(g_pal / denom, g_xla / denom, atol=5e-2)
