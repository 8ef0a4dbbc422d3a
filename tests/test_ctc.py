"""CTC loss: JAX phi/emit formulation vs the independent NumPy lattice
reference, plus optax cross-check and gradient sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mgr_tpu.ops import ctc


def _random_case(rng, B=4, T=20, K=6, N=5):
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    label_lengths = rng.integers(1, N + 1, size=B)
    input_lengths = rng.integers(2 * N + 1, T + 1, size=B)
    labels = np.full((B, N), -1, dtype=np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(
            0, K - 1, size=label_lengths[b]
        )
    return log_probs, labels, input_lengths, label_lengths


def test_matches_numpy_reference():
    rng = np.random.default_rng(0)
    log_probs, labels, in_len, lab_len = _random_case(rng)
    got = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(labels),
            jnp.asarray(in_len), jnp.asarray(lab_len),
        )
    )
    want = ctc.ctc_loss_reference_batch(log_probs, labels, in_len, lab_len)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_matches_numpy_reference_repeated_labels():
    # Repeated labels force the no-skip rule through the blank.
    rng = np.random.default_rng(1)
    B, T, K, N = 3, 15, 5, 4
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = np.array(
        [[2, 2, 2, 2], [1, 1, 3, 3], [0, 0, 0, -1]], dtype=np.int32
    )
    lab_len = np.array([4, 4, 3])
    in_len = np.array([15, 12, 10])
    got = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(labels),
            jnp.asarray(in_len), jnp.asarray(lab_len),
        )
    )
    want = ctc.ctc_loss_reference_batch(log_probs, labels, in_len, lab_len)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_blank_as_label():
    # The reference inserts the blank CLASS as the label for missing
    # sequences (data_generator.py:206-213); must be scoreable.
    rng = np.random.default_rng(2)
    B, T, K = 2, 10, 4
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = np.array([[K - 1], [1]], dtype=np.int32)
    lab_len = np.array([1, 1])
    in_len = np.array([10, 10])
    got = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(labels),
            jnp.asarray(in_len), jnp.asarray(lab_len),
        )
    )
    want = ctc.ctc_loss_reference_batch(log_probs, labels, in_len, lab_len)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_empty_label_scores_all_blank_path():
    rng = np.random.default_rng(3)
    T, K = 8, 5
    logits = rng.standard_normal((1, T, K)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    got = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(log_probs),
            jnp.zeros((1, 3), jnp.int32),
            jnp.asarray([T]),
            jnp.asarray([0]),
        )
    )[0]
    want = -float(log_probs[0, :, K - 1].sum())
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_optax():
    rng = np.random.default_rng(4)
    B, T, K, N = 4, 30, 8, 6
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    lab_len = rng.integers(1, N + 1, size=B)
    in_len = rng.integers(2 * N + 2, T + 1, size=B)
    labels = np.zeros((B, N), dtype=np.int32)
    for b in range(B):
        labels[b, : lab_len[b]] = rng.integers(1, K, size=lab_len[b])

    # optax: blank=0, paddings as float masks.
    logit_paddings = (np.arange(T)[None, :] >= in_len[:, None]).astype(
        np.float32
    )
    label_paddings = (np.arange(N)[None, :] >= lab_len[:, None]).astype(
        np.float32
    )
    want = np.asarray(
        optax.ctc_loss(
            jnp.asarray(logits), jnp.asarray(logit_paddings),
            jnp.asarray(labels), jnp.asarray(label_paddings),
        )
    )
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    got = np.asarray(
        ctc.ctc_loss(
            jnp.asarray(log_probs), jnp.asarray(labels),
            jnp.asarray(in_len), jnp.asarray(lab_len), blank=0,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gradients_match_optax():
    rng = np.random.default_rng(5)
    B, T, K, N = 2, 12, 5, 3
    logits = rng.standard_normal((B, T, K)).astype(np.float32)
    labels = np.array([[1, 2, 3], [2, 2, 0]], dtype=np.int32)
    lab_len = np.array([3, 2])
    in_len = np.array([12, 9])

    def ours(lg):
        return ctc.ctc_loss_from_logits(
            lg, jnp.asarray(labels), jnp.asarray(in_len),
            jnp.asarray(lab_len), blank=0,
        ).sum()

    logit_paddings = (np.arange(T)[None, :] >= in_len[:, None]).astype(
        np.float32
    )
    label_paddings = (np.arange(N)[None, :] >= lab_len[:, None]).astype(
        np.float32
    )

    def theirs(lg):
        return optax.ctc_loss(
            lg, jnp.asarray(logit_paddings), jnp.asarray(labels),
            jnp.asarray(label_paddings),
        ).sum()

    g_ours = np.asarray(jax.grad(ours)(jnp.asarray(logits)))
    g_theirs = np.asarray(jax.grad(theirs)(jnp.asarray(logits)))
    np.testing.assert_allclose(g_ours, g_theirs, rtol=1e-3, atol=1e-4)
    assert np.all(np.isfinite(g_ours))


def test_trim_frames():
    # ctc_loss_from_logits(trim_frames=2) == manual slice.
    rng = np.random.default_rng(6)
    B, T, K = 2, 14, 6
    logits = jnp.asarray(rng.standard_normal((B, T, K)).astype(np.float32))
    labels = jnp.asarray([[1, 2], [3, -1]], dtype=jnp.int32)
    lab_len = jnp.asarray([2, 1])
    in_len = jnp.asarray([T - 2, T - 2])
    got = ctc.ctc_loss_from_logits(
        logits, labels, in_len, lab_len, trim_frames=2
    )
    want = ctc.ctc_loss(
        jax.nn.log_softmax(logits[:, 2:], axis=-1), labels, in_len, lab_len
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_jit_and_vmap_composable():
    rng = np.random.default_rng(7)
    log_probs, labels, in_len, lab_len = _random_case(rng, B=2, T=10, K=4, N=3)
    f = jax.jit(ctc.ctc_loss)
    out = f(
        jnp.asarray(log_probs), jnp.asarray(labels),
        jnp.asarray(in_len), jnp.asarray(lab_len),
    )
    assert out.shape == (2,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fuzz_against_optax_many_configs():
    """Randomized sweep: shapes, lengths, repeats, blank-heavy labels."""
    rng = np.random.default_rng(99)
    for trial in range(8):
        B = int(rng.integers(1, 5))
        T = int(rng.integers(6, 26))
        K = int(rng.integers(3, 9))
        N = int(rng.integers(1, max(2, T // 3)))
        logits = rng.standard_normal((B, T, K)).astype(np.float32)
        lab_len = rng.integers(0, N + 1, size=B)
        in_len = np.maximum(rng.integers(1, T + 1, size=B),
                            2 * lab_len + 1)
        in_len = np.minimum(in_len, T)
        labels = np.zeros((B, N), np.int32)
        for b in range(B):
            labels[b, : lab_len[b]] = rng.integers(1, K, size=lab_len[b])
        logit_paddings = (np.arange(T)[None] >= in_len[:, None]).astype(
            np.float32
        )
        label_paddings = (np.arange(N)[None] >= lab_len[:, None]).astype(
            np.float32
        )
        want = np.asarray(
            optax.ctc_loss(
                jnp.asarray(logits), jnp.asarray(logit_paddings),
                jnp.asarray(labels), jnp.asarray(label_paddings),
            )
        )
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        got = np.asarray(
            ctc.ctc_loss(
                jnp.asarray(lp), jnp.asarray(labels),
                jnp.asarray(in_len), jnp.asarray(lab_len), blank=0,
            )
        )
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: B={B} T={T} K={K} N={N}",
        )


def test_fuzz_pallas_interpret_matches_xla():
    from mgr_tpu.ops.pallas_kernels import pallas_ctc_loss

    rng = np.random.default_rng(123)
    for trial in range(4):
        B = int(rng.integers(1, 4))
        T = int(rng.integers(6, 20))
        K = int(rng.integers(3, 8))
        N = int(rng.integers(1, 6))
        logits = rng.standard_normal((B, T, K)).astype(np.float32)
        lab_len = rng.integers(0, N + 1, size=B)
        in_len = np.minimum(
            np.maximum(rng.integers(1, T + 1, size=B), 2 * lab_len + 1), T
        )
        labels = np.full((B, N), -1, np.int32)
        for b in range(B):
            labels[b, : lab_len[b]] = rng.integers(
                0, K, size=lab_len[b]  # includes blank-as-label
            )
        lp = jnp.asarray(np.asarray(jax.nn.log_softmax(jnp.asarray(logits),
                                                       -1)))
        want = np.asarray(ctc.ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len),
            jnp.asarray(lab_len), backend="xla",
        ))
        got = np.asarray(pallas_ctc_loss(
            lp, jnp.asarray(labels), jnp.asarray(in_len),
            jnp.asarray(lab_len), interpret=True,
        ))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: B={B} T={T} K={K} N={N}",
        )
