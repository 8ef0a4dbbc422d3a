"""MFCC featurizer: shapes, invariances, and spot checks of the HTK
conventions (pre-emphasis, filterbank coverage, liftering, deltas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgr_tpu.ops import mfcc


CFG = mfcc.MFCCConfig(sample_rate=16000)


def _tone(freq, seconds=0.5, fs=16000, amp=0.3):
    t = np.arange(int(seconds * fs)) / fs
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_frame_count_and_shapes():
    sig = _tone(440)
    out = np.asarray(mfcc.mfcc_39(jnp.asarray(sig), CFG))
    expected_T = 1 + (len(sig) - CFG.frame_len) // CFG.frame_step
    assert out.shape == (expected_T, 39)
    assert np.isfinite(out).all()


def test_static_ordering_c0_last():
    # HTK MFCC_0: columns are c1..c12 then C0. With loud white noise
    # every filter clears the HTK floor, so scaling the signal shifts
    # ONLY C0 (by sqrt(2/N)*N*ln(k)) and leaves c1..c12 unchanged —
    # the log-gain lands entirely in the DC term.
    rng = np.random.default_rng(0)
    sig = (1000.0 * rng.standard_normal(8000)).astype(np.float32)
    k = 4.0
    a = np.asarray(mfcc.static_mfcc(jnp.asarray(sig), CFG))
    b = np.asarray(mfcc.static_mfcc(jnp.asarray(k * sig), CFG))
    want_shift = np.sqrt(2.0 / 26.0) * 26.0 * np.log(k)
    np.testing.assert_allclose(
        (b[:, 12] - a[:, 12]).mean(), want_shift, rtol=1e-3
    )
    np.testing.assert_allclose(b[:, :12], a[:, :12], atol=1e-3)


def test_different_tones_separate():
    a = np.asarray(mfcc.mfcc_39(jnp.asarray(_tone(200)), CFG))
    b = np.asarray(mfcc.mfcc_39(jnp.asarray(_tone(2000)), CFG))
    assert np.abs(a[:, :12].mean(0) - b[:, :12].mean(0)).max() > 1.0


def test_deltas_of_constant_are_zero():
    feats = jnp.ones((20, 13))
    d = np.asarray(mfcc.deltas(feats))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_deltas_of_linear_ramp():
    # d_t of a unit-slope ramp with window 2 == 1 in the interior.
    ramp = jnp.asarray(np.arange(20.0, dtype=np.float32)[:, None])
    d = np.asarray(mfcc.deltas(ramp, window=2))
    np.testing.assert_allclose(d[3:-3, 0], 1.0, rtol=1e-5)


def test_filterbank_covers_spectrum():
    fb = mfcc._mel_filterbank(CFG)
    assert fb.shape == (CFG.fft_size // 2 + 1, 26)
    # Every filter has mass; interior bins are covered by some filter.
    assert (fb.sum(axis=0) > 0).all()
    assert (fb[5:-5].sum(axis=1) > 0).any()


def test_batch_mfcc_matches_single():
    sig = _tone(500, seconds=0.3)
    single = np.asarray(mfcc.mfcc_39(jnp.asarray(sig), CFG))
    batch = np.asarray(
        mfcc.batch_mfcc_39(jnp.asarray(np.stack([sig, sig])), CFG)
    )
    np.testing.assert_allclose(batch[0], single, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(batch[1], single, rtol=1e-5, atol=1e-5)


def test_jit_compatible():
    sig = jnp.asarray(_tone(440, seconds=0.2))
    f = jax.jit(lambda s: mfcc.mfcc_39(s, CFG))
    out = f(sig)
    assert np.isfinite(np.asarray(out)).all()
