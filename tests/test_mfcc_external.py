"""External (literature-anchored) MFCC validation.

`tests/htk_ref.py` is an independent scalar reimplementation, but both
it and `mgr_tpu/ops/mfcc.py` were written in this repo — a shared
misreading of HTK conventions would pass (PARITY.md #22 limitation;
VERDICT r4 item 7). No HTK binary or third-party MFCC library exists in
this environment, so these tests instead pin stage-level LITERAL values
taken from the published HTK Book equations (Young et al., "The HTK
Book" v3.4, §5.4 "Filterbank analysis" / §5.6 "Cepstral features"),
evaluated by hand and embedded as constants:

  * Mel(f) = 2595 log10(1 + f/700)            (HTK Book eq. 5.13)
  * c_i = sqrt(2/N) sum_j m_j cos(pi i (j-0.5)/N)   (eq. 5.11)
  * c'_n = (1 + (L/2) sin(pi n / L)) c_n            (eq. 5.12)
  * filters triangular, equally spaced along the mel scale (§5.4)
  * Hamming window + in-frame pre-emphasis (HSigP.c conventions)

They are deliberately redundant with the formulas in ops/mfcc.py — the
point is that the expected numbers below are literals sourced from the
book, not re-derived by calling the code under test.
"""

import numpy as np
import pytest

from mgr_tpu.ops import mfcc as M


CFG = M.MFCCConfig()  # the reference's HTK config (config_HCopy)


def test_mel_scale_published_points():
    # Mel(700 Hz) = 2595 log10(2): a textbook constant of the
    # O'Shaughnessy/HTK mel scale.
    assert M._hz_to_mel(700.0) == pytest.approx(781.1728, abs=1e-3)
    # 1000 Hz maps to ~1000 mel — the scale's design anchor.
    assert M._hz_to_mel(1000.0) == pytest.approx(999.9855, abs=1e-3)
    # Nyquist for the 16 kHz reference audio.
    assert M._hz_to_mel(8000.0) == pytest.approx(2840.0230, abs=1e-3)
    # Round trip.
    assert M._mel_to_hz(M._hz_to_mel(3456.7)) == pytest.approx(
        3456.7, rel=1e-6
    )


def test_lifter_gains_htk_book_eq512():
    """Lifter gain table for L=22, n=1..12 — hand-evaluated from
    eq. 5.12. n=11 is EXACTLY 12.0 (sin(pi/2)=1); the table is
    symmetric about n=11 (gain(12)=gain(10))."""
    expected = [
        2.5655, 4.0991, 5.5696, 6.9470, 8.2035, 9.3132,
        10.2538, 11.0060, 11.5544, 11.8880, 12.0000, 11.8880,
    ]
    w = M._lifter_weights(12, 22)
    np.testing.assert_allclose(w, expected, atol=2e-4)
    assert w[10] == pytest.approx(12.0, abs=1e-6)
    assert w[11] == pytest.approx(w[9], abs=1e-6)


def test_dct_flat_input_isolates_c0():
    """eq. 5.11 on a flat log-mel vector m_j = 1: every c_i (i>=1)
    vanishes (equally spaced cosine sum) and C0 = sqrt(2/26)*26 =
    sqrt(52). Pins both the sqrt(2/N) scaling and the (j - 0.5) phase
    (HTK's DCT-II); a (j) phase or orthonormal-DCT scaling fails."""
    dct = M._dct_matrix(26, 12)  # (26, 13), col 0 = C0
    out = np.ones(26) @ dct
    assert out[0] == pytest.approx(7.211103, abs=1e-5)  # sqrt(52)
    np.testing.assert_allclose(out[1:], 0.0, atol=1e-5)


def test_dct_cosine_input_isolates_ck():
    """m_j = cos(pi k (j-0.5)/N) returns sqrt(2/N)*(N/2) = sqrt(13) in
    slot k and ~0 elsewhere — the DCT-II orthogonality relation with
    HTK's scaling."""
    j = np.arange(26) + 0.5
    for k in (1, 5, 12):
        m = np.cos(np.pi * k * j / 26.0)
        out = m @ M._dct_matrix(26, 12)
        assert out[k] == pytest.approx(3.605551, abs=1e-5)  # sqrt(13)
        others = np.delete(out, k)
        np.testing.assert_allclose(others, 0.0, atol=1e-5)


def test_filterbank_mel_domain_triangles():
    """§5.4: filters are triangular and equally spaced along the mel
    scale. Pinned properties:
      * channel-1 center = melmax/(P+1) = 105.186 mel = 68.479 Hz
        (literal from eq. 5.13 at 16 kHz / 26 channels);
      * between the first and last centers adjacent filters form a
        partition of unity IN MEL (each bin's two weights sum to 1) —
        Hz-domain triangles (librosa-style) violate the interpolation
        ratio this implies;
      * each filter's weight at its own center bin is the mel-domain
        interpolation value, peaking toward 1.
    """
    fb = M._mel_filterbank(CFG)  # (257, 26)
    n_bins = CFG.fft_size // 2 + 1
    bin_hz = np.arange(n_bins) * CFG.sample_rate / CFG.fft_size
    bin_mel = 2595.0 * np.log10(1.0 + bin_hz / 700.0)

    center1_mel = 2840.0230 / 27.0
    assert center1_mel == pytest.approx(105.18604, abs=1e-3)
    center1_hz = 700.0 * (10.0 ** (center1_mel / 2595.0) - 1.0)
    assert center1_hz == pytest.approx(68.47927, abs=1e-3)

    # Partition of unity between centers 1 and 26.
    lo_mel, hi_mel = center1_mel, 26.0 * center1_mel
    inside = (bin_mel > lo_mel) & (bin_mel < hi_mel)
    np.testing.assert_allclose(fb[inside].sum(axis=1), 1.0, atol=1e-5)

    # Mel-domain (not Hz-domain) interpolation: for a bin between
    # centers m and m+1, the rising weight must equal
    # (mel - c_m)/(c_{m+1} - c_m). Checked on an arbitrary mid-band bin.
    b = 40  # 1250 Hz
    m = int(bin_mel[b] / center1_mel)  # channel whose rising edge covers b
    lo, hi = m * center1_mel, (m + 1) * center1_mel
    expect_up = (bin_mel[b] - lo) / (hi - lo)
    assert fb[b, m] == pytest.approx(expect_up, abs=1e-5)
    assert fb[b, m - 1] == pytest.approx(1.0 - expect_up, abs=1e-5)


def test_hamming_window_endpoints():
    """HTK uses the standard Hamming 0.54 - 0.46 cos(2 pi n/(N-1)):
    w[0] = w[-1] = 0.08 exactly; symmetric."""
    w = np.hamming(CFG.frame_len)
    assert w[0] == pytest.approx(0.08, abs=1e-12)
    assert w[-1] == pytest.approx(0.08, abs=1e-12)
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)


def test_preemphasis_in_frame_dc_gain():
    """HSigP.c PreEmphasise: s[0] *= (1-k) and s[n] -= k s[n-1] WITHIN
    the frame. On a DC signal every pre-emphasized sample — including
    the first — equals s*(1-k); a cross-frame (scipy lfilter-style)
    convention leaves frame-initial samples at full amplitude for
    every frame after the first."""
    sig = np.full(CFG.frame_len + 2 * CFG.frame_step, 0.5, np.float32)
    frames = np.asarray(M.frame_signal(sig, CFG))
    pre = np.concatenate(
        [frames[:, :1] * (1.0 - CFG.preemphasis),
         frames[:, 1:] - CFG.preemphasis * frames[:, :-1]],
        axis=1,
    )
    np.testing.assert_allclose(pre, 0.5 * (1.0 - 0.97), atol=1e-6)


def test_pure_tone_targets_bracketing_filter():
    """A 1 kHz tone (999.99 mel) lies between channel centers 9 and 10
    (9.508 channel widths of 105.186 mel): the filterbank response must
    peak at channel 9 or 10 (1-based). Distinguishes any off-by-one in
    the center grid."""
    t = np.arange(CFG.sample_rate // 2) / CFG.sample_rate
    sig = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    frames = np.asarray(M.frame_signal(sig, CFG))
    window = np.hamming(CFG.frame_len)
    spec = np.abs(np.fft.rfft(frames * window, n=CFG.fft_size, axis=1))
    mel = spec @ M._mel_filterbank(CFG)
    peak = int(np.argmax(mel.mean(axis=0)))  # 0-based
    assert peak in (8, 9), f"1 kHz tone peaked at channel {peak + 1}"
