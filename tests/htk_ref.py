"""Independent HTK MFCC_0 reference implementation (tests only).

A deliberate scalar/loop transliteration of HTK 3.4's HSigP.c
(PreEmphasise, Ham, Wave2FBank, Wave2MFCC, WeightCepstrum, FZero) and
HParm.c's Regression (deltas), following the HTK Book equations — kept
structurally independent of mgr_tpu.ops.mfcc (which is vectorized
matmul JAX) so the two cross-validate each other. Parameters fixed to
the reference's config (/root/reference/config_HCopy:1-13): MFCC_0,
25 ms / 10 ms, Hamming, preemph 0.97, NUMCHANS 26, CEPLIFTER 22,
NUMCEPS 12; Δ/ΔΔ with DELTAWINDOW=ACCWINDOW=2 per README.md:35.
"""

import numpy as np

FS = 16000
FRAME_LEN = 400  # WINDOWSIZE 250000 (100 ns units) @ 16 kHz
FRAME_STEP = 160  # TARGETRATE 100000
FFT_N = 512  # next power of two >= FRAME_LEN (HTK default)
NUMCHANS = 26
NUMCEPS = 12
CEPLIFTER = 22
PREEMCOEF = 0.97
MELFLOOR = 1.0
DELTAWINDOW = 2


def _mel(f_hz):
    # HTK's MEL macro uses the natural-log form with constant 1127.
    return 1127.0 * np.log(1.0 + f_hz / 700.0)


def _fbank_one_frame(frame):
    """One frame (FRAME_LEN,) -> (NUMCHANS,) log mel-filterbank values,
    via HTK's loChan/loWt scatter (triangles linear in mel)."""
    s = frame.astype(np.float64).copy()
    # PreEmphasise: s[i] -= k*s[i-1] from the end down; s[0] *= 1-k.
    for i in range(FRAME_LEN - 1, 0, -1):
        s[i] -= PREEMCOEF * s[i - 1]
    s[0] *= 1.0 - PREEMCOEF
    # Ham: 0.54 - 0.46 cos(2 pi i / (n-1)).
    for i in range(FRAME_LEN):
        s[i] *= 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (FRAME_LEN - 1))
    # FFT magnitude, zero-padded to FFT_N.
    spec = np.abs(np.fft.rfft(s, FFT_N))

    # Filterbank channel centers: cf[c] = c/(P+1) * mel(Nyquist), with
    # mlo = 0; maxChan = P+1.
    max_chan = NUMCHANS + 1
    mhi = _mel(FS / 2.0)
    cf = np.array([c / max_chan * mhi for c in range(0, max_chan + 1)])

    fbank = np.zeros(NUMCHANS + 1)  # 1-based channels, [0] unused
    # Wave2FBank: bins klo=2..khi=Nby2 (1-based), i.e. skip DC and
    # Nyquist; scatter each bin between loChan and loChan+1.
    for k in range(2, FFT_N // 2 + 1):  # 1-based bin index
        f_hz = (k - 1) * FS / FFT_N
        melk = _mel(f_hz)
        chan = 1
        while chan <= max_chan and cf[chan] < melk:
            chan += 1
        lo_chan = chan - 1
        if lo_chan > 0:
            lo_wt = (cf[lo_chan + 1] - melk) / (cf[lo_chan + 1] - cf[lo_chan])
        else:
            lo_wt = (cf[1] - melk) / cf[1]
        ek = spec[k - 1]
        if lo_chan > 0:
            fbank[lo_chan] += lo_wt * ek
        if lo_chan < NUMCHANS:
            fbank[lo_chan + 1] += (1.0 - lo_wt) * ek
    # TakeLogs with the HTK mel floor.
    for c in range(1, NUMCHANS + 1):
        fbank[c] = np.log(max(fbank[c], MELFLOOR))
    return fbank[1:]


def htk_mfcc0_static(signal):
    """(S,) waveform -> (T, 13) HTK MFCC_0 statics: [c1..c12, C0]."""
    n_frames = 1 + (len(signal) - FRAME_LEN) // FRAME_STEP
    out = np.zeros((n_frames, NUMCEPS + 1))
    mfnorm = np.sqrt(2.0 / NUMCHANS)
    for t in range(n_frames):
        frame = signal[t * FRAME_STEP : t * FRAME_STEP + FRAME_LEN]
        fb = _fbank_one_frame(frame)
        # Wave2MFCC: c_j = mfnorm * sum_chan fb[chan] cos(pi j (chan-.5)/P)
        for j in range(1, NUMCEPS + 1):
            acc = 0.0
            for chan in range(1, NUMCHANS + 1):
                acc += fb[chan - 1] * np.cos(
                    np.pi * j / NUMCHANS * (chan - 0.5)
                )
            c = mfnorm * acc
            # WeightCepstrum: 1 + (L/2) sin(pi j / L), c1..c12 only.
            c *= 1.0 + (CEPLIFTER / 2.0) * np.sin(np.pi * j / CEPLIFTER)
            out[t, j - 1] = c
        # FZero (C0, unliftered), appended last.
        out[t, NUMCEPS] = mfnorm * fb.sum()
    return out


def htk_deltas(feats, window=DELTAWINDOW):
    """HParm Regression with head/tail frame replication."""
    T, D = feats.shape
    denom = 2.0 * sum(th * th for th in range(1, window + 1))
    out = np.zeros_like(feats)
    for t in range(T):
        for th in range(1, window + 1):
            fwd = feats[min(t + th, T - 1)]
            bwd = feats[max(t - th, 0)]
            out[t] += th * (fwd - bwd)
    return out / denom


def htk_mfcc39(signal):
    static = htk_mfcc0_static(np.asarray(signal, np.float64))
    d1 = htk_deltas(static)
    d2 = htk_deltas(d1)
    return np.concatenate([static, d1, d2], axis=1)
