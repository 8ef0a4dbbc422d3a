"""Offline audio featurization: WAV -> 39-d MFCC -> per-file CSVs.

Replaces the external HTK HCopy stage (/root/reference/config_HCopy:1-13,
README.md:35-38) with the in-graph featurizer (mgr_tpu.ops.mfcc), writing
the exact per-file ``audio_<id>.csv`` layout the loaders consume
(39 feature columns + ``file_number``).
"""

from __future__ import annotations

import os
import re
import wave
from typing import List, Optional, Tuple

import numpy as np

from mgr_tpu.ops.mfcc import MFCCConfig, mfcc_39


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """16-bit PCM WAV -> (float32 mono samples, sample_rate)."""
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32)
    elif width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
    else:
        raise ValueError(f"{path}: unsupported sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, rate


def featurize_wav(path: str, cfg: Optional[MFCCConfig] = None) -> np.ndarray:
    """One WAV -> (T, 39) MFCC+deltas, HTK conventions."""
    import jax.numpy as jnp

    samples, rate = read_wav(path)
    cfg = cfg or MFCCConfig(sample_rate=rate)
    if cfg.sample_rate != rate:
        cfg = MFCCConfig(
            sample_rate=rate, frame_ms=cfg.frame_ms, step_ms=cfg.step_ms,
            preemphasis=cfg.preemphasis, num_filters=cfg.num_filters,
            num_ceps=cfg.num_ceps, lifter=cfg.lifter,
            delta_window=cfg.delta_window, fft_size=cfg.fft_size,
        )
    return np.asarray(mfcc_39(jnp.asarray(samples), cfg))


def extract_directory(
    wav_dir: str,
    out_dir: str,
    *,
    file_pattern: str = r"Sample(\d+)",
    cfg: Optional[MFCCConfig] = None,
) -> List[int]:
    """Featurize every WAV in ``wav_dir`` into ``out_dir/audio_<id>.csv``.

    Returns the file ids written."""
    os.makedirs(out_dir, exist_ok=True)
    header = ",".join(str(i) for i in range(39)) + ",file_number"
    ids: List[int] = []
    for name in sorted(os.listdir(wav_dir)):
        if not name.lower().endswith(".wav"):
            continue
        m = re.search(file_pattern, name)
        if not m:
            continue
        fid = int(m.group(1))
        feats = featurize_wav(os.path.join(wav_dir, name), cfg)
        rows = np.concatenate(
            [feats, np.full((feats.shape[0], 1), fid, np.float32)], axis=1
        )
        np.savetxt(
            os.path.join(out_dir, f"audio_{fid}.csv"), rows,
            delimiter=",", header=header, comments="", fmt="%.6f",
        )
        ids.append(fid)
    return ids
