"""Offline RGB ROI extraction: video -> (T, 60, 60, 1) upper-body .npy.

Replaces /root/reference/rgb_network/roi_extraction.py:18-100. The crop
geometry + cubic resize runs on-device via mgr_tpu.ops.image (one vmapped
XLA op per video); video DECODE stays on host — from .mp4 when OpenCV is
available (gated import; not a hard dependency), or from pre-extracted
grayscale frame .npy files otherwise.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List

import numpy as np

from mgr_tpu.data.skeletal_pipeline import parse_kinect_csv


def _load_video_frames(path: str) -> np.ndarray:
    """(T, H, W) grayscale frames from .mp4 (cv2) or .npy."""
    if path.endswith(".npy"):
        x = np.load(path)
        if x.ndim == 4:
            x = x[..., 0]
        return x.astype(np.float32)
    try:
        import cv2  # noqa: PLC0415 — optional, not in the base image
    except ImportError as e:
        raise RuntimeError(
            "mp4 decode needs OpenCV; pre-extract frames to .npy instead"
        ) from e
    cap = cv2.VideoCapture(path)
    frames = []
    while cap.isOpened():
        ret, img = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY))
    cap.release()
    return np.asarray(frames, np.float32)


def extract_video(
    video_path: str,
    hip: np.ndarray,
    shc: np.ndarray,
    out_dim: int = 60,
) -> np.ndarray:
    """One video + (T, 2) hip/shoulder-center tracks -> (T, D, D, 1)."""
    import jax.numpy as jnp

    from mgr_tpu.ops.image import extract_upper_body_video

    frames = _load_video_frames(video_path)
    T = frames.shape[0]
    # Align skeletal tracks with the frame count (truncate/edge-pad).
    def fit(track):
        if track.shape[0] >= T:
            return track[:T]
        pad = np.repeat(track[-1:], T - track.shape[0], axis=0)
        return np.concatenate([track, pad], axis=0)

    hip, shc = fit(hip), fit(shc)
    valid = jnp.asarray((hip.sum(axis=1) > 0) & (shc.sum(axis=1) > 0))
    out = extract_upper_body_video(
        jnp.asarray(frames), jnp.asarray(hip), jnp.asarray(shc),
        out_dim, valid,
    )
    return np.asarray(out, np.float32)


def extract_directory(
    video_dir: str,
    skeletal_dir: str,
    out_dir: str,
    *,
    out_dim: int = 60,
    file_pattern: str = r"Sample(\d+)",
) -> List[int]:
    """ROI-extract every video; skeletal hip/shc come from the raw Kinect
    CSVs in ``skeletal_dir`` (same Sample##### naming)."""
    os.makedirs(out_dir, exist_ok=True)
    skel_by_id: Dict[int, str] = {}
    for name in os.listdir(skeletal_dir):
        m = re.search(file_pattern, name)
        if m and name.endswith(".csv"):
            skel_by_id[int(m.group(1))] = os.path.join(skeletal_dir, name)

    ids: List[int] = []
    for name in sorted(os.listdir(video_dir)):
        if not (name.endswith(".mp4") or name.endswith(".npy")):
            continue
        m = re.search(file_pattern, name)
        if not m:
            continue
        fid = int(m.group(1))
        if fid not in skel_by_id:
            print(f"skipping {name}: no skeletal CSV")
            continue
        joints = parse_kinect_csv(skel_by_id[fid])
        out = extract_video(
            os.path.join(video_dir, name), joints["hip"], joints["shc"],
            out_dim,
        )
        np.save(os.path.join(out_dir, f"Sample{fid:05d}_color.npy"),
                out.astype(np.uint8))
        ids.append(fid)
    return ids
