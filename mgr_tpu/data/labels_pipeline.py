"""ChaLearn annotation files -> labels.

Re-design of the reference's label writer
(/root/reference/skeletal_network/skeletal_feature_extraction.py:219-267):
per-sample ``Sample#####_data_labels.csv`` files hold space-delimited
rows of (gesture_name, _, start_frame, _, end_frame); gestures map to
class ids via the canonical dict (GESTURE_NAME_TO_ID). Produces:

  * per-frame label vectors (0 for unlabeled/inactive frames — the
    reference masks frames flagged inactive by the activity detector,
    skeletal_feature_extraction.py:253-261);
  * ordered class-id sequences per sample;
  * ``Id,Sequence`` label CSVs consumed by every dataset builder.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mgr_tpu.data.vocab import GESTURE_NAME_TO_ID

Entry = Tuple[str, int, int]  # (gesture name, start frame, end frame)


def parse_label_file(path: str) -> List[Entry]:
    """One annotation file -> [(name, start, end)] in file order."""
    out: List[Entry] = []
    with open(path) as f:
        for line in f:
            parts = line.replace(",", " ").split()
            if not parts:
                continue
            name = parts[0]
            nums = [int(p) for p in parts[1:] if re.fullmatch(r"-?\d+", p)]
            if len(nums) < 2:
                raise ValueError(f"{path}: bad label row {line!r}")
            # Reference row layout is (name, _, start, _, end): it drops
            # columns 1 and 3 (skeletal_feature_extraction.py:231). With
            # only two numeric fields, treat them as (start, end).
            if len(nums) >= 4:
                start, end = nums[1], nums[3]
            else:
                start, end = nums[0], nums[-1]
            out.append((name, start, end))
    return out


def frame_labels(
    num_frames: int,
    entries: Sequence[Entry],
    inactive: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(T,) int32 per-frame class ids; 0 outside gestures or where
    ``inactive`` is set. A frame f belongs to a gesture when
    start < f <= end (the reference's strict/inclusive comparison,
    skeletal_feature_extraction.py:257)."""
    labs = np.zeros((num_frames,), np.int32)
    for name, start, end in entries:
        cid = GESTURE_NAME_TO_ID.get(name)
        if cid is None:
            continue  # unknown names stay 0 ("oov")
        lo = max(start + 1, 0)
        hi = min(end, num_frames - 1)
        if hi >= lo:
            labs[lo : hi + 1] = cid
    if inactive is not None:
        labs = np.where(inactive[:num_frames].astype(bool), 0, labs)
    return labs


def sequence_labels(entries: Sequence[Entry]) -> List[int]:
    """Ordered class-id sequence (annotation order), unknown names
    dropped."""
    out = []
    for name, _, _ in entries:
        cid = GESTURE_NAME_TO_ID.get(name)
        if cid is not None:
            out.append(cid)
    return out


def build_label_csv(
    label_dir: str,
    out_csv: str,
    *,
    file_pattern: str = r"Sample(\d+)",
) -> Dict[int, List[int]]:
    """All annotation files in a directory -> Id,Sequence CSV (the
    training.csv/validation.csv the loaders consume)."""
    labels: Dict[int, List[int]] = {}
    for name in sorted(os.listdir(label_dir)):
        if not name.endswith(".csv"):
            continue
        m = re.search(file_pattern, name)
        if not m:
            continue
        entries = parse_label_file(os.path.join(label_dir, name))
        labels[int(m.group(1))] = sequence_labels(entries)
    from mgr_tpu.data.synthetic import write_label_csv

    write_label_csv(out_csv, labels)
    return labels
