"""Dataset mixer — re-design of /root/reference/util/mix_data.py:18-178.

Moves a deterministic sample of validation files into the training set,
consistently across the audio, skeletal, and label streams, and explodes
monolithic audio CSVs into the per-file layout the loaders consume.

Determinism note: the reference samples indices with Python 2's
``random.seed(10); random.sample(xrange(n), 95)`` (mix_data.py:27-28).
Python 3's ``random.sample`` draws a different sequence for the same
seed, so we replicate the reference's *mechanism* (seeded sample of 95
index positions, sorted) with Python 3 semantics and document the
deviation — the exact Py2 draw is unrecoverable without a Py2 runtime.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Sequence, Tuple

import pandas as pd


def sample_validation_files(
    val_file_list: Sequence[int], n_moved: int = 95, seed: int = 10
) -> Tuple[List[int], List[int]]:
    """Pick ``n_moved`` validation files to move into training
    (mix_data.py:18-32). Returns (moved_to_train, kept_in_val)."""
    rng = random.Random(seed)
    n = len(val_file_list)
    n_moved = min(n_moved, n)
    idx = sorted(rng.sample(range(n), n_moved))
    moved = [val_file_list[i] for i in idx]
    kept = sorted(set(val_file_list) - set(moved))
    return moved, kept


def mix_frame_datasets(
    train_csv: str, val_csv: str, moved: Sequence[int],
    out_train: str, out_val: str, id_col: str = "file_number",
) -> None:
    """Move rows of ``moved`` file ids from the validation CSV into the
    training CSV (mix_data.py:35-56), writing the two new sets."""
    val_df = pd.read_csv(val_csv)
    moved_df = val_df.loc[val_df[id_col].isin(moved)]
    rest_df = val_df.loc[~val_df[id_col].isin(moved)]
    train_df = pd.concat([pd.read_csv(train_csv), moved_df],
                         ignore_index=True)
    train_df.to_csv(out_train, index=False)
    rest_df.to_csv(out_val, index=False)


def mix_label_csvs(
    train_labels_csv: str, val_labels_csv: str, moved: Sequence[int],
    out_train: str, out_val: str,
) -> None:
    """Same move for the Id/Sequence label CSVs (mix_data.py:87-104)."""
    train_df = pd.read_csv(train_labels_csv)
    val_df = pd.read_csv(val_labels_csv)
    moved_df = val_df.loc[val_df["Id"].isin(moved)]
    rest_df = val_df.loc[~val_df["Id"].isin(moved)]
    pd.concat([train_df, moved_df], ignore_index=True).to_csv(
        out_train, index=False
    )
    rest_df.to_csv(out_val, index=False)


def explode_audio_csv(
    monolithic_csv: str, out_dir: str,
    file_list: Sequence[int] | None = None,
) -> List[int]:
    """Split a monolithic audio CSV into per-file ``audio_<id>.csv``
    (mix_data.py:59-84, 107-125). Returns the ids written."""
    os.makedirs(out_dir, exist_ok=True)
    df = pd.read_csv(monolithic_csv)
    ids = (
        list(file_list)
        if file_list is not None
        else [int(x) for x in pd.unique(df["file_number"])]
    )
    for fid in ids:
        vf = df[df["file_number"] == fid]
        vf.to_csv(os.path.join(out_dir, f"audio_{fid}.csv"), index=False)
    return ids


def mix_all(
    *,
    audio_train_csv: str,
    audio_val_csv: str,
    skeletal_train_csv: str,
    skeletal_val_csv: str,
    train_labels_csv: str,
    val_labels_csv: str,
    out_root: str,
    n_moved: int = 95,
    seed: int = 10,
) -> Dict[str, object]:
    """Full mix_data.py main routine (mix_data.py:130-178): sample 95 val
    files, merge them into training across labels/audio/skeletal, and
    explode the per-file audio directories."""
    os.makedirs(out_root, exist_ok=True)
    val_ids = [
        int(x)
        for x in pd.unique(
            pd.read_csv(audio_val_csv, usecols=["file_number"])["file_number"]
        )
    ]
    moved, kept = sample_validation_files(val_ids, n_moved, seed)

    mix_label_csvs(
        train_labels_csv, val_labels_csv, moved,
        os.path.join(out_root, "training.csv"),
        os.path.join(out_root, "validation.csv"),
    )

    train_ids = [
        int(x)
        for x in pd.unique(
            pd.read_csv(audio_train_csv, usecols=["file_number"])[
                "file_number"
            ]
        )
    ]
    train_dir = os.path.join(out_root, "train_audio")
    val_dir = os.path.join(out_root, "val_audio")
    explode_audio_csv(audio_train_csv, train_dir, train_ids)
    explode_audio_csv(audio_val_csv, train_dir, moved)
    explode_audio_csv(audio_val_csv, val_dir, kept)

    mix_frame_datasets(
        skeletal_train_csv, skeletal_val_csv, moved,
        os.path.join(out_root, "Training_set_skeletal.csv"),
        os.path.join(out_root, "Validation_set_skeletal.csv"),
    )
    return {"moved": moved, "kept": kept, "train_ids": train_ids}
