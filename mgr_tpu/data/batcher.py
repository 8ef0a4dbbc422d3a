"""Batch assembly: splits, padding, label prep — featurize ONCE, slice
per step.

The reference's documented hot loop re-reads and re-pads every CSV every
epoch (/root/reference/audio_network/data_generator.py:153-240,
SURVEY.md §3.1). Here all sequences are padded into static-shape arrays
at dataset build time; a training step's batch is a pure array slice,
so the host never touches the filesystem inside the step loop.
"""

from __future__ import annotations

import random
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mgr_tpu.data import vocab as vocab_lib


def reference_split(
    file_list: Sequence,
    val_split: float,
    batch_size: int,
    seed: int = 10,
) -> Tuple[List, List]:
    """Replicates the reference's deterministic split exactly:
    ``random.seed(10); random.shuffle(file_list)`` then an 80/20 cut and
    remainder-dropping so batches divide evenly
    (data_generator.py:71-93). Uses Python's stdlib ``random`` so the
    resulting lists are bit-identical to the reference's."""
    files = list(file_list)
    rng = random.Random()
    rng.seed(seed)
    rng.shuffle(files)
    split_point = int(len(files) * (1 - val_split))
    train, val = files[:split_point], files[split_point:]
    train_rem = len(train) % batch_size
    if train_rem:
        del train[-train_rem:]
    val_rem = len(val) % batch_size
    if val_rem:
        del val[-val_rem:]
    return train, val


def pad_or_truncate(seq: np.ndarray, maxlen: int) -> Tuple[np.ndarray, int]:
    """Post-pad with zeros / post-truncate to (maxlen, F); returns the
    true (pre-pad) length. Matches keras pad_sequences(padding='post',
    truncating='post') as used at data_generator.py:194-198."""
    true_len = min(seq.shape[0], maxlen)
    if seq.shape[0] >= maxlen:
        return np.ascontiguousarray(seq[:maxlen]), true_len
    pad = np.zeros((maxlen - seq.shape[0],) + seq.shape[1:], seq.dtype)
    return np.concatenate([seq, pad], axis=0), true_len


def prepare_labels(
    class_seq: Sequence[int],
    max_label_len: int,
    blank: int,
    *,
    expand_words: bool = False,
) -> Tuple[np.ndarray, int]:
    """Class-id sequence -> (-1-padded int32 labels, length).

    ``expand_words`` applies the class->word expansion of the speech
    pipeline (data_generator.py:204). Empty sequences become a single
    blank label (the reference's fallback, data_generator.py:206-213)."""
    seq = list(class_seq)
    if expand_words:
        seq = vocab_lib.class_seq_to_word_seq(seq)
    if len(seq) == 0:
        seq = [blank]
    seq = seq[:max_label_len]
    out = np.full((max_label_len,), -1, np.int32)
    out[: len(seq)] = np.asarray(seq, np.int32)
    return out, len(seq)


class Batcher:
    """Slices pre-featurized arrays into step batches.

    ``features`` is one (N, T, F...) array or a tuple of two for fusion
    models. Epoch-end reshuffle matches the reference's
    ``on_epoch_end`` (data_generator.py:267-283) but is driven by an
    explicit seed rather than global state."""

    def __init__(
        self,
        features,
        labels: np.ndarray,
        label_lengths: np.ndarray,
        input_lengths: np.ndarray,
        file_ids: Sequence[int],
        train_ids: Sequence[int],
        val_ids: Sequence[int],
    ):
        self.features = features
        self.labels = labels
        self.label_lengths = label_lengths
        self.input_lengths = input_lengths
        self.file_ids = list(file_ids)
        self._row_of = {fid: i for i, fid in enumerate(self.file_ids)}
        self.train_ids = list(train_ids)
        self.val_ids = list(val_ids)

    def num_batches(self, batch_size: int, train: bool = True) -> int:
        ids = self.train_ids if train else self.val_ids
        return len(ids) // batch_size

    def _batch_from_rows(self, rows: List[int]) -> Dict[str, np.ndarray]:
        batch = {
            "labels": self.labels[rows],
            "input_length": self.input_lengths[rows],
            "label_length": self.label_lengths[rows],
        }
        if isinstance(self.features, tuple):
            batch["inputs"] = self.features[0][rows]
            batch["inputs2"] = self.features[1][rows]
        else:
            batch["inputs"] = self.features[rows]
        return batch

    def device_arrays(self) -> Dict[str, np.ndarray]:
        """The full featurized corpus as one dict of arrays, for
        device-resident training (upload once, gather batches on-device
        by row index — no per-step host transfer)."""
        out = {
            "labels": self.labels,
            "input_length": self.input_lengths,
            "label_length": self.label_lengths,
        }
        if isinstance(self.features, tuple):
            out["inputs"] = self.features[0]
            out["inputs2"] = self.features[1]
        else:
            out["inputs"] = self.features
        return out

    def epoch_indices(
        self,
        batch_size: int,
        *,
        train: bool = True,
        shuffle_seed: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[Tuple[List[int], np.ndarray]]:
        """Like :meth:`epoch` but yields (file_ids, row-index array)
        instead of materialized batches — the device-resident path."""
        ids = list(self.train_ids if train else self.val_ids)
        if shuffle_seed is not None:
            random.Random(shuffle_seed).shuffle(ids)
        starts = range(0, len(ids) - batch_size + 1, batch_size)
        for j, i in enumerate(starts):
            if j % process_count != process_index:
                continue
            chunk = ids[i : i + batch_size]
            yield chunk, np.asarray(
                [self._row_of[f] for f in chunk], np.int32
            )

    def epoch(
        self,
        batch_size: int,
        *,
        train: bool = True,
        shuffle_seed: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ) -> Iterator[Tuple[List[int], Dict[str, np.ndarray]]]:
        """Yields (file_ids, batch) covering the split once.

        Multi-host: every process shuffles identically (same seed) and
        takes a strided slice of the batch stream, so each host feeds
        its local devices a disjoint shard — the per-host data loading
        the reference never needed (SURVEY.md §2.3)."""
        ids = list(self.train_ids if train else self.val_ids)
        if shuffle_seed is not None:
            random.Random(shuffle_seed).shuffle(ids)
        starts = range(0, len(ids) - batch_size + 1, batch_size)
        for j, i in enumerate(starts):
            if j % process_count != process_index:
                continue
            chunk = ids[i : i + batch_size]
            rows = [self._row_of[f] for f in chunk]
            yield chunk, self._batch_from_rows(rows)
