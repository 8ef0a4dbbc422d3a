"""Dataset builders: reference on-disk layout -> cached-array Batchers.

Each builder reproduces one reference generator's preprocessing exactly
(downsampling, normalization, label handling, split), but does it ONCE
at build time into static-shape arrays (SURVEY.md §3.1 hot-loop fix).

Modes (mirroring the reference's dataset= switches,
/root/reference/multimodal_fusion/data_generator.py:54-77):
  train — split into train/val with the seeded reference split
  val   — everything in the validation list (decode a labeled set)
  final — like val but for unlabeled test data (dummy blank labels)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mgr_tpu.core.config import PipelineConfig
from mgr_tpu.data import formats
from mgr_tpu.data.batcher import (
    Batcher,
    pad_or_truncate,
    prepare_labels,
    reference_split,
)


def _input_length(cfg: PipelineConfig, true_len: int) -> int:
    """Frames visible to CTC. Reference parity: padded length minus the
    trim (data_generator.py:223) — CTC runs over padding. With
    padded_length_parity=False the true length is used instead."""
    if cfg.ctc.padded_length_parity:
        return cfg.maxlen - cfg.ctc.trim_frames
    return max(min(true_len, cfg.maxlen) - cfg.ctc.trim_frames, 1)


def _split_ids(
    ids: Sequence[int], cfg: PipelineConfig, mode: str
) -> Tuple[List[int], List[int]]:
    if mode == "train":
        return reference_split(
            ids, cfg.val_split, cfg.batch_size, seed=cfg.split_seed
        )
    return [], list(ids)


def _assemble(
    cfg: PipelineConfig,
    ids: Sequence[int],
    feats_of: Dict[int, np.ndarray],
    labels_map: Dict[int, List[int]],
    *,
    expand_words: bool,
    mode: str,
    second_feats_of: Optional[Dict[int, np.ndarray]] = None,
) -> Batcher:
    N = len(ids)
    F = next(iter(feats_of.values())).shape[-1]
    X = np.zeros((N, cfg.maxlen, F), np.float32)
    X2 = None
    if second_feats_of is not None:
        F2 = next(iter(second_feats_of.values())).shape[-1]
        X2 = np.zeros((N, cfg.maxlen, F2), np.float32)
    labels = np.zeros((N, cfg.max_label_len), np.int32)
    lab_len = np.zeros((N,), np.int32)
    in_len = np.zeros((N,), np.int32)
    blank = cfg.nb_classes - 1

    for i, fid in enumerate(ids):
        x = feats_of[fid]
        if cfg.downsample > 1:
            x = x[:: cfg.downsample]
        X[i], true_len = pad_or_truncate(x, cfg.maxlen)
        if X2 is not None:
            x2 = second_feats_of[fid]
            X2[i], _ = pad_or_truncate(x2, cfg.maxlen)
        seq = [] if mode == "final" else labels_map.get(fid, [])
        labels[i], lab_len[i] = prepare_labels(
            seq, cfg.max_label_len, blank, expand_words=expand_words
        )
        in_len[i] = _input_length(cfg, true_len)

    train_ids, val_ids = _split_ids(ids, cfg, mode)
    features = (X, X2) if X2 is not None else X
    return Batcher(features, labels, lab_len, in_len, ids, train_ids, val_ids)


# ---------------------------------------------------------------------------

def _corpus_cache_key(paths: List[str], cfg: PipelineConfig,
                      mode: str) -> str:
    """Content key: file identities + the geometry that shapes arrays."""
    import hashlib

    h = hashlib.sha1()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_mtime_ns}:{st.st_size};".encode())
    h.update(
        f"{cfg.maxlen}:{cfg.downsample}:{cfg.max_label_len}:"
        f"{cfg.nb_classes}:{cfg.ctc.trim_frames}:"
        f"{cfg.ctc.padded_length_parity}:{mode}".encode()
    )
    return h.hexdigest()[:20]


def build_audio_dataset(
    data_dir: str, label_file: str, cfg: PipelineConfig,
    mode: str = "train", cache_dir: Optional[str] = None,
) -> Batcher:
    """Speech pipeline: per-file audio CSVs + Id/Sequence labels with the
    class->word expansion (data_generator.py:56-240).

    ``cache_dir`` persists the featurized arrays to one .npz keyed by
    source mtimes + geometry, so subsequent runs skip the per-file CSV
    parse entirely (the reference re-parsed every file every STEP;
    SURVEY.md §3.1)."""
    ids = formats.list_audio_files(data_dir)
    paths = [os.path.join(data_dir, f"audio_{fid}.csv") for fid in ids]

    cache_path = None
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        key = _corpus_cache_key(paths + [label_file], cfg, mode)
        cache_path = os.path.join(cache_dir, f"audio_{key}.npz")
        if os.path.exists(cache_path):
            z = np.load(cache_path)
            train_ids, val_ids = _split_ids(ids, cfg, mode)
            return Batcher(
                z["X"], z["labels"], z["lab_len"], z["in_len"],
                ids, train_ids, val_ids,
            )

    feats = {
        fid: formats.load_audio_file_csv(path)
        for fid, path in zip(ids, paths)
    }
    labels_map = formats.load_label_csv(label_file) if mode != "final" else {}
    b = _assemble(cfg, ids, feats, labels_map, expand_words=True, mode=mode)
    if cache_path is not None:
        tmp = cache_path + ".tmp.npz"
        np.savez(tmp, X=b.features, labels=b.labels,
                 lab_len=b.label_lengths, in_len=b.input_lengths)
        os.replace(tmp, cache_path)
    return b


def build_skeletal_dataset(
    skeletal_csv: str, label_file: str, cfg: PipelineConfig,
    mode: str = "train",
) -> Batcher:
    """Skeletal pipeline: monolithic z-scored CSV, class-id labels
    (skeletal_lstm_ctc.py:65-134)."""
    feats = formats.load_skeletal_csv(skeletal_csv, normalize=True)
    ids = list(feats)  # order of appearance, like df['file_number'].unique()
    labels_map = formats.load_label_csv(label_file) if mode != "final" else {}
    return _assemble(
        cfg, ids, feats, labels_map, expand_words=False, mode=mode
    )


def build_early_fusion_dataset(
    audio_csv: str, skeletal_csv: str, cfg: PipelineConfig,
    mode: str = "train",
) -> Batcher:
    """Early fusion: monolithic labeled audio CSV (z-scored, x5
    downsample) + z-scored skeletal; labels are the unique non-zero
    frame codes in order (early_multimodal.py:80-232)."""
    audio = formats.load_monolithic_audio_csv(audio_csv, normalize=True)
    skel = formats.load_skeletal_csv(skeletal_csv, normalize=True)
    ids = [fid for fid in audio if fid in skel]
    feats = {fid: audio[fid][0] for fid in ids}
    labels_map = {}
    for fid in ids:
        frame_labels = audio[fid][1]
        # pandas .unique() semantics: first appearance order, once each
        # (early_multimodal.py:218-220).
        seen: List[int] = []
        for v in frame_labels:
            v = int(v)
            if v != 0 and v not in seen:
                seen.append(v)
        labels_map[fid] = seen
    # Skeletal stream is NOT downsampled (audio lands on the skeletal
    # 20 fps after its own x5); pre-downsample audio here and clear the
    # shared downsample so _assemble doesn't touch the skeletal stream.
    feats = {fid: x[:: cfg.downsample] for fid, x in feats.items()}
    cfg_nd = cfg.replace(downsample=1)
    return _assemble(
        cfg_nd, ids, feats, labels_map, expand_words=False, mode=mode,
        second_feats_of=skel,
    )


def build_late_fusion_dataset(
    audio_dir: str, skeletal_csv: str, label_file: str, cfg: PipelineConfig,
    mode: str = "train",
) -> Batcher:
    """Late fusion: per-file raw audio CSVs (x5 downsample, NOT
    normalized) + z-scored skeletal, keyed by shared file id
    (multimodal_fusion/data_generator.py:130-275)."""
    ids_a = formats.list_audio_files(audio_dir)
    skel = formats.load_skeletal_csv(skeletal_csv, normalize=True)
    ids = [fid for fid in ids_a if fid in skel]
    feats = {
        fid: formats.load_audio_file_csv(
            os.path.join(audio_dir, f"audio_{fid}.csv")
        )
        for fid in ids
    }
    feats = {fid: x[:: cfg.downsample] for fid, x in feats.items()}
    labels_map = formats.load_label_csv(label_file) if mode != "final" else {}
    cfg_nd = cfg.replace(downsample=1)
    return _assemble(
        cfg_nd, ids, feats, labels_map, expand_words=False, mode=mode,
        second_feats_of=skel,
    )


# ---------------------------------------------------------------------------
# RGB: videos are too large to cache densely ((T,60,60,1) x hundreds of
# files), so batches load lazily from per-video .npy with the padded
# buffer reused. Normalization (x-128)/255 matches cnn_lstm.py:186-188.
# ---------------------------------------------------------------------------

class LazyVideoBatcher(Batcher):
    def __init__(self, data_dir: str, names: List[str], cfg: PipelineConfig,
                 labels, lab_len, in_len, ids, train_ids, val_ids):
        super().__init__(None, labels, lab_len, in_len, ids, train_ids,
                         val_ids)
        self.data_dir = data_dir
        self.cfg = cfg
        self._name_of = dict(zip(ids, names))

    def _batch_from_rows(self, rows):
        raise NotImplementedError("use epoch(); lazy batcher slices by id")

    def _load_batch(self, chunk):
        cfg = self.cfg
        D = cfg.cnn.img_dim
        X = np.zeros((len(chunk), cfg.maxlen, D, D, 1), np.float32)
        rows = [self._row_of[f] for f in chunk]
        for j, fid in enumerate(chunk):
            x = formats.load_video_npy(
                os.path.join(self.data_dir, self._name_of[fid])
            )
            X[j], _ = pad_or_truncate(x, cfg.maxlen)
        X = (X - 128.0) / 255.0
        return chunk, {
            "inputs": X,
            "labels": self.labels[rows],
            "input_length": self.input_lengths[rows],
            "label_length": self.label_lengths[rows],
        }

    def epoch(self, batch_size, *, train=True, shuffle_seed=None,
              process_index=0, process_count=1, prefetch=2):
        """Background-prefetched video batches: the host decodes/pads the
        next batches on a worker thread while the device trains on the
        current one (the reference loaded every .npy synchronously in
        the step loop, cnn_lstm.py:146-188)."""
        import random as _random
        from concurrent.futures import ThreadPoolExecutor

        ids = list(self.train_ids if train else self.val_ids)
        if shuffle_seed is not None:
            _random.Random(shuffle_seed).shuffle(ids)
        chunks = [
            ids[i : i + batch_size]
            for j, i in enumerate(
                range(0, len(ids) - batch_size + 1, batch_size)
            )
            if j % process_count == process_index
        ]
        if not chunks:
            return
        with ThreadPoolExecutor(max_workers=1) as pool:
            futures = [
                pool.submit(self._load_batch, c)
                for c in chunks[: max(prefetch, 1)]
            ]
            next_submit = len(futures)
            for _ in range(len(chunks)):
                result = futures.pop(0).result()
                if next_submit < len(chunks):
                    futures.append(
                        pool.submit(self._load_batch, chunks[next_submit])
                    )
                    next_submit += 1
                yield result


def build_rgb_dataset(
    data_dir: str, label_file: str, cfg: PipelineConfig, mode: str = "train"
) -> LazyVideoBatcher:
    """RGB pipeline: per-video .npy + class-id labels
    (cnn_lstm.py:79-205). The split shuffles file NAMES (string sort)
    exactly like the reference (cnn_lstm.py:83-107)."""
    names = formats.list_video_files(data_dir)
    ids = [formats.video_file_id(n) for n in names]
    labels_map = formats.load_label_csv(label_file) if mode != "final" else {}
    N = len(ids)
    labels = np.zeros((N, cfg.max_label_len), np.int32)
    lab_len = np.zeros((N,), np.int32)
    in_len = np.zeros((N,), np.int32)
    blank = cfg.nb_classes - 1
    for i, fid in enumerate(ids):
        seq = [] if mode == "final" else labels_map.get(fid, [])
        labels[i], lab_len[i] = prepare_labels(
            seq, cfg.max_label_len, blank, expand_words=False
        )
        in_len[i] = cfg.maxlen - cfg.ctc.trim_frames
    if mode == "train":
        train_names, val_names = reference_split(
            names, cfg.val_split, cfg.batch_size, seed=cfg.split_seed
        )
        train_ids = [formats.video_file_id(n) for n in train_names]
        val_ids = [formats.video_file_id(n) for n in val_names]
    else:
        train_ids, val_ids = [], ids
    return LazyVideoBatcher(
        data_dir, names, cfg, labels, lab_len, in_len, ids, train_ids, val_ids
    )
