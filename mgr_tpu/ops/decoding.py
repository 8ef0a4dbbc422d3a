"""Batched on-device best-path decoding.

Vectorized re-design of the reference's per-sequence Python decode loop
(/root/reference/audio_network/sequence_decoding.py:40-53):
  per-frame argmax + max-prob -> drop frames below a confidence
  threshold -> collapse consecutive repeats -> (optionally) keep the
  blank as an output token ("sil"), exactly as the reference does.

Deliberate behavioral deviation (documented per SURVEY.md §2.2): the
reference's threshold filter mutates the lists it zips over
(sequence_decoding.py:45-48), silently skipping the element after every
removal. Here thresholding is a pure vectorized mask — the correct
semantics of "drop all frames with confidence < threshold".
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def best_path_decode(
    probs: jax.Array,
    input_lengths: Optional[jax.Array] = None,
    *,
    threshold: float = 0.0,
    trim_frames: int = 0,
    collapse: bool = True,
    blank: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(B, T, C) frame probabilities -> (best, emit) of shape (B, T').

    ``best`` holds the per-frame argmax class; ``emit[b, t]`` is True for
    frames that survive thresholding and repeat-collapse — the emitted
    token sequence is ``best[b, emit[b]]`` in time order (ragged, so the
    gather happens on host via :func:`emitted_sequences`).

    ``blank`` — if given, blank frames are dropped from the output; the
    reference keeps them (blank doubles as the "sil" word,
    sequence_decoding.py:29), so the default is None.
    """
    if trim_frames:
        probs = probs[:, trim_frames:, :]
    B, T, C = probs.shape
    conf = jnp.max(probs, axis=-1)
    best = jnp.argmax(probs, axis=-1).astype(jnp.int32)

    valid = jnp.ones((B, T), bool)
    if threshold > 0.0:
        valid &= conf >= threshold
    if input_lengths is not None:
        valid &= jnp.arange(T)[None, :] < input_lengths.reshape(B, 1)

    if collapse:
        # Index of the most recent valid frame strictly before t:
        # exclusive cumulative max over (t if valid else -1).
        idx = jnp.where(valid, jnp.arange(T)[None, :], -1)
        inclusive = jax.lax.associative_scan(jnp.maximum, idx, axis=1)
        prev_idx = jnp.concatenate(
            [jnp.full((B, 1), -1), inclusive[:, :-1]], axis=1
        )
        prev_best = jnp.take_along_axis(
            best, jnp.maximum(prev_idx, 0), axis=1
        )
        emit = valid & ((prev_idx < 0) | (best != prev_best))
    else:
        emit = valid

    if blank is not None:
        emit &= best != blank
    return best, emit


def emitted_sequences(
    best: np.ndarray, emit: np.ndarray
) -> List[List[int]]:
    """Host-side ragged extraction of the emitted token sequences."""
    best = np.asarray(best)
    emit = np.asarray(emit)
    return [best[b][emit[b]].tolist() for b in range(best.shape[0])]
