"""PRNG threading helpers.

The reference's determinism knobs are a pair of global seeds
(`random.seed(10)` for splits, `RandomUniform(seed=47)` for weights —
/root/reference/audio_network/data_generator.py:72,
/root/reference/audio_network/speech_lstm_ctc_words.py:42-44).
Here every source of randomness is an explicit `jax.random` key derived
from a named fold, so runs are reproducible across host counts and the
same code is safe under `pjit`/`shard_map`.
"""

from __future__ import annotations

from typing import Dict, Iterator, Sequence

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold_name(key: jax.Array, name: str) -> jax.Array:
    """Derive a sub-key from a string name (stable across runs)."""
    # Stable 32-bit hash of the name (Python's hash() is salted per process).
    h = 2166136261
    for ch in name.encode("utf-8"):
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return jax.random.fold_in(key, h)


def split_dict(key: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    return {name: fold_name(key, name) for name in names}


def step_stream(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of per-step keys (host-side loop use only)."""
    step = 0
    while True:
        yield jax.random.fold_in(key, step)
        step += 1
