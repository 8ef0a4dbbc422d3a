"""Benchmark: flagship speech BLSTM+CTC training throughput on one chip.

Prints ONE JSON line:
  {"metric": "train_seqs_per_sec_per_chip", "value": N, "unit": "seq/s",
   "vs_baseline": N}

Baseline derivation (BASELINE.md): the reference trains the full
3-stage system in ~100 h on a GTX 1060 at batch 2 over ~1900-frame
padded sequences — an implied train throughput of roughly 1.5
sequences/sec (SURVEY.md §6 "implied throughput floor"). vs_baseline is
measured seq/s divided by that 1.5 seq/s floor.

The benched step is the REAL train step at reference geometry — full
speech preset (BiLSTM(500)x2 over 1900 frames, 44-way CTC, Adam +
clip + maxnorm) — on synthetic data, jitted once, timed over repeated
steps with device sync.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_SEQS_PER_SEC = 1.5
BATCH = 128  # fits HBM with the fused Pallas recurrence + bf16 activations
WARMUP_STEPS = 2
TIMED_STEPS = 10


def main() -> None:
    from mgr_tpu.core import config as cfglib
    from mgr_tpu.core import prng
    from mgr_tpu.models import build_model
    from mgr_tpu.train import create_train_state, make_train_step

    cfg = cfglib.get_preset("speech").replace(batch_size=BATCH)
    model = build_model(cfg)
    state = create_train_state(model, prng.root_key(cfg.seed))
    step = make_train_step(model)

    rng = np.random.default_rng(0)
    B, T, F = BATCH, cfg.maxlen, cfg.num_feats
    batch = {
        "inputs": jnp.asarray(
            rng.standard_normal((B, T, F)).astype(np.float32)
        ),
        "labels": jnp.asarray(
            np.pad(
                rng.integers(1, cfg.nb_classes - 1, size=(B, 8)),
                ((0, 0), (0, cfg.max_label_len - 8)),
                constant_values=-1,
            ).astype(np.int32)
        ),
        "input_length": jnp.full((B,), T - cfg.ctc.trim_frames, jnp.int32),
        "label_length": jnp.full((B,), 8, jnp.int32),
    }

    key = jax.random.key(0)
    for i in range(WARMUP_STEPS):
        state, metrics = step(state, batch, jax.random.fold_in(key, i), 1.0)
    float(metrics["loss"])  # host fetch: hard sync (block_until_ready can
    # return before remote execution finishes on relayed PJRT backends)

    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        state, metrics = step(
            state, batch, jax.random.fold_in(key, 100 + i), 1.0
        )
    float(metrics["loss"])  # hard sync
    dt = time.perf_counter() - t0

    seqs_per_sec = BATCH * TIMED_STEPS / dt
    n_chips = max(len(jax.devices()), 1)
    value = seqs_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "train_seqs_per_sec_per_chip",
                "value": round(value, 3),
                "unit": "seq/s",
                "vs_baseline": round(value / REFERENCE_SEQS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
