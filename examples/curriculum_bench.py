"""Full three-stage curriculum wall-clock at ChaLearn scale on real TPU.

Measures the end-to-end training time of the reference's complete
recipe (speech -> skeletal -> late fusion with frozen grafted encoders,
/root/reference/README.md:32-53) at the reference's dataset geometry:

  * ~400 train / ~300 val sequences per stage (ChaLearn 2013 splits:
    gather_skeletal.py:21 splits at file id 403; the mixer then moves 95
    val files into train, util/mix_data.py:24-32 — we use 400/300),
  * padded length 1900 frames, 39-d audio / 20-d skeletal features,
  * full reference models: BiLSTM(500)x2 speech, BiLSTM(300)x2 skeletal,
    frozen-encoder fusion with BiLSTM(100), CTC over 44 / 22 classes.

The reference trains this schedule in ~100 hours on a GTX 1060 at
batch 2 (README.md:55). Here each stage is a production `fit()` over a
device-resident corpus at batch 128 (the single-chip HBM cap) with the
fused Pallas kernels. Feature content is synthetic (timings do not
depend on values); per-epoch wall time is taken from fit()'s own epoch
records, steady state = median over epochs >= 2 (epochs 0-1 carry jit
compilation). The projection multiplies steady-state epoch time by the
reference's 500-epoch ceiling (speech_lstm_ctc_words.py:146) — an upper
bound, since EarlyStopping(patience 20) typically fires much earlier.

Run: `python examples/curriculum_bench.py` (one TPU process at a time).
Prints one JSON line; latest measured numbers live in README.md and
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgr_tpu.core import config as cfglib
from mgr_tpu.data.batcher import Batcher
from mgr_tpu.models import build_model
from mgr_tpu.train.loop import fit

# Scale knobs (env-overridable so the smoke test can run this on CPU
# with toy geometry; defaults are the real ChaLearn-scale benchmark).
N_TRAIN = int(os.environ.get("MGR_TPU_CB_NTRAIN", "400"))
N_VAL = int(os.environ.get("MGR_TPU_CB_NVAL", "300"))
EPOCHS = int(os.environ.get("MGR_TPU_CB_EPOCHS", "12"))  # 0-1 = compile
MAXLEN = int(os.environ.get("MGR_TPU_CB_MAXLEN", "0")) or None
BATCH = int(os.environ.get("MGR_TPU_CB_BATCH", "0")) or None
HIDDEN_SCALE = float(os.environ.get("MGR_TPU_CB_HIDDEN_SCALE", "1"))
REF_EPOCH_CEILING = 500
REF_TOTAL_HOURS = 100.0


def _make_batcher(cfg, *, n_labels: int, seed: int) -> Batcher:
    """In-memory corpus at reference geometry for one pipeline."""
    rng = np.random.default_rng(seed)
    n = N_TRAIN + N_VAL
    T = cfg.maxlen

    def stream(F):
        return rng.standard_normal((n, T, F)).astype(np.float32)

    if cfg.second_stream_feats:
        feats = (stream(cfg.num_feats), stream(cfg.second_stream_feats))
    else:
        feats = stream(cfg.num_feats)
    labels = np.full((n, cfg.max_label_len), -1, np.int32)
    labels[:, :n_labels] = rng.integers(
        1, cfg.nb_classes - 1, size=(n, n_labels)
    )
    return Batcher(
        features=feats,
        labels=labels,
        label_lengths=np.full((n,), n_labels, np.int32),
        input_lengths=np.full((n,), T - cfg.ctc.trim_frames, np.int32),
        file_ids=list(range(n)),
        train_ids=list(range(N_TRAIN)),
        val_ids=list(range(N_TRAIN, n)),
    )


def _bench_stage(cfg, data, workdir, *, resume=False):
    model = build_model(cfg)
    t0 = time.time()
    result = fit(model, data, workdir=workdir, epochs=EPOCHS, resume=resume)
    wall = time.time() - t0
    steady = result.history[2:] or result.history
    epoch_s = statistics.median(rec["wall_s"] for rec in steady)
    return {
        "epoch_s": round(epoch_s, 3),
        "as_run_s": round(wall, 1),
        "projected_500ep_s": round(epoch_s * REF_EPOCH_CEILING, 1),
    }


def main() -> None:
    import tempfile

    # Reference hyperparameters, batch raised to the single-chip HBM cap
    # (the reference's batch-2 ceiling was its GPU memory wall,
    # rgb_network/cnn_lstm.py:121 — larger batch IS the TPU story).
    # patience lifted so the timing run is never cut short on synthetic
    # (unlearnable) features.
    def scaled(name, batch):
        cfg = cfglib.get_preset(name).replace(
            batch_size=BATCH or batch, patience=EPOCHS + 1
        )
        if MAXLEN:
            cfg = cfg.replace(maxlen=MAXLEN)
        if HIDDEN_SCALE != 1:
            import dataclasses
            enc = dataclasses.replace(
                cfg.encoder, hidden=max(4, int(cfg.encoder.hidden * HIDDEN_SCALE))
            )
            cfg = cfg.replace(
                encoder=enc,
                fusion_hidden=max(4, int(cfg.fusion_hidden * HIDDEN_SCALE)),
            )
        return cfg

    stages = {
        "speech": scaled("speech", 128),
        "skeletal": scaled("skeletal", 128),
        "late_fusion": scaled("late_fusion", 64),
    }
    label_counts = {"speech": 20, "skeletal": 10, "late_fusion": 10}

    out = {}
    with tempfile.TemporaryDirectory() as workdir:
        for i, (name, cfg) in enumerate(stages.items()):
            data = _make_batcher(cfg, n_labels=label_counts[name], seed=i)
            if name == "late_fusion":
                # Graft the just-trained encoders exactly as the
                # curriculum does (train/curriculum.py::run_curriculum).
                from mgr_tpu.core import checkpoint as ckpt_lib
                from mgr_tpu.core import prng
                from mgr_tpu.train.curriculum import (
                    build_fusion_with_pretrained,
                )
                from mgr_tpu.train.step import create_train_state

                fusion_model, grafted = build_fusion_with_pretrained(
                    workdir, cfg,
                    {k: stages[k] for k in ("speech", "skeletal")},
                )
                state = create_train_state(
                    fusion_model, prng.root_key(cfg.seed)
                )
                state = state._replace(params=grafted)
                ckpt_lib.save_checkpoint(workdir, cfg.name, state,
                                         slot="latest")
                out[name] = _bench_stage(cfg, data, workdir, resume=True)
            else:
                out[name] = _bench_stage(cfg, data, workdir)

    total_projected = sum(s["projected_500ep_s"] for s in out.values())
    print(json.dumps({
        "metric": "curriculum_wall_clock",
        "stages": out,
        "projected_500ep_total_s": round(total_projected, 1),
        "projected_500ep_total_min": round(total_projected / 60.0, 1),
        "reference_hours": REF_TOTAL_HOURS,
        "speedup_vs_reference": round(
            REF_TOTAL_HOURS * 3600.0 / total_projected, 1
        ),
    }))


if __name__ == "__main__":
    main()
