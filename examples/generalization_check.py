"""Held-out (generalization) accuracy check on the production path.

Every accuracy row before round 5 was TRAIN accuracy on memorization
corpora; the reference's actual quality-control loop — best-VAL
checkpoint + EarlyStopping (speech_lstm_ctc_words.py:167-178,
ModelCheckpoint save_best_only on val_loss + EarlyStopping patience) —
had only been exercised mechanically (VERDICT r4 item 4). This script
drives that loop end-to-end and reports HELD-OUT decoded accuracy:

  * corpus: the synthetic generators' shared generative process — every
    class has a fixed signature vector (synthetic.py::_class_signature)
    and every FILE is a fresh noise draw around it, so unseen files are
    decodable exactly iff the model learned the class structure rather
    than the training files;
  * split: the reference's seeded 80/20 file split
    (data_generator.py:72 semantics via PipelineConfig.split_seed);
  * selection: fit(monitor="val") + EarlyStopping(patience) keeping the
    best-val state — the reference's loop, not best-train;
  * metric: decoded token accuracy on the VAL split from the best-val
    state (mgr_tpu.decode.evaluate), plus the train split for the gap.

Run on the chip: `python examples/generalization_check.py` (one TPU
process at a time; acquires the chip lock). Prints one JSON line.
`MGR_TPU_GEN_{FILES,EPOCHS,MAXLEN,BATCH,LR,ONLY,PATIENCE,...}` override
— see the knobs below. CPU smoke: tests/test_examples.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mgr_tpu.core.platform import apply_env_platform

apply_env_platform()

from mgr_tpu.core import campaign

campaign.own_chip_or_exit("generalization_check")

from mgr_tpu.core import config as cfglib
from mgr_tpu.data import datasets, synthetic
from mgr_tpu.decode.evaluate import evaluate_accuracy
from mgr_tpu.models import build_model
from mgr_tpu.train.loop import fit

# 200 files -> 160 train / 40 val at the reference's 0.2 split: enough
# fresh noise draws per class (22 classes x ~14 labels/file) that
# memorizing the train files is strictly worse on val than learning the
# class signatures.
N_FILES = int(os.environ.get("MGR_TPU_GEN_FILES", "200"))
EPOCHS = int(os.environ.get("MGR_TPU_GEN_EPOCHS", "2000"))
MAXLEN = int(os.environ.get("MGR_TPU_GEN_MAXLEN", "1900"))
BATCH = int(os.environ.get("MGR_TPU_GEN_BATCH", "32"))
LR = float(os.environ.get("MGR_TPU_GEN_LR", "3e-3"))
# speech | skeletal (comma-separated for both; default both)
ONLY = os.environ.get("MGR_TPU_GEN_ONLY", "speech,skeletal")
HIDDEN_SCALE = float(os.environ.get("MGR_TPU_GEN_HIDDEN_SCALE", "1"))
SYNC = int(os.environ.get("MGR_TPU_GEN_SYNC", "10"))
# EarlyStopping patience — counts VAL WINDOWS when SYNC > 1 (the val
# pass only exists on sync epochs, train/loop.py), so the default 20
# windows = 200 epochs at SYNC=10, mirroring the reference's
# EarlyStopping(patience=20) at its ~10x smaller epoch granularity.
PATIENCE = int(os.environ.get("MGR_TPU_GEN_PATIENCE", "20"))
ROOT = os.environ.get("MGR_TPU_GEN_ROOT", "")
# Persistent checkpoint dir so a relay crash mid-stage RESUMES instead
# of restarting a multi-hour chip run (review r5 finding). Defaults to
# <ROOT>/workdir whenever a persistent ROOT is given; "" (no ROOT, the
# CPU smokes) keeps the no-checkpoint behavior.
WORKDIR = os.environ.get("MGR_TPU_GEN_WORKDIR", "") or (
    os.path.join(ROOT, "workdir") if ROOT else ""
)
GUARD = int(os.environ.get("MGR_TPU_GEN_GUARD", "0") or 0)
# ChaLearn content density (8-20 gestures x ~90 skeletal frames) — the
# geometry every round-3/4 campaign used; 95%-padding corpora sit in
# the CTC all-blank basin for thousands of epochs (CLAUDE.md).
FPL = int(os.environ.get("MGR_TPU_GEN_FPL", "90"))
MAX_LABELS = int(os.environ.get("MGR_TPU_GEN_LABELS", "20"))
# Blank-dominance mitigation per stage ("skeletal:-3" table or a bare
# float for all) — measured unlock for skeletal-family CTC stacks.
_BIAS = os.environ.get("MGR_TPU_GEN_BLANK_BIAS", "skeletal:-3")
# ReduceLROnPlateau per stage: "skeletal:0.5/15/1e-4" =
# factor/patience/min_lr following the monitored TRAIN loss
# (cfg.reduce_lr_monitor default) — the measured remedy for the
# skeletal 3e-3 oscillation floor (curriculum_bench measured mode
# reached 0.9962 train in 400 epochs with exactly this anneal, where
# the constant-LR generalization run early-stopped at val 0.119).
_RLR = os.environ.get("MGR_TPU_GEN_RLR", "")


def _blank_bias(stage: str) -> float:
    return cfglib.parse_stage_table(_BIAS, stage, default=0.0) or 0.0


def _rlr(stage: str) -> dict:
    if not _RLR:
        return {}
    spec = None
    for part in _RLR.split(","):
        name, _, val = part.partition(":")
        if name.strip() == stage and val.strip():
            spec = val.strip()
    if spec is None:
        return {}
    fields = spec.split("/")
    if len(fields) != 3:
        raise SystemExit(
            f"MGR_TPU_GEN_RLR entry for '{stage}' must be "
            f"factor/patience/min_lr, got '{spec}'")
    return {
        "reduce_lr_factor": float(fields[0]),
        "reduce_lr_patience": int(fields[1]),
        "reduce_lr_min": float(fields[2]),
    }


def _opt(lr: float) -> "cfglib.OptimizerConfig":
    return cfglib.OptimizerConfig(
        learning_rate=lr, decay=1e-5, maxnorm=3.0,
        skip_nonfinite=100 if GUARD else 0,
    )


def _cfg(name: str, hidden: int) -> "cfglib.PipelineConfig":
    cfg = cfglib.get_preset(name)
    cfg = cfg.replace(
        maxlen=MAXLEN, batch_size=BATCH,
        encoder=cfglib.EncoderConfig(
            hidden=max(4, int(hidden * HIDDEN_SCALE)), depth=2,
            # Regularization actually matters here (unlike the
            # memorization checks): input noise + dropout push the
            # encoder toward the class signatures rather than file
            # identities. Rates still scaled below the reference's
            # 0.4-0.6 (sized for real 400-file ChaLearn data).
            input_noise=0.1, dropout=(0.1, 0.1), output_dropout=0.1,
            per_gate_dropout=True,
        ),
        optimizer=_opt(LR),
        patience=PATIENCE,
        head_blank_bias=_blank_bias(name),
        **_rlr(name),
    )
    assert cfg.ctc.padded_length_parity and cfg.ctc.trim_frames == 2
    return cfg


def _run(name: str, cfg, ds) -> dict:
    model = build_model(cfg)
    t0 = time.time()
    if WORKDIR:
        os.makedirs(WORKDIR, exist_ok=True)
    # The reference's quality-control loop: monitor the VAL loss,
    # early-stop on patience, keep the best-val state for decode.
    # With a persistent WORKDIR the run checkpoints and resumes (a
    # crash restart continues from `latest`; the `best` SLOT holds the
    # best-val state across restarts, which the decode below prefers
    # over the in-memory best of the final leg only).
    res = fit(model, ds, workdir=WORKDIR or None, epochs=EPOCHS,
              resume=bool(WORKDIR), checkpoint_every=100,
              monitor="val", keep_best_state=True, sync_every=SYNC)
    wall = time.time() - t0
    best = res.best_state if res.best_state is not None else res.state
    best_params = best.params
    if WORKDIR:
        from mgr_tpu.train.loop import load_params_for_eval

        try:
            best_params = load_params_for_eval(model, WORKDIR, slot="best")
        except Exception:
            pass  # no best slot written yet — fall back to in-memory
    val = evaluate_accuracy(model, best_params, ds, train_split=False)
    train = evaluate_accuracy(model, best_params, ds, train_split=True)
    return {
        "val_accuracy": round(val["accuracy"], 4),
        "val_wer": round(val["wer"], 4),
        "train_accuracy": round(train["accuracy"], 4),
        "generalization_gap": round(
            train["accuracy"] - val["accuracy"], 4
        ),
        "epochs_run": res.epochs_run,
        "early_stopped": res.epochs_run < EPOCHS,
        "best_val_loss": round(res.best_val_loss, 3),
        "wall_s": round(wall, 1),
    }


def main() -> int:
    stages = [s.strip() for s in ONLY.split(",") if s.strip()]
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        root = ROOT or tmp
        os.makedirs(root, exist_ok=True)
        reuse = bool(ROOT)
        if "speech" in stages:
            # Audio rides at 5x the skeletal frame rate pre-downsample
            # (the pipeline's x5 stride), like the real dataset.
            audio_dir, lab, _ = synthetic.make_audio_dataset(
                root, n_files=N_FILES, n_classes=22,
                frames_per_label=5 * FPL, max_labels=MAX_LABELS,
                seed=11, reuse=reuse,
            )
            cfg = _cfg("speech", 500)
            ds = datasets.build_audio_dataset(audio_dir, lab, cfg)
            out["speech"] = _run("speech", cfg, ds)
            print(json.dumps({"stage": "speech", **out["speech"]}),
                  flush=True)
        if "skeletal" in stages:
            sk_csv, sk_lab, _ = synthetic.make_skeletal_dataset(
                root, n_files=N_FILES, n_classes=22,
                frames_per_label=FPL, max_labels=MAX_LABELS,
                seed=12, reuse=reuse,
            )
            cfg = _cfg("skeletal", 300)
            ds = datasets.build_skeletal_dataset(sk_csv, sk_lab, cfg)
            out["skeletal"] = _run("skeletal", cfg, ds)
            print(json.dumps({"stage": "skeletal", **out["skeletal"]}),
                  flush=True)
    print(json.dumps({
        "metric": "heldout_generalization",
        "n_files": N_FILES,
        "val_split": 0.2,
        "maxlen": MAXLEN,
        **{k: v for k, v in out.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
