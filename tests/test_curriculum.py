"""End-to-end curriculum: speech + skeletal -> late fusion with frozen
grafted encoders, then decode to MLF and score — the reference's full
recipe (README.md:32-53) on tiny synthetic data."""

import jax
import numpy as np
import pytest

from mgr_tpu.core import config as cfglib
from mgr_tpu.data import datasets, synthetic, vocab
from mgr_tpu.decode import Decoder, read_mlf, score_sequences
from mgr_tpu.models import build_model
from mgr_tpu.train.curriculum import (
    build_fusion_with_pretrained,
    run_curriculum,
)
from mgr_tpu.train.step import make_predict_step


def _enc(h):
    return cfglib.EncoderConfig(hidden=h, depth=2, input_noise=0.1,
                                dropout=(0.1, 0.1), output_dropout=0.1)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("curr"))
    sk_csv, sk_labels, labels = synthetic.make_skeletal_dataset(
        root, n_files=6, frames_per_label=20, seed=1
    )
    audio_dir, audio_labels, _ = synthetic.make_audio_dataset(
        root, n_files=6, frames_per_label=50, seed=0
    )
    return dict(root=root, sk_csv=sk_csv, sk_labels=sk_labels,
                audio_dir=audio_dir, audio_labels=audio_labels,
                labels=labels)


@pytest.fixture(scope="module")
def configs():
    base = dict(maxlen=32, batch_size=2, compute_dtype="float32",
                optimizer=cfglib.OptimizerConfig(learning_rate=3e-3),
                patience=50)
    sp = cfglib.get_preset("speech").replace(encoder=_enc(6), **base)
    sk = cfglib.get_preset("skeletal").replace(encoder=_enc(4), **base)
    lf = cfglib.get_preset("late_fusion").replace(
        encoder=_enc(6), fusion_hidden=4, **base
    )
    return {"speech": sp, "skeletal": sk, "late_fusion": lf}


@pytest.mark.slow  # full curriculum + decode, ~75 s
def test_full_curriculum_and_decode(corpus, configs, tmp_path):
    workdir = str(tmp_path)
    sp, sk, lf = (configs[k] for k in ("speech", "skeletal", "late_fusion"))

    speech_ds = datasets.build_audio_dataset(
        corpus["audio_dir"], corpus["audio_labels"], sp
    )
    skeletal_ds = datasets.build_skeletal_dataset(
        corpus["sk_csv"], corpus["sk_labels"], sk
    )
    fusion_ds = datasets.build_late_fusion_dataset(
        corpus["audio_dir"], corpus["sk_csv"], corpus["sk_labels"], lf
    )

    results = run_curriculum(
        speech_ds, skeletal_ds, fusion_ds, workdir,
        configs=configs, epochs=2,
    )
    assert set(results) == {"speech", "skeletal", "late_fusion"}
    for r in results.values():
        assert np.isfinite(r.best_val_loss)

    # The fusion state's frozen encoders must equal the grafted
    # pretrained weights bit-for-bit after training.
    fusion_model, grafted = build_fusion_with_pretrained(
        workdir, lf, {"speech": sp, "skeletal": sk}
    )
    trained = results["late_fusion"].state.params
    for a, b in zip(
        jax.tree.leaves(grafted["speech"]), jax.tree.leaves(trained["speech"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Decode the fusion validation set to an MLF and score it.
    predict = make_predict_step(fusion_model)
    dec = Decoder(lambda inputs: predict(trained, inputs), "late_fusion")
    batches = fusion_ds.epoch(lf.batch_size, train=False)
    results_list = dec.decode_batches(batches)
    assert len(results_list) >= 1
    mlf_path = f"{workdir}/final_ctc_recout.mlf"
    dec.write_mlf(mlf_path, results_list)
    hyps = read_mlf(mlf_path)
    assert all(name.startswith("Sample") for name in hyps)

    # Score against the true label sequences (token space).
    refs = {
        f"Sample{fid:05d}": [
            vocab.GESTURE_CODES[c] for c in corpus["labels"][fid]
        ]
        for fid, _ in results_list
    }
    metrics = score_sequences(refs, hyps)
    assert metrics["N"] > 0
    assert np.isfinite(metrics["accuracy"])
