"""Learning end-to-end: training raises in-framework decode accuracy on
the learnable synthetic corpus."""

import numpy as np
import pytest

from mgr_tpu.core import config as cfglib
from mgr_tpu.core import prng
from mgr_tpu.data import datasets, synthetic
from mgr_tpu.decode.evaluate import evaluate_accuracy
from mgr_tpu.models import build_model
from mgr_tpu.train.loop import fit
from mgr_tpu.train.step import create_train_state


@pytest.mark.slow
def test_training_improves_decode_accuracy(tmp_path):
    csv_path, label_file, labels = synthetic.make_skeletal_dataset(
        str(tmp_path), n_files=8, frames_per_label=25, max_labels=2, seed=4
    )
    cfg = cfglib.get_preset("skeletal").replace(
        maxlen=64, batch_size=2, compute_dtype="float32",
        encoder=cfglib.EncoderConfig(hidden=16, depth=2, input_noise=0.1,
                                     dropout=(0.1, 0.1),
                                     output_dropout=0.1),
        optimizer=cfglib.OptimizerConfig(learning_rate=1e-2),
        patience=1000,
        ctc=cfglib.CTCConfig(padded_length_parity=False),
    )
    ds = datasets.build_skeletal_dataset(csv_path, label_file, cfg)
    model = build_model(cfg)

    state0 = create_train_state(model, prng.root_key(cfg.seed))
    before = evaluate_accuracy(model, state0.params, ds, use_lengths=True,
                               train_split=True)

    # CTC spends its first ~100 epochs in the all-blank collapse before
    # alignments emerge; ~450 tiny epochs reach 20-50% token accuracy on
    # the train split of this toy corpus (the exact figure is seed- and
    # dropout-draw-sensitive).
    res = fit(model, ds, workdir=None, epochs=450)
    after = evaluate_accuracy(model, res.state.params, ds,
                              use_lengths=True, train_split=True)

    assert np.isfinite(after["accuracy"])
    # Training must help substantially on this separable toy corpus.
    assert after["accuracy"] > before["accuracy"]
    assert after["accuracy"] >= 0.2
    assert after["wer"] < 0.9


def test_evaluate_runs_untrained():
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        csv_path, label_file, _ = synthetic.make_skeletal_dataset(
            root, n_files=4, frames_per_label=10, seed=5
        )
        cfg = cfglib.get_preset("skeletal").replace(
            maxlen=24, batch_size=2, compute_dtype="float32",
            encoder=cfglib.EncoderConfig(hidden=4, depth=2,
                                         input_noise=0.0,
                                         dropout=(0.0, 0.0),
                                         output_dropout=0.0),
        )
        ds = datasets.build_skeletal_dataset(csv_path, label_file, cfg)
        model = build_model(cfg)
        state = create_train_state(model, prng.root_key(0))
        m = evaluate_accuracy(model, state.params, ds)
        assert set(m) >= {"accuracy", "wer", "corr", "sent_accuracy"}


@pytest.mark.slow
def test_speech_training_improves_word_accuracy(tmp_path):
    """Covers the class->word expansion path end to end: labels expand
    to the 44-word space, decode maps back through WORDS."""
    data_dir, label_file, _ = synthetic.make_audio_dataset(
        str(tmp_path), n_files=8, frames_per_label=100, max_labels=2,
        seed=11,
    )
    cfg = cfglib.get_preset("speech").replace(
        maxlen=64, batch_size=2, compute_dtype="float32",
        encoder=cfglib.EncoderConfig(hidden=16, depth=2, input_noise=0.1,
                                     dropout=(0.1, 0.1),
                                     output_dropout=0.1),
        optimizer=cfglib.OptimizerConfig(learning_rate=1e-2),
        patience=1000,
        ctc=cfglib.CTCConfig(padded_length_parity=False),
    )
    ds = datasets.build_audio_dataset(data_dir, label_file, cfg)
    model = build_model(cfg)
    state0 = create_train_state(model, prng.root_key(cfg.seed))
    before = evaluate_accuracy(model, state0.params, ds, use_lengths=True,
                               train_split=True)
    res = fit(model, ds, workdir=None, epochs=300)
    after = evaluate_accuracy(model, res.state.params, ds,
                              use_lengths=True, train_split=True)
    assert np.isfinite(after["accuracy"])
    assert after["accuracy"] > before["accuracy"]
    assert after["accuracy"] >= 0.2
