"""Decoding ops, MLF round-trip, scorer."""

import numpy as np
import jax.numpy as jnp

from mgr_tpu.data import vocab
from mgr_tpu.decode import decoder, mlf, scorer
from mgr_tpu.ops.decoding import best_path_decode, emitted_sequences


def _probs_from_classes(classes, C, conf=0.9):
    """Build a (1, T, C) prob tensor whose argmax follows `classes`."""
    T = len(classes)
    p = np.full((1, T, C), (1 - conf) / (C - 1), np.float32)
    for t, c in enumerate(classes):
        p[0, t, c] = conf
    return p


def test_collapse_repeats():
    # classes over time: 1 1 2 2 2 3 1 -> emit 1 2 3 1
    probs = _probs_from_classes([1, 1, 2, 2, 2, 3, 1], C=5)
    best, emit = best_path_decode(jnp.asarray(probs), trim_frames=0)
    seqs = emitted_sequences(best, emit)
    assert seqs == [[1, 2, 3, 1]]


def test_threshold_drops_low_confidence_frames():
    probs = _probs_from_classes([1, 2, 3], C=4, conf=0.9)
    probs[0, 1] = np.array([0.3, 0.1, 0.35, 0.25])  # below 0.5, argmax=2
    best, emit = best_path_decode(
        jnp.asarray(probs), threshold=0.5, trim_frames=0
    )
    assert emitted_sequences(best, emit) == [[1, 3]]


def test_threshold_then_collapse_merges_across_dropped_frames():
    # 1 (low-conf 2) 1 -> after threshold the two 1s become adjacent and
    # collapse to a single 1. The reference's mutating-zip loop would
    # mis-handle this pattern; ours is the correct pure-mask semantics.
    probs = _probs_from_classes([1, 2, 1], C=4, conf=0.9)
    probs[0, 1] = np.array([0.3, 0.2, 0.4, 0.1])
    best, emit = best_path_decode(
        jnp.asarray(probs), threshold=0.5, trim_frames=0
    )
    assert emitted_sequences(best, emit) == [[1]]


def test_trim_frames_and_lengths():
    probs = _probs_from_classes([3, 3, 1, 2, 2, 1, 1], C=4)
    best, emit = best_path_decode(
        jnp.asarray(probs),
        input_lengths=jnp.asarray([3]),  # after trim: frames 1,2,2
        trim_frames=2,
    )
    assert emitted_sequences(best, emit) == [[1, 2]]


def test_blank_dropping_optional():
    C = 4  # blank = 3
    probs = _probs_from_classes([1, 3, 2, 3], C=C)
    best, emit = best_path_decode(
        jnp.asarray(probs), trim_frames=0, blank=C - 1
    )
    assert emitted_sequences(best, emit) == [[1, 2]]


def test_decode_probs_maps_vocab():
    C = vocab.NUM_GESTURE_CLASSES
    probs = _probs_from_classes([0, 0, 1, 1, 21, 2], C=C)
    spec = decoder.DecodeSpec(0.0, vocab.GESTURE_CODES, trim_frames=0)
    seqs = decoder.decode_probs(probs, spec)
    assert seqs == [["oov", "VA", "sil", "VQ"]]


def test_mlf_roundtrip(tmp_path):
    path = tmp_path / "out.mlf"
    entries = [
        (mlf.entry_name(7, "_audio"), ["Vieni", "qui", "sil"]),
        (mlf.entry_name(413), ["VA"]),
    ]
    mlf.write_mlf(path, entries)
    text = path.read_text()
    assert text.startswith("#!MLF!#\n")
    assert '"*/Sample00007_audio.rec"\n' in text
    assert text.endswith(".\n")
    back = mlf.read_mlf(path)
    assert back == {
        "Sample00007_audio": ["Vieni", "qui", "sil"],
        "Sample00413": ["VA"],
    }


def test_edit_distance():
    d, s, dl, ins = scorer.edit_distance([1, 2, 3], [1, 3])
    assert (d, s, dl, ins) == (1, 0, 1, 0)
    d, s, dl, ins = scorer.edit_distance([1, 2], [1, 3, 4])
    assert d == 2
    assert scorer.edit_distance([], [])[0] == 0
    assert scorer.edit_distance([1], [])[0] == 1


def test_score_sequences():
    refs = {"a": ["x", "y"], "b": ["z"]}
    hyps = {"a": ["x", "y"], "b": ["q"]}
    m = scorer.score_sequences(refs, hyps)
    assert m["N"] == 3
    np.testing.assert_allclose(m["accuracy"], (3 - 1) / 3)
    np.testing.assert_allclose(m["sent_accuracy"], 0.5)


def test_class_to_words_expansion():
    # class 2 "vieniqui" -> Vieni qui ; class 10 -> 5 words
    assert vocab.class_seq_to_word_seq([2]) == [2, 3]
    assert len(vocab.class_seq_to_word_seq([10])) == 5
    # Every class expands to valid word ids.
    for c in range(22):
        for w in vocab.class_seq_to_word_seq([c]):
            assert w in vocab.WORDS


def test_ignore_list_filtered_from_mlf(tmp_path):
    spec = decoder.DecodeSpec(0.0, vocab.GESTURE_CODES, trim_frames=0)
    d = decoder.Decoder(lambda x: x, "skeletal", spec)
    results = [(228, ["VA"]), (5, ["VQ"])]  # 228 is on the ignore list
    out = tmp_path / "x.mlf"
    d.write_mlf(str(out), results)
    back = mlf.read_mlf(out)
    assert list(back) == ["Sample00005"]


def test_fused_decoder_matches_probs_path():
    """Decoder.for_model (on-device argmax+emit) == posterior-fetch path."""
    import jax
    from mgr_tpu.core import config as cfglib
    from mgr_tpu.models import build_model
    from mgr_tpu.train.step import make_predict_step

    cfg = cfglib.get_preset("skeletal").replace(
        maxlen=20, num_feats=4, nb_classes=6, max_label_len=4,
        compute_dtype="float32",
        encoder=cfglib.EncoderConfig(hidden=4, depth=2, input_noise=0.0,
                                     dropout=(0.0, 0.0),
                                     output_dropout=0.0),
    )
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    spec = decoder.DecodeSpec(0.2, vocab.GESTURE_CODES, trim_frames=2)

    batch = {
        "inputs": np.asarray(
            jax.random.normal(jax.random.key(1), (2, 20, 4))
        ),
        "input_length": np.array([18, 18]),
        "labels": np.zeros((2, 4), np.int32),
        "label_length": np.array([1, 1]),
    }
    batches = [((7, 9), batch)]

    fused = decoder.Decoder.for_model(model, params, "skeletal", spec)
    got = fused.decode_batches(iter(batches))

    predict = make_predict_step(model)
    probs_path = decoder.Decoder(
        lambda inputs: predict(params, inputs), "skeletal", spec
    )
    want = probs_path.decode_batches(iter(batches))
    assert got == want


def test_read_mlf_htk_timed_labels(tmp_path):
    # HTK label lines may carry start/end times: "start end token [score]".
    p = tmp_path / "timed.mlf"
    p.write_text(
        "#!MLF!#\n"
        '"*/Sample00001.lab"\n'
        "0 1200000 VA -23.4\n"
        "1200000 2400000 sil\n"
        ".\n"
    )
    back = mlf.read_mlf(p)
    assert back == {"Sample00001": ["VA", "sil"]}
