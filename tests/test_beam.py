"""CTC prefix beam search: exactness on tiny cases, merging semantics."""

import itertools
import math

import numpy as np

from mgr_tpu.decode.beam import beam_decode_batch, ctc_beam_search


def _brute_force_best(probs, blank):
    """Enumerate all alignments, sum per collapsed label sequence."""
    T, C = probs.shape
    scores = {}
    for path in itertools.product(range(C), repeat=T):
        p = 1.0
        for t, k in enumerate(path):
            p *= probs[t, k]
        # collapse repeats then drop blanks
        seq = []
        prev = None
        for k in path:
            if k != prev:
                if k != blank:
                    seq.append(k)
            prev = k
        seq = tuple(seq)
        scores[seq] = scores.get(seq, 0.0) + p
    return max(scores.items(), key=lambda kv: kv[1])


def test_matches_brute_force_enumeration():
    rng = np.random.default_rng(0)
    T, C = 4, 3  # blank = 2
    probs = rng.dirichlet(np.ones(C), size=T)
    best_seq, best_p = _brute_force_best(probs, blank=2)
    beams = ctc_beam_search(probs, beam_width=50, blank=2,
                            prune_logp=-100.0)
    got_seq, got_logp = beams[0]
    assert got_seq == best_seq
    np.testing.assert_allclose(math.exp(got_logp), best_p, rtol=1e-6)


def test_repeat_needs_blank_between():
    # Posteriors: class 0 dominant everywhere except a blank spike in the
    # middle -> best sequence is (0, 0), two tokens split by the blank.
    C, blank = 3, 2
    probs = np.full((5, C), 0.01)
    for t in (0, 1, 3, 4):
        probs[t, 0] = 0.98
    probs[2, blank] = 0.98
    probs /= probs.sum(axis=1, keepdims=True)
    beams = ctc_beam_search(probs, beam_width=10, blank=blank)
    assert beams[0][0] == (0, 0)


def test_greedy_agreement_on_confident_input():
    # With near-one-hot frames beam search equals collapsed best-path.
    C, blank = 4, 3
    classes = [0, 0, blank, 1, 1, 2]
    probs = np.full((len(classes), C), 0.005)
    for t, k in enumerate(classes):
        probs[t, k] = 0.985
    probs /= probs.sum(axis=1, keepdims=True)
    out = beam_decode_batch(probs[None], beam_width=5)
    assert out[0] == [0, 1, 2]


def test_trim_and_lengths():
    C, blank = 3, 2
    probs = np.full((6, C), 0.01)
    probs[:2, 1] = 0.98  # trimmed away
    probs[2:4, 0] = 0.98
    probs[4:, 1] = 0.98  # beyond input_length
    probs /= probs.sum(axis=1, keepdims=True)
    out = beam_decode_batch(
        probs[None], input_lengths=[2], trim_frames=2, beam_width=5
    )
    assert out[0] == [0]
