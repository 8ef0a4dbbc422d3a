"""In-framework accuracy evaluation: decode a split and score it against
the dataset's own labels — no HTK round-trip (SURVEY.md §5.5).

The reference's only evaluation path was: decode -> write MLF -> score
externally with HResults. Here the ids never leave the process.
"""

from __future__ import annotations

from typing import Dict, Optional

from mgr_tpu.data.batcher import Batcher
from mgr_tpu.decode.decoder import DECODE_SPECS, Decoder, DecodeSpec
from mgr_tpu.decode.scorer import score_sequences
from mgr_tpu.models.zoo import ModelDef


def evaluate_accuracy(
    model: ModelDef,
    params,
    data: Batcher,
    *,
    pipeline: Optional[str] = None,
    train_split: bool = False,
    spec: Optional[DecodeSpec] = None,
    use_lengths: bool = False,
) -> Dict[str, float]:
    """Best-path-decode a split and return HTK-style corpus metrics
    (accuracy / corr / wer / sentence accuracy) in label-id space."""
    import dataclasses

    pipeline = pipeline or model.config.name
    # Unlike the MLF outputs (which keep blank as a "sil" token for HTK
    # scoring), in-framework accuracy drops blanks so hypotheses compare
    # directly against the label sequences.
    s = spec or dataclasses.replace(DECODE_SPECS[pipeline], drop_blank=True)
    dec = Decoder.for_model(model, params, pipeline, s)

    refs: Dict[str, list] = {}
    hyps: Dict[str, list] = {}
    cfg = model.config
    batches = []
    for ids, batch in data.epoch(cfg.batch_size, train=train_split):
        for j, fid in enumerate(ids):
            n = int(batch["label_length"][j])
            refs[str(fid)] = batch["labels"][j, :n].tolist()
        batches.append((ids, batch))

    for fid, tokens in dec.decode_batches(iter(batches),
                                          use_lengths=use_lengths):
        # Map decoded display tokens back to ids? decode_batches returns
        # vocab tokens; compare in token space by mapping refs forward.
        hyps[str(fid)] = tokens

    id_to_tok = s.vocab
    refs_tok = {
        k: [id_to_tok[int(i)] for i in v] for k, v in refs.items()
    }
    metrics = score_sequences(refs_tok, hyps)
    if not refs:
        # The split had fewer files than one batch: the reference's
        # remainder-drop semantics (data_generator.py:82-93) yield zero
        # batches, so the zeros above mean "nothing scored", not "0%
        # accurate" — say so instead of failing silently.
        metrics["note"] = (
            "no full batch in this split (remainder-drop semantics); "
            "reduce batch_size to score it"
        )
    return metrics
