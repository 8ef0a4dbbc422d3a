"""Host decode orchestration: predict -> best-path -> tokens -> MLF.

Mirrors the reference's four decode scripts with their per-pipeline
conventions (SURVEY.md §2.2 "best-path decode recipe"):

  pipeline      threshold  MLF entry name        source
  speech        0.75       Sample#####_audio     audio_network/sequence_decoding.py:46,61
  late_fusion   0.50       Sample#####           multimodal_fusion/sequence_decoding.py:46,61
  early_fusion  0.97       Sample#####           early_fusion/sequence_decoding.py:282
  rgb           off        Sample#####           rgb_network/decode_rgb.py:232-237 (commented out)
  skeletal      0.50       Sample#####           (no reference decoder; fusion convention)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

from mgr_tpu.data import vocab as vocab_lib
from mgr_tpu.decode import mlf as mlf_lib
from mgr_tpu.ops.decoding import best_path_decode, emitted_sequences


@dataclass(frozen=True)
class DecodeSpec:
    threshold: float
    vocab: Dict[int, str]
    entry_suffix: str = ""
    trim_frames: int = 2
    collapse: bool = True
    drop_blank: bool = False  # reference keeps blank as the "sil" token


DECODE_SPECS: Dict[str, DecodeSpec] = {
    "speech": DecodeSpec(0.75, vocab_lib.WORDS, entry_suffix="_audio"),
    "late_fusion": DecodeSpec(0.5, vocab_lib.GESTURE_CODES),
    "early_fusion": DecodeSpec(0.97, vocab_lib.GESTURE_CODES),
    "rgb": DecodeSpec(0.0, vocab_lib.GESTURE_CODES),
    "skeletal": DecodeSpec(0.5, vocab_lib.GESTURE_CODES),
}

# MLF artifact names per pipeline (reference file names).
MLF_FILENAMES: Dict[str, str] = {
    "speech": "ctc_recout.mlf",  # sequence_decoding.py:35
    "late_fusion": "final_ctc_recout.mlf",  # multimodal .py:33
    "early_fusion": "final_ctc_recout.mlf",  # early_fusion .py:271
    "rgb": "rgb_ctc_recout.mlf",  # decode_rgb.py:222
    "skeletal": "sk_ctc_recout.mlf",
}


def decode_probs(
    probs: np.ndarray,
    spec: DecodeSpec,
    input_lengths: Optional[np.ndarray] = None,
) -> List[List[str]]:
    """(B, T, C) softmax probabilities -> token sequences."""
    import jax.numpy as jnp

    blank = probs.shape[-1] - 1 if spec.drop_blank else None
    best, emit = best_path_decode(
        jnp.asarray(probs),
        None if input_lengths is None else jnp.asarray(input_lengths),
        threshold=spec.threshold,
        trim_frames=spec.trim_frames,
        collapse=spec.collapse,
        blank=blank,
    )
    id_seqs = emitted_sequences(np.asarray(best), np.asarray(emit))
    return [vocab_lib.ids_to_tokens(s, spec.vocab) for s in id_seqs]


class Decoder:
    """Batched decoder for one pipeline.

    Two operation modes:
      * ``decode_fn(inputs, input_lengths|None) -> (best, emit)`` — the
        fused on-device path (mgr_tpu.train.make_decode_step): only the
        int argmax + emit mask cross the host boundary. Preferred.
      * ``predict_fn(inputs) -> (B, T, C) softmax probs`` — the
        reference-shaped path (sub-model posteriors fetched to host,
        sequence_decoding.py:104-111), kept for probe/debug use.
    """

    def __init__(
        self,
        predict_fn: Optional[Callable[..., np.ndarray]] = None,
        pipeline: str = "speech",
        spec: Optional[DecodeSpec] = None,
        decode_fn: Optional[Callable[..., tuple]] = None,
    ):
        if predict_fn is None and decode_fn is None:
            raise ValueError("need predict_fn or decode_fn")
        self.predict_fn = predict_fn
        self.decode_fn = decode_fn
        self.pipeline = pipeline
        self.spec = spec or DECODE_SPECS[pipeline]

    def decode_batches(
        self,
        batches: Iterable[Tuple[Sequence[int], object]],
        *,
        use_lengths: bool = False,
    ) -> List[Tuple[int, List[str]]]:
        """batches: iterable of (file_ids, batch_dict).

        Returns [(file_id, tokens)] in input order. ``use_lengths``
        masks decoding to true sequence lengths instead of the padded
        length (a flag-gated improvement over the reference, which
        decodes padding frames too)."""
        results: List[Tuple[int, List[str]]] = []
        for file_ids, batch in batches:
            inputs = (
                (batch["inputs"], batch["inputs2"])
                if "inputs2" in batch
                else batch["inputs"]
            )
            lengths = (
                np.asarray(batch["input_length"]) if use_lengths else None
            )
            if self.decode_fn is not None:
                best, emit = self.decode_fn(inputs, lengths)
                id_seqs = emitted_sequences(np.asarray(best),
                                            np.asarray(emit))
                seqs = [
                    vocab_lib.ids_to_tokens(s, self.spec.vocab)
                    for s in id_seqs
                ]
            else:
                probs = np.asarray(self.predict_fn(inputs))
                seqs = decode_probs(probs, self.spec, lengths)
            results.extend(zip(file_ids, seqs))
        return results

    @staticmethod
    def for_model(model, params, pipeline: str,
                  spec: Optional[DecodeSpec] = None,
                  mesh=None) -> "Decoder":
        """Build a Decoder on the fused on-device decode step.

        ``mesh`` — decode the batch data-parallel over a device mesh
        (pure-DP or DP x direction-TP; see make_decode_step)."""
        from mgr_tpu.train.step import make_decode_step

        s = spec or DECODE_SPECS[pipeline]
        step = make_decode_step(
            model, threshold=s.threshold, trim_frames=s.trim_frames,
            drop_blank=s.drop_blank, mesh=mesh,
        )
        return Decoder(
            pipeline=pipeline, spec=s,
            decode_fn=lambda inputs, lengths: step(params, inputs, lengths),
        )

    def write_mlf(
        self,
        path: str,
        results: Sequence[Tuple[int, List[str]]],
        *,
        ignore_list: Sequence[int] = vocab_lib.DECODE_IGNORE_LIST,
    ) -> None:
        entries = [
            (mlf_lib.entry_name(fid, self.spec.entry_suffix), tokens)
            for fid, tokens in results
            if int(fid) not in set(ignore_list)
        ]
        mlf_lib.write_mlf(path, entries)
