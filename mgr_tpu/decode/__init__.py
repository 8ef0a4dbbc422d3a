"""Decoding: batched best-path search, MLF transcripts, scoring."""

from mgr_tpu.decode.decoder import decode_probs, Decoder  # noqa: F401
from mgr_tpu.decode.mlf import read_mlf, write_mlf  # noqa: F401
from mgr_tpu.decode.scorer import edit_distance, score_sequences  # noqa: F401
