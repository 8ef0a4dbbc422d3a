"""Residual BLSTM encoder — the block every reference pipeline repeats.

Shape: GaussianNoise(sigma) -> BiLSTM_1 -> BiLSTM_2 -> add(BiLSTM_1, BiLSTM_2)
(/root/reference/audio_network/speech_lstm_ctc_words.py:53-79,
 /root/reference/skeletal_network/skeletal_lstm_ctc.py:303-335).

Depth > 2 generalizes the residual to add(last two layers), matching the
reference at depth 2. Output width is 2 * hidden.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mgr_tpu.core import prng
from mgr_tpu.core.config import EncoderConfig
from mgr_tpu.ops import lstm

Params = Dict[str, Dict[str, jax.Array]]


def init_encoder(rng: jax.Array, in_dim: int, cfg: EncoderConfig) -> Params:
    params: Params = {}
    d = in_dim
    for i in range(cfg.depth):
        params[f"blstm_{i}"] = lstm.init_bilstm_params(
            prng.fold_name(rng, f"blstm_{i}"), d, cfg.hidden
        )
        d = 2 * cfg.hidden
    return params


def apply_encoder(
    params: Params,
    x: jax.Array,
    cfg: EncoderConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    noise_override: Optional[float] = None,
) -> jax.Array:
    """(B, T, F) -> (B, T, 2H) residual stream (pre-head, pre-dropout).

    ``noise_override`` supports the late-fusion re-application of a
    pretrained encoder under a different input noise (speech keeps 0.5,
    skeletal gets 0.0 — /root/reference/multimodal_fusion/multimodal.py:103-106).
    """
    from mgr_tpu.models.layers import gaussian_noise  # local to avoid cycle

    sigma = cfg.input_noise if noise_override is None else noise_override
    h = gaussian_noise(
        x, sigma, None if rng is None else prng.fold_name(rng, "noise"), train
    )
    outs = []
    for i in range(cfg.depth):
        rate = cfg.dropout[i] if i < len(cfg.dropout) else cfg.dropout[-1]
        h = lstm.bilstm_layer(
            params[f"blstm_{i}"], h,
            rng=None if rng is None else prng.fold_name(rng, f"drop_{i}"),
            dropout=rate,
            per_gate=cfg.per_gate_dropout,
            train=train,
            compute_dtype=compute_dtype,
        )
        outs.append(h)
    if cfg.residual and cfg.depth >= 2:
        return outs[-2] + outs[-1]
    return outs[-1]
