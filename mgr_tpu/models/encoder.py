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


def apply_encoder_tm(
    params: Params,
    x_tm: jax.Array,
    cfg: EncoderConfig,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    noise_override: Optional[float] = None,
) -> jax.Array:
    """Time-major core: (T, B, F) -> (T, B, 2H) residual stream.

    Every large intermediate stays time-major so the fused kernels run
    without layout copies (docs/KERNELS.md); callers transpose only the
    small input features and final logits."""
    from mgr_tpu.models.layers import gaussian_noise  # local to avoid cycle

    sigma = cfg.input_noise if noise_override is None else noise_override
    h = gaussian_noise(
        x_tm, sigma,
        None if rng is None else prng.fold_name(rng, "noise"), train,
    )
    outs = []
    for i in range(cfg.depth):
        rate = cfg.dropout[i] if i < len(cfg.dropout) else cfg.dropout[-1]
        h = lstm.bilstm_layer_tm(
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

    Thin wrapper over :func:`apply_encoder_tm`: the input transpose is
    on the SMALL feature width (F <= ~1000) and the output transpose is
    only paid by callers that need batch-major; the model zoo stays
    time-major through the head instead.
    """
    out_tm = apply_encoder_tm(
        params, jnp.swapaxes(x, 0, 1), cfg,
        train=train, rng=rng, compute_dtype=compute_dtype,
        noise_override=noise_override,
    )
    return jnp.swapaxes(out_tm, 0, 1)
