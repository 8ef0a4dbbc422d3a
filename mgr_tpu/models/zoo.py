"""The five pipeline model families, built from shared blocks.

Reference topologies re-expressed functionally:
  speech       speech_lstm_ctc_words.py:32-134  (BiLSTM(500)x2, 44 classes)
  skeletal     skeletal_lstm_ctc.py:296-394     (BiLSTM(300)x2, 22 classes)
  rgb          cnn_lstm.py:251-375              (3 conv blocks + BiLSTM(512)x2)
  early_fusion early_multimodal.py:321-424      (concat feats -> BiLSTM(500)x2)
  late_fusion  multimodal.py:58-215             (frozen encoders -> BiLSTM(100))

Every ``apply`` returns per-frame logits (B, T, nb_classes); softmax/
log-softmax happens inside the loss and the decoder. The reference's
CTC-lambda graph trick (dummy identity loss, speech_lstm_ctc_words.py:131)
is unnecessary here — the loss is an ordinary function of the logits.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mgr_tpu.core import prng
from mgr_tpu.core.config import PipelineConfig, get_preset
from mgr_tpu.models import layers
from mgr_tpu.models.encoder import (
    apply_encoder_tm,
    init_encoder,
)
from mgr_tpu.ops import lstm

Params = Dict[str, Any]


class ModelDef(NamedTuple):
    config: PipelineConfig
    init: Callable[[jax.Array], Params]
    # apply(params, inputs, train=..., rng=...) -> (B, T, nb_classes) logits
    apply: Callable[..., jax.Array]
    # trainable(params) -> bool pytree marking which leaves the optimizer
    # updates (late fusion freezes the pretrained encoders, replacing the
    # reference's Bidirectional-freeze workaround, multimodal.py:33-55).
    trainable: Callable[[Params], Params]
    # apply_tm(params, inputs, ...) -> (T, B, nb_classes) logits. The
    # training path uses this to keep every large tensor time-major
    # (the fused kernels' native layout — docs/KERNELS.md); ``apply``
    # is its transpose for the public batch-major contract.
    apply_tm: Optional[Callable[..., jax.Array]] = None


def _all_trainable(params: Params) -> Params:
    return jax.tree.map(lambda _: True, params)


def _head_init(rng: jax.Array, in_dim: int, nb_classes: int,
               blank_bias: float = 0.0) -> Params:
    p = layers.init_dense(prng.fold_name(rng, "dense"), in_dim, nb_classes)
    if blank_bias:
        # CTC blank = last class (data_generator.py:42). See
        # PipelineConfig.head_blank_bias.
        p["b"] = p["b"].at[nb_classes - 1].set(blank_bias)
    return p


def _head_apply(params, h, rate, *, train, rng, compute_dtype):
    h = layers.dropout(
        h, rate, None if rng is None else prng.fold_name(rng, "head_drop"),
        train,
    )
    return layers.dense(params, h, compute_dtype)


# ---------------------------------------------------------------------------
# Uni-modal: speech / skeletal (same shape, different widths).
# ---------------------------------------------------------------------------

def _build_unimodal(cfg: PipelineConfig) -> ModelDef:
    enc_out = 2 * cfg.encoder.hidden
    dt = jnp.dtype(cfg.compute_dtype)

    def init(rng: jax.Array) -> Params:
        return {
            "encoder": init_encoder(
                prng.fold_name(rng, "encoder"), cfg.num_feats, cfg.encoder
            ),
            "head": _head_init(rng, enc_out, cfg.nb_classes,
                               cfg.head_blank_bias),
        }

    def apply_tm(params, x, *, train=False, rng=None):
        h = apply_encoder_tm(
            params["encoder"], jnp.swapaxes(x, 0, 1), cfg.encoder,
            train=train, rng=rng, compute_dtype=dt,
        )
        return _head_apply(
            params["head"], h, cfg.encoder.output_dropout,
            train=train, rng=rng, compute_dtype=dt,
        )

    def apply(params, x, *, train=False, rng=None):
        return jnp.swapaxes(apply_tm(params, x, train=train, rng=rng), 0, 1)

    return ModelDef(cfg, init, apply, _all_trainable, apply_tm)


# ---------------------------------------------------------------------------
# RGB: CNN frontend -> encoder -> head.
# ---------------------------------------------------------------------------

def _build_rgb(cfg: PipelineConfig) -> ModelDef:
    assert cfg.cnn is not None
    enc_in = layers.cnn_output_dim(cfg.cnn)
    enc_out = 2 * cfg.encoder.hidden
    dt = jnp.dtype(cfg.compute_dtype)

    def init(rng: jax.Array) -> Params:
        return {
            "cnn": layers.init_cnn(prng.fold_name(rng, "cnn"), cfg.cnn),
            "encoder": init_encoder(
                prng.fold_name(rng, "encoder"), enc_in, cfg.encoder
            ),
            "head": _head_init(rng, enc_out, cfg.nb_classes,
                               cfg.head_blank_bias),
        }

    def _frontend(cnn_params, x):
        return layers.cnn_frontend(cnn_params, x, cfg.cnn, compute_dtype=dt)

    if cfg.cnn.remat:
        # Recompute the conv stack in the backward pass instead of
        # storing its (B*T, 56, 56, 16)-scale activations — they are
        # the RGB pipeline's residual-memory wall (CNNConfig.remat).
        _frontend = jax.checkpoint(_frontend)

    def apply_tm(params, x, *, train=False, rng=None):
        feats = _frontend(params["cnn"], x)
        h = apply_encoder_tm(
            params["encoder"], jnp.swapaxes(feats, 0, 1), cfg.encoder,
            train=train, rng=rng, compute_dtype=dt,
        )
        return _head_apply(
            params["head"], h, cfg.encoder.output_dropout,
            train=train, rng=rng, compute_dtype=dt,
        )

    def apply(params, x, *, train=False, rng=None):
        return jnp.swapaxes(apply_tm(params, x, train=train, rng=rng), 0, 1)

    return ModelDef(cfg, init, apply, _all_trainable, apply_tm)


# ---------------------------------------------------------------------------
# Early fusion: per-stream noise -> channel concat -> encoder -> head
# (early_multimodal.py:335-381; noise 0.5 on BOTH streams).
# ---------------------------------------------------------------------------

def _build_early_fusion(cfg: PipelineConfig) -> ModelDef:
    in_dim = cfg.num_feats + cfg.second_stream_feats
    enc_out = 2 * cfg.encoder.hidden
    dt = jnp.dtype(cfg.compute_dtype)

    def init(rng: jax.Array) -> Params:
        return {
            "encoder": init_encoder(
                prng.fold_name(rng, "encoder"), in_dim, cfg.encoder
            ),
            "head": _head_init(rng, enc_out, cfg.nb_classes,
                               cfg.head_blank_bias),
        }

    def apply_tm(params, inputs: Tuple[jax.Array, jax.Array], *,
                 train=False, rng=None):
        x_a, x_s = inputs
        x_a = layers.gaussian_noise(
            x_a, cfg.encoder.input_noise,
            None if rng is None else prng.fold_name(rng, "noise_a"), train,
        )
        x_s = layers.gaussian_noise(
            x_s, cfg.second_stream_noise,
            None if rng is None else prng.fold_name(rng, "noise_s"), train,
        )
        x = jnp.concatenate([x_a, x_s], axis=2)
        h = apply_encoder_tm(
            params["encoder"], jnp.swapaxes(x, 0, 1), cfg.encoder,
            train=train, rng=rng, compute_dtype=dt,
            noise_override=0.0,  # noise already applied per stream
        )
        return _head_apply(
            params["head"], h, cfg.encoder.output_dropout,
            train=train, rng=rng, compute_dtype=dt,
        )

    def apply(params, inputs, *, train=False, rng=None):
        return jnp.swapaxes(
            apply_tm(params, inputs, train=train, rng=rng), 0, 1
        )

    return ModelDef(cfg, init, apply, _all_trainable, apply_tm)


# ---------------------------------------------------------------------------
# Late fusion: frozen pretrained speech + skeletal encoders, residual
# streams concatenated, trainable BiLSTM(fusion_hidden) + head
# (multimodal.py:58-215). The pretrained layers keep their own dropout
# rates while fusing, exactly like the reference's reused layer objects.
# ---------------------------------------------------------------------------

def _build_late_fusion(
    cfg: PipelineConfig,
    source_configs: Optional[Dict[str, PipelineConfig]] = None,
) -> ModelDef:
    sources = source_configs or {
        name: get_preset(name) for name in cfg.fusion_sources
    }
    sp_cfg, sk_cfg = sources["speech"], sources["skeletal"]
    concat_dim = 2 * sp_cfg.encoder.hidden + 2 * sk_cfg.encoder.hidden
    head_in = 2 * cfg.fusion_hidden
    dt = jnp.dtype(cfg.compute_dtype)

    def init(rng: jax.Array) -> Params:
        return {
            "speech": init_encoder(
                prng.fold_name(rng, "speech"), sp_cfg.num_feats, sp_cfg.encoder
            ),
            "skeletal": init_encoder(
                prng.fold_name(rng, "skeletal"), sk_cfg.num_feats,
                sk_cfg.encoder,
            ),
            "fusion": lstm.init_bilstm_params(
                prng.fold_name(rng, "fusion"), concat_dim, cfg.fusion_hidden
            ),
            "head": _head_init(rng, head_in, cfg.nb_classes,
                               cfg.head_blank_bias),
        }

    def apply_tm(params, inputs: Tuple[jax.Array, jax.Array], *,
                 train=False, rng=None):
        x_a, x_s = inputs
        # Per-stream noise overrides: audio 0.5, skeletal 0.0
        # (multimodal.py:103-106).
        res_a = apply_encoder_tm(
            params["speech"], jnp.swapaxes(x_a, 0, 1), sp_cfg.encoder,
            train=train,
            rng=None if rng is None else prng.fold_name(rng, "enc_a"),
            compute_dtype=dt,
            noise_override=cfg.encoder.input_noise,
        )
        res_s = apply_encoder_tm(
            params["skeletal"], jnp.swapaxes(x_s, 0, 1), sk_cfg.encoder,
            train=train,
            rng=None if rng is None else prng.fold_name(rng, "enc_s"),
            compute_dtype=dt,
            noise_override=cfg.second_stream_noise,
        )
        merged = jnp.concatenate([res_a, res_s], axis=-1)
        h = lstm.bilstm_layer_tm(
            params["fusion"], merged,
            rng=None if rng is None else prng.fold_name(rng, "fusion_drop"),
            dropout=cfg.fusion_dropout,  # default 0.5, multimodal.py:164
            train=train, compute_dtype=dt,
        )
        return _head_apply(
            params["head"], h,
            cfg.fusion_output_dropout,  # default 0.5, multimodal.py:171-173
            train=train, rng=rng, compute_dtype=dt,
        )

    def apply(params, inputs, *, train=False, rng=None):
        return jnp.swapaxes(
            apply_tm(params, inputs, train=train, rng=rng), 0, 1
        )

    def trainable(params: Params) -> Params:
        # cfg.finetune_encoders=True unfreezes the grafted encoders for
        # an end-to-end fine-tune leg (framework extension; the
        # reference always freezes, multimodal.py:33-55).
        enc = bool(cfg.finetune_encoders)
        return {
            "speech": jax.tree.map(lambda _: enc, params["speech"]),
            "skeletal": jax.tree.map(lambda _: enc, params["skeletal"]),
            "fusion": jax.tree.map(lambda _: True, params["fusion"]),
            "head": jax.tree.map(lambda _: True, params["head"]),
        }

    return ModelDef(cfg, init, apply, trainable, apply_tm)


# ---------------------------------------------------------------------------

_BUILDERS = {
    "speech": _build_unimodal,
    "skeletal": _build_unimodal,
    "rgb": _build_rgb,
    "early_fusion": _build_early_fusion,
    "late_fusion": _build_late_fusion,
}


def build_model(
    cfg: PipelineConfig,
    source_configs: Optional[Dict[str, PipelineConfig]] = None,
) -> ModelDef:
    if cfg.name not in _BUILDERS:
        raise KeyError(f"unknown model family {cfg.name!r}")
    if cfg.name == "late_fusion":
        return _build_late_fusion(cfg, source_configs)
    return _BUILDERS[cfg.name](cfg)
