"""Jitted train / eval / predict steps.

One generic step serves all five pipelines (the reference copy-pasted
this scaffolding per modality — SURVEY.md §1). Everything here is
SPMD-ready: run inside a ``Mesh`` with sharded params/batches and XLA
inserts the data-parallel gradient psum and the TP collectives.

Batch contract (mirrors the reference's generator outputs,
/root/reference/audio_network/data_generator.py:232-240, minus the
dummy-zeros trick which a real loss function makes unnecessary):
  inputs        (B, T, F) array, or a tuple of arrays for fusion models
  labels        (B, N) int32, -1 padded
  input_length  (B,) int32 — valid frames AFTER the ctc trim
  label_length  (B,) int32
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mgr_tpu.models.zoo import ModelDef
from mgr_tpu.ops.ctc import ctc_loss_from_logits
from mgr_tpu.train import optimizer as opt_lib

Params = Dict[str, Any]


class TrainState(NamedTuple):
    step: jax.Array
    params: Params
    opt_state: Any

    @property
    def as_pytree(self):
        return self


def create_train_state(model: ModelDef, rng: jax.Array) -> TrainState:
    params = model.init(rng)
    tx = opt_lib.keras_adam(model.config.optimizer)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
    )


def _batch_inputs(batch: Dict[str, Any]):
    if "inputs2" in batch:
        return (batch["inputs"], batch["inputs2"])
    return batch["inputs"]


def _loss_from_batch(model: ModelDef, params: Params, batch, *, train, rng):
    cfg = model.config
    if model.apply_tm is not None:
        # Time-major path: logits stay (T, B, C); the CTC packing einsum
        # absorbs the layout (no large-tensor transpose anywhere).
        logits = model.apply_tm(
            params, _batch_inputs(batch), train=train, rng=rng
        )
        time_major = True
    else:
        logits = model.apply(
            params, _batch_inputs(batch), train=train, rng=rng
        )
        time_major = False
    losses = ctc_loss_from_logits(
        logits,
        batch["labels"],
        batch["input_length"],
        batch["label_length"],
        trim_frames=cfg.ctc.trim_frames,
        time_major=time_major,
    )
    return losses.mean()


def make_train_step(
    model: ModelDef,
) -> Callable[[TrainState, Dict[str, Any], jax.Array, jax.Array],
              Tuple[TrainState, Dict[str, jax.Array]]]:
    """Returns step(state, batch, rng, lr_scale) -> (state, metrics).

    ``lr_scale`` is a traced scalar so host-side ReduceLROnPlateau never
    triggers recompilation."""
    cfg = model.config
    tx = opt_lib.keras_adam(cfg.optimizer)

    def step(state: TrainState, batch, rng, lr_scale):
        def loss_fn(params):
            return _loss_from_batch(model, params, batch, train=True, rng=rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        trainable = model.trainable(state.params)
        grads = opt_lib.freeze_mask_grads(grads, trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        params = opt_lib.apply_maxnorm(params, cfg.optimizer.maxnorm)
        grad_norm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return jax.jit(step, donate_argnums=(0,))


def _gather_batch(data: Dict[str, jax.Array], idx: jax.Array):
    return {k: v[idx] for k, v in data.items()}


def make_indexed_train_step(model: ModelDef):
    """Device-resident variant of :func:`make_train_step`.

    The WHOLE featurized dataset lives in HBM (uploaded once); the step
    receives only a (B,) row-index vector and gathers its batch
    on-device. Kills the per-step host->device batch transfer — the
    dominant cost when the host link is slow (remote-attached TPUs) and
    a free win everywhere else. The audio corpus at reference scale is
    ~200 MB, far under HBM.
    """
    cfg = model.config
    tx = opt_lib.keras_adam(cfg.optimizer)

    def step(state: TrainState, data, idx, rng, lr_scale):
        batch = _gather_batch(data, idx)

        def loss_fn(params):
            return _loss_from_batch(model, params, batch, train=True, rng=rng)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        trainable = model.trainable(state.params)
        grads = opt_lib.freeze_mask_grads(grads, trainable)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        params = opt_lib.apply_maxnorm(params, cfg.optimizer.maxnorm)
        grad_norm = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, params, opt_state)
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    return jax.jit(step, donate_argnums=(0,))


def make_indexed_eval_step(model: ModelDef):
    def step(params: Params, data, idx):
        batch = _gather_batch(data, idx)
        return _loss_from_batch(model, params, batch, train=False, rng=None)

    return jax.jit(step)


def make_eval_step(model: ModelDef):
    """Returns step(params, batch) -> mean val loss (no dropout/noise)."""

    def step(params: Params, batch):
        return _loss_from_batch(model, params, batch, train=False, rng=None)

    return jax.jit(step)


def make_predict_step(model: ModelDef):
    """Returns step(params, inputs) -> per-frame softmax probabilities
    (B, T, C) — the sub-model the reference extracts for decoding
    (/root/reference/audio_network/sequence_decoding.py:104-105)."""

    def step(params: Params, inputs):
        logits = model.apply(params, inputs, train=False, rng=None)
        return jax.nn.softmax(logits, axis=-1)

    return jax.jit(step)


def make_decode_step(model: ModelDef, *, threshold: float,
                     trim_frames: int = 2, drop_blank: bool = False):
    """Fused on-device predict + best-path decode.

    Returns step(params, inputs, input_lengths|None) -> (best, emit):
    (B, T') int32 argmax classes and the boolean emit mask. Fetching
    these (a few hundred KB) instead of the (B, T, C) float posteriors
    (tens of MB) keeps decoding compute-bound — the full-probs path is
    host-transfer-bound on remote-attached TPUs."""
    from mgr_tpu.ops.decoding import best_path_decode

    cfg = model.config

    def step(params: Params, inputs, input_lengths=None):
        logits = model.apply(params, inputs, train=False, rng=None)
        probs = jax.nn.softmax(logits, axis=-1)
        blank = cfg.nb_classes - 1 if drop_blank else None
        return best_path_decode(
            probs, input_lengths,
            threshold=threshold, trim_frames=trim_frames, blank=blank,
        )

    return jax.jit(step, static_argnames=())
