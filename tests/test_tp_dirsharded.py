"""Direction-sharded tensor parallelism (round-2 backlog closure).

A BLSTM's two scan directions are independent serial chains, so a
size-2 'model' mesh axis can run one direction per device with ZERO
per-step collectives — the honest TP for a 2-direction RNN (an H-shard
would psum every one of the T steps). These tests assert:

  (a) the single-direction time-major kernels (pallas_lstm_tm,
      fwd/reverse variants) match the lax.scan reference in values and
      gradients, including T not divisible by the chunk sizes (the
      reverse scan consumes the zero-padded tail FIRST — state must
      pass through it unchanged);
  (b) the dp x tp2 shard_map train/eval steps match single-device
      numerics exactly (noise/dropout off);
  (c) the grad-combine rule (psum for direction-scattered blstm leaves,
      pmean for shared leaves) reassembles the single-device gradient;
  (d) mesh routing: dp x tp2 -> shard_map fast path, model>2 or
      time>1 -> GSPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mgr_tpu.ops.pallas_kernels as pk
from mgr_tpu.core import config as cfglib
from mgr_tpu.core import prng
from mgr_tpu.models import build_model
from mgr_tpu.ops import dispatch, lstm
from mgr_tpu.parallel import make_mesh, shard_batch, shard_params
from mgr_tpu.parallel.sharding import shardmap_axes
from mgr_tpu.train import create_train_state, make_eval_step, make_train_step
from mgr_tpu.train.step import _combine_model_grads, _loss_and_grads

N_DEV = 8


# ---------------------------------------------------------------------------
# (a) single-direction kernel vs lax.scan reference
# ---------------------------------------------------------------------------

def _scan_reference(xp, U, reverse):
    """xp (T, B, 4, H) f32, U (H, 4, H) -> h (T, B, H), pure lax.scan."""
    x_in = jnp.flip(xp, axis=0) if reverse else xp

    def step(carry, z):
        h, c = carry
        gates = z + jnp.einsum("bh,hgk->bgk", h, U)
        i = jnp.clip(0.2 * gates[:, 0] + 0.5, 0.0, 1.0)
        f = jnp.clip(0.2 * gates[:, 1] + 0.5, 0.0, 1.0)
        g = jnp.tanh(gates[:, 2])
        o = jnp.clip(0.2 * gates[:, 3] + 0.5, 0.0, 1.0)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    B, H = xp.shape[1], xp.shape[3]
    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = jax.lax.scan(step, init, x_in)
    return jnp.flip(hs, axis=0) if reverse else hs


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("T", [8, 13])  # 13: not a chunk multiple
def test_pallas_lstm_tm_matches_scan(reverse, T):
    B, H = 4, 8
    key = jax.random.key(0)
    k1, k2 = jax.random.split(key)
    xp = jax.random.normal(k1, (T, B, 4, H), jnp.float32) * 0.5
    U = jax.random.normal(k2, (H, 4, H), jnp.float32) * 0.3

    hs = pk.pallas_lstm_tm(xp, U, reverse=reverse, interpret=True)
    ref = _scan_reference(xp, U, reverse)
    np.testing.assert_allclose(hs, ref, rtol=2e-2, atol=2e-2)

    def loss_pl(xp, U):
        return jnp.sum(
            pk.pallas_lstm_tm(xp, U, reverse=reverse, interpret=True) ** 2
        )

    def loss_ref(xp, U):
        return jnp.sum(_scan_reference(xp, U, reverse) ** 2)

    g_pl = jax.grad(loss_pl, argnums=(0, 1))(xp, U)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(xp, U)
    for a, b, name in zip(g_pl, g_ref, ("dxp", "dU")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2,
            err_msg=name,
        )
        corr = np.corrcoef(
            np.asarray(a).ravel(), np.asarray(b).ravel()
        )[0, 1]
        assert corr > 0.999, (name, corr)


def test_pallas_lstm_tm_pair_equals_bilstm_tm():
    """fwd + reverse single-direction kernels == the fused two-direction
    kernel on the same stacked inputs."""
    T, B, H = 10, 4, 8
    key = jax.random.key(1)
    k1, k2, k3 = jax.random.split(key, 3)
    xp0 = jax.random.normal(k1, (T, B, 4, H), jnp.float32) * 0.5
    xp1 = jax.random.normal(k2, (T, B, 4, H), jnp.float32) * 0.5
    U = jax.random.normal(k3, (2, H, 4, H), jnp.float32) * 0.3

    hs0, hs1 = pk.pallas_bilstm_tm(xp0, xp1, U, interpret=True)
    one0 = pk.pallas_lstm_tm(xp0, U[0], reverse=False, interpret=True)
    one1 = pk.pallas_lstm_tm(xp1, U[1], reverse=True, interpret=True)
    np.testing.assert_allclose(one0, hs0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(one1, hs1, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# (b)+(c) dp x tp2 shard_map steps vs single device
# ---------------------------------------------------------------------------

def _cfg(batch):
    enc = cfglib.EncoderConfig(
        hidden=8, depth=2, input_noise=0.0, dropout=(0.0, 0.0),
        output_dropout=0.0,
    )
    return cfglib.get_preset("speech").replace(
        maxlen=24, num_feats=5, nb_classes=6, max_label_len=4,
        batch_size=batch, encoder=enc, compute_dtype="float32",
    )


def _batch(cfg):
    B = cfg.batch_size
    rng = np.random.default_rng(0)
    return {
        "inputs": jnp.asarray(
            rng.standard_normal((B, cfg.maxlen, cfg.num_feats)).astype(
                np.float32
            )
        ),
        "labels": jnp.asarray(
            np.pad(
                rng.integers(0, cfg.nb_classes - 1, size=(B, 2)),
                ((0, 0), (0, cfg.max_label_len - 2)),
                constant_values=-1,
            ).astype(np.int32)
        ),
        "input_length": jnp.full((B,), cfg.maxlen - 2, jnp.int32),
        "label_length": jnp.full((B,), 2, jnp.int32),
    }


def _tp_mesh():
    return make_mesh(cfglib.MeshConfig(data=N_DEV // 2, model=2))


def _run_step(cfg, mesh, mode):
    model = build_model(cfg)
    state = create_train_state(model, prng.root_key(0))
    batch = _batch(cfg)
    if mesh is not None:
        state = state._replace(params=shard_params(state.params, mesh))
        batch = shard_batch(batch, mesh)
    step = make_train_step(model, mesh=mesh)
    dispatch.set_mode(mode)
    try:
        state, m = step(state, batch, jax.random.key(7), 1.0)
        loss = float(m["loss"])
        params = jax.tree.map(np.asarray, state.params)
    finally:
        dispatch.set_mode("auto")
    return loss, params


@pytest.mark.parametrize("mode", ["xla", "pallas"])
def test_dirsharded_step_matches_single_device(mode):
    cfg = _cfg(batch=2 * N_DEV)
    loss_tp, params_tp = _run_step(cfg, _tp_mesh(), mode=mode)
    loss_1, params_1 = _run_step(cfg, None, mode=mode)
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_1, rtol=1e-5)
    flat_tp, tree_tp = jax.tree_util.tree_flatten_with_path(params_tp)
    flat_1, tree_1 = jax.tree_util.tree_flatten_with_path(params_1)
    assert tree_tp == tree_1
    for (ka, a), (_, b) in zip(flat_tp, flat_1):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-6, err_msg=str(ka)
        )


def test_dirsharded_grads_match_single_device():
    """The psum/pmean combine rule reassembles the exact single-device
    gradient (an Adam step would mask a constant-factor bug — compare
    raw grads)."""
    from jax.sharding import PartitionSpec as P

    cfg = _cfg(batch=2 * N_DEV)
    model = build_model(cfg)
    state = create_train_state(model, prng.root_key(0))
    batch = _batch(cfg)
    mesh = _tp_mesh()
    data_axis, model_axis = shardmap_axes(mesh)
    assert model_axis == "model"

    def local(params, b):
        with dispatch.direction_shard(model_axis):
            loss, grads = _loss_and_grads(model, params, b, rng=None)
        loss = jax.lax.pmean(loss, data_axis)
        loss = jax.lax.pmean(loss, model_axis)
        grads = jax.lax.pmean(grads, data_axis)
        grads = _combine_model_grads(grads, model_axis)
        return loss, grads

    loss_tp, grads_tp = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(data_axis)),
        out_specs=(P(), P()), check_vma=False,
    ))(state.params, shard_batch(batch, mesh))

    loss_1, grads_1 = jax.jit(
        lambda p, b: _loss_and_grads(model, p, b, rng=None)
    )(state.params, batch)

    np.testing.assert_allclose(float(loss_tp), float(loss_1), rtol=1e-5)
    flat_tp, _ = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, grads_tp)
    )
    flat_1, _ = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, grads_1)
    )
    for (ka, a), (_, b) in zip(flat_tp, flat_1):
        np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-6, err_msg=str(ka)
        )


def test_dirsharded_eval_matches_single_device():
    cfg = _cfg(batch=2 * N_DEV)
    mesh = _tp_mesh()
    model = build_model(cfg)
    state = create_train_state(model, prng.root_key(0))
    batch = _batch(cfg)
    dispatch.set_mode("pallas")
    try:
        ev_tp = make_eval_step(model, mesh=mesh)
        loss_tp = float(ev_tp(
            shard_params(state.params, mesh), shard_batch(batch, mesh)
        ))
        ev_1 = make_eval_step(model)
        loss_1 = float(ev_1(state.params, batch))
    finally:
        dispatch.set_mode("auto")
    np.testing.assert_allclose(loss_tp, loss_1, rtol=1e-5)


def test_dirsharded_routing_uses_single_direction_kernel(monkeypatch):
    """Under dp x tp2 the step must call pallas_lstm_tm (one direction
    per device), not the two-direction kernel."""
    calls = {"one": 0, "two": 0}
    real_one = pk.pallas_lstm_tm
    real_two = pk.pallas_bilstm_tm

    def spy_one(*a, **k):
        calls["one"] += 1
        return real_one(*a, **k)

    def spy_two(*a, **k):
        calls["two"] += 1
        return real_two(*a, **k)

    monkeypatch.setattr(pk, "pallas_lstm_tm", spy_one)
    monkeypatch.setattr(pk, "pallas_bilstm_tm", spy_two)

    cfg = _cfg(batch=2 * N_DEV)
    _run_step(cfg, _tp_mesh(), mode="pallas")
    assert calls["one"] > 0, "tp mesh did not use single-direction kernels"
    assert calls["two"] == 0


# ---------------------------------------------------------------------------
# (d) mesh routing predicate
# ---------------------------------------------------------------------------

def test_shardmap_axes_predicate():
    axes = shardmap_axes(make_mesh(cfglib.MeshConfig(data=4, model=2)))
    assert axes == ("data", "model")
    axes = shardmap_axes(make_mesh(cfglib.MeshConfig(data=N_DEV)))
    assert axes == ("data", None)
    assert shardmap_axes(
        make_mesh(cfglib.MeshConfig(data=2, model=4))
    ) is None
    assert shardmap_axes(
        make_mesh(cfglib.MeshConfig(data=2, model=2, time=2))
    ) is None
