"""Multi-device SPMD: dp x tp mesh on the 8-device virtual CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mgr_tpu.core import config as cfglib
from mgr_tpu.models import build_model
from mgr_tpu.parallel import make_mesh, shard_batch, shard_params
from mgr_tpu.parallel.sharding import param_pspecs
from mgr_tpu.train import create_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _tiny_cfg():
    # model=4 exercises the GSPMD H-sharding path (a model axis of 2
    # routes to the direction-sharded shard_map path instead —
    # tests/test_tp_dirsharded.py covers that).
    enc = cfglib.EncoderConfig(hidden=8, depth=2, input_noise=0.0,
                               dropout=(0.0, 0.0), output_dropout=0.0)
    return cfglib.get_preset("speech").replace(
        maxlen=16, num_feats=5, nb_classes=6, max_label_len=4,
        encoder=enc, compute_dtype="float32",
        mesh=cfglib.MeshConfig(data=2, model=4),
    )


def _batch(cfg, B=8):
    k = jax.random.key(1)
    return {
        "inputs": jax.random.normal(k, (B, cfg.maxlen, cfg.num_feats)),
        "labels": jax.random.randint(
            jax.random.key(2), (B, cfg.max_label_len), 0, cfg.nb_classes - 1
        ).astype(jnp.int32),
        "input_length": jnp.full((B,), cfg.maxlen - 2, jnp.int32),
        "label_length": jnp.full((B,), cfg.max_label_len, jnp.int32),
    }


def test_mesh_shape():
    mesh = make_mesh(cfglib.MeshConfig(data=2, model=4))
    assert mesh.shape == {"data": 2, "model": 4}


def test_param_pspecs_shard_lstm_only():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    mesh = make_mesh(cfg.mesh)
    specs = param_pspecs(params, mesh)
    assert specs["encoder"]["blstm_0"]["W"] == P(None, None, None, "model")
    assert specs["encoder"]["blstm_0"]["U"] == P(None, None, None, "model")
    assert specs["encoder"]["blstm_0"]["b"] == P(None, None, "model")
    assert specs["head"]["W"] == P()


def test_sharded_train_step_matches_single_device():
    cfg = _tiny_cfg()
    model = build_model(cfg)
    batch = _batch(cfg)

    # Single device run.
    state1 = create_train_state(model, jax.random.key(0))
    step1 = make_train_step(model)
    s1, m1 = step1(state1, batch, jax.random.key(3), 1.0)
    s1, m1b = step1(s1, batch, jax.random.key(4), 1.0)

    # dp=4 x tp=2 run with the same init.
    mesh = make_mesh(cfg.mesh)
    state2 = create_train_state(model, jax.random.key(0))
    state2 = state2._replace(
        params=shard_params(state2.params, mesh),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P()))
            if hasattr(x, "shape") else x,
            state2.opt_state,
        ),
    )
    sharded_batch = shard_batch(batch, mesh)
    step2 = make_train_step(model)
    s2, m2 = step2(state2, sharded_batch, jax.random.key(3), 1.0)
    s2, m2b = step2(s2, shard_batch(batch, mesh), jax.random.key(4), 1.0)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m1b["loss"]), float(m2b["loss"]),
                               rtol=1e-4)
    # Params agree after two steps.
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    # And the sharded params really are distributed.
    W = s2.params["encoder"]["blstm_0"]["W"]
    assert len(W.sharding.device_set) == 8 or isinstance(
        W.sharding, NamedSharding
    )


def test_collectives_shard_map():
    from functools import partial

    from jax import shard_map

    from mgr_tpu.parallel import collectives

    mesh = make_mesh(cfglib.MeshConfig(data=8, model=1))
    x = jnp.arange(8.0)

    f = shard_map(
        partial(collectives.psum, axis="data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
    np.testing.assert_allclose(np.asarray(f(x)), 28.0)

    g = shard_map(
        partial(collectives.ppermute_ring, axis="data"),
        mesh=mesh, in_specs=P("data"), out_specs=P("data"),
    )
    np.testing.assert_allclose(
        np.asarray(g(x)), np.roll(np.arange(8.0), 1)
    )
