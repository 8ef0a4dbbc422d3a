"""Train step: overfit a tiny batch, freezing, maxnorm, lr scaling."""

import jax
import jax.numpy as jnp
import numpy as np

from mgr_tpu.core import config as cfglib
from mgr_tpu.models import build_model
from mgr_tpu.train import (
    apply_maxnorm,
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _tiny_speech(**kw):
    enc = cfglib.EncoderConfig(hidden=8, depth=2, input_noise=0.0,
                               dropout=(0.0, 0.0), output_dropout=0.0)
    over = dict(maxlen=16, num_feats=5, nb_classes=6, max_label_len=4,
                encoder=enc, compute_dtype="float32")
    over.update(kw)
    return cfglib.get_preset("speech").replace(**over)


def _batch(cfg, rng, B=4):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (B, cfg.maxlen, cfg.num_feats))
    labels = jax.random.randint(
        k2, (B, cfg.max_label_len), 0, cfg.nb_classes - 1
    ).astype(jnp.int32)
    return {
        "inputs": x,
        "labels": labels,
        "input_length": jnp.full((B,), cfg.maxlen - cfg.ctc.trim_frames,
                                 jnp.int32),
        "label_length": jnp.full((B,), cfg.max_label_len, jnp.int32),
    }


def test_loss_decreases_overfitting_one_batch():
    cfg = _tiny_speech(
        optimizer=cfglib.OptimizerConfig(learning_rate=5e-3, maxnorm=None)
    )
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0))
    step = make_train_step(model)
    batch = _batch(cfg, jax.random.key(1))
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.key(i), 1.0)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert np.isfinite(losses).all()


def test_skip_nonfinite_guards_params():
    """OptimizerConfig.skip_nonfinite: a batch that produces a NaN loss
    (inputs poisoned with NaN) must leave params AND Adam moments
    untouched, and training must continue normally on the next finite
    batch (round-3 failure mode: one transient bf16 overflow poisoned
    the Adam state and the run never recovered)."""
    cfg = _tiny_speech(
        optimizer=cfglib.OptimizerConfig(learning_rate=5e-3,
                                         skip_nonfinite=100)
    )
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0))
    step = make_train_step(model)
    good = _batch(cfg, jax.random.key(1))
    bad = dict(good, inputs=good["inputs"].at[0, 0, 0].set(jnp.nan))

    state, m = step(state, good, jax.random.key(0), 1.0)
    # Host copies: the jitted step donates the state buffers.
    before = [np.array(x) for x in jax.tree.leaves(state.params)]
    state, m = step(state, bad, jax.random.key(1), 1.0)
    assert not np.isfinite(float(m["loss"]))
    for a, b in zip(before, jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The guarded step still advances and the next finite batch trains.
    state, m = step(state, good, jax.random.key(2), 1.0)
    assert np.isfinite(float(m["loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(before, jax.tree.leaves(state.params))
    )
    assert changed


def test_eval_step_deterministic():
    cfg = _tiny_speech()
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0))
    ev = make_eval_step(model)
    batch = _batch(cfg, jax.random.key(1))
    a, b = float(ev(state.params, batch)), float(ev(state.params, batch))
    assert a == b and np.isfinite(a)


def test_late_fusion_freeze_keeps_encoders_fixed():
    sp = _tiny_speech()
    sk = cfglib.get_preset("skeletal").replace(
        maxlen=16, num_feats=3, nb_classes=6, max_label_len=4,
        encoder=cfglib.EncoderConfig(hidden=4, depth=2, input_noise=0.0,
                                     dropout=(0.0, 0.0), output_dropout=0.0),
        compute_dtype="float32",
    )
    cfg = cfglib.get_preset("late_fusion").replace(
        maxlen=16, num_feats=5, second_stream_feats=3, nb_classes=6,
        max_label_len=4, fusion_hidden=4,
        encoder=sp.encoder, compute_dtype="float32",
    )
    model = build_model(cfg, source_configs={"speech": sp, "skeletal": sk})
    state = create_train_state(model, jax.random.key(0))
    step = make_train_step(model)
    batch = {
        "inputs": jax.random.normal(jax.random.key(1), (2, 16, 5)),
        "inputs2": jax.random.normal(jax.random.key(2), (2, 16, 3)),
        "labels": jnp.array([[1, 2, -1, -1], [3, -1, -1, -1]], jnp.int32),
        "input_length": jnp.array([14, 14], jnp.int32),
        "label_length": jnp.array([2, 1], jnp.int32),
    }
    before = jax.tree.map(np.asarray, state.params)
    for i in range(3):
        state, _ = step(state, batch, jax.random.key(10 + i), 1.0)
    after = jax.tree.map(np.asarray, state.params)

    # Frozen encoders: bit-identical.
    for name in ("speech", "skeletal"):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(before[name]),
            jax.tree_util.tree_leaves_with_path(after[name]),
        ):
            np.testing.assert_array_equal(a, b, err_msg=str(pa))
    # Trainable parts moved.
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(
            jax.tree.leaves(before["fusion"]), jax.tree.leaves(after["fusion"])
        )
    )
    assert moved


def test_maxnorm_projection():
    cfg = _tiny_speech()
    model = build_model(cfg)
    params = model.init(jax.random.key(0))
    # Blow up one constrained kernel, project, check the column norms.
    params["encoder"]["blstm_0"]["W"] = (
        params["encoder"]["blstm_0"]["W"] * 1000.0
    )
    out = apply_maxnorm(params, 3.0)
    W = np.asarray(out["encoder"]["blstm_0"]["W"])
    norms = np.sqrt((W ** 2).sum(axis=1))
    assert norms.max() <= 3.0 + 1e-4
    # Unconstrained leaves untouched (dense head, recurrent kernel).
    np.testing.assert_array_equal(
        np.asarray(out["head"]["W"]), np.asarray(params["head"]["W"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["encoder"]["blstm_0"]["U"]),
        np.asarray(params["encoder"]["blstm_0"]["U"]),
    )


def test_lr_scale_zero_freezes_everything():
    cfg = _tiny_speech()
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0))
    step = make_train_step(model)
    batch = _batch(cfg, jax.random.key(1))
    before = jax.tree.map(np.asarray, state.params)  # copy pre-donation
    new_state, _ = step(state, batch, jax.random.key(2), 0.0)
    for a, b in zip(
        jax.tree.leaves(before),
        jax.tree.leaves(jax.tree.map(np.asarray, new_state.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_indexed_steps_match_host_batch_path():
    """Device-resident (gather-by-index) steps == host-batch steps."""
    import jax.numpy as jnp

    from mgr_tpu.train.step import (
        make_indexed_eval_step,
        make_indexed_train_step,
    )

    cfg = _tiny_speech()
    model = build_model(cfg)
    N = 6
    k1, k2 = jax.random.split(jax.random.key(5))
    data = {
        "inputs": jax.random.normal(k1, (N, cfg.maxlen, cfg.num_feats)),
        "labels": jax.random.randint(
            k2, (N, cfg.max_label_len), 0, cfg.nb_classes - 1
        ).astype(jnp.int32),
        "input_length": jnp.full((N,), cfg.maxlen - 2, jnp.int32),
        "label_length": jnp.full((N,), cfg.max_label_len, jnp.int32),
    }
    idx = jnp.asarray([4, 1, 3, 0], jnp.int32)
    host_batch = {k: np.asarray(v)[np.asarray(idx)] for k, v in data.items()}
    host_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

    s1 = create_train_state(model, jax.random.key(0))
    s2 = create_train_state(model, jax.random.key(0))
    rng = jax.random.key(9)

    step_h = make_train_step(model)
    step_i = make_indexed_train_step(model)
    s1, m1 = step_h(s1, host_batch, rng, 1.0)
    s2, m2 = step_i(s2, data, idx, rng, 1.0)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    ev_h = make_eval_step(model)
    ev_i = make_indexed_eval_step(model)
    np.testing.assert_allclose(
        float(ev_h(s1.params, host_batch)),
        float(ev_i(s2.params, data, idx)), rtol=1e-6,
    )


def test_grad_accumulation_matches_full_batch():
    """accum_steps=4 over one B=16 batch == the plain B=16 step: same
    loss and same post-update params (deterministic config, XLA path).
    VERDICT r1 item 5."""
    B = 16
    base = _tiny_speech(
        batch_size=B,
        optimizer=cfglib.OptimizerConfig(learning_rate=5e-3),
    )
    accum = base.replace(
        optimizer=cfglib.OptimizerConfig(learning_rate=5e-3, accum_steps=4)
    )
    batch = _batch(base, jax.random.key(1), B=B)
    results = {}
    for name, cfg in (("full", base), ("accum", accum)):
        model = build_model(cfg)
        state = create_train_state(model, jax.random.key(0))
        step = make_train_step(model)
        for i in range(3):
            state, m = step(state, batch, jax.random.key(i), 1.0)
        results[name] = (float(m["loss"]), jax.tree.map(np.asarray,
                                                        state.params))
    np.testing.assert_allclose(results["full"][0], results["accum"][0],
                               rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(results["full"][1]),
        jax.tree.leaves(results["accum"][1]),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_grad_accumulation_rejects_indivisible_batch():
    import pytest

    cfg = _tiny_speech(
        optimizer=cfglib.OptimizerConfig(accum_steps=3)
    )
    model = build_model(cfg)
    state = create_train_state(model, jax.random.key(0))
    step = make_train_step(model)
    batch = _batch(cfg, jax.random.key(1), B=4)  # 4 % 3 != 0
    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, jax.random.key(2), 1.0)


def test_epoch_indices_matches_epoch():
    from mgr_tpu.data.batcher import Batcher

    N = 8
    feats = np.arange(N * 4 * 2, dtype=np.float32).reshape(N, 4, 2)
    b = Batcher(feats, np.zeros((N, 3), np.int32), np.ones(N, np.int32),
                np.full(N, 4, np.int32), list(range(N)), list(range(N)), [])
    got = list(b.epoch_indices(2, shuffle_seed=3))
    want = list(b.epoch(2, shuffle_seed=3))
    assert [ids for ids, _ in got] == [ids for ids, _ in want]
    for (_, idx), (_, batch) in zip(got, want):
        np.testing.assert_array_equal(feats[idx], batch["inputs"])
