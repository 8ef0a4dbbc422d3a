"""utils + multihost helpers + per-host batch sharding."""

import jax.numpy as jnp
import numpy as np

from mgr_tpu.parallel import multihost
from mgr_tpu.utils import Timer, tree_count_params, tree_norm
from mgr_tpu.utils.trees import tree_equal


def test_tree_count_and_norm():
    tree = {"a": jnp.ones((2, 3)), "b": {"c": jnp.full((4,), 2.0)}}
    assert tree_count_params(tree) == 10
    np.testing.assert_allclose(
        float(tree_norm(tree)), np.sqrt(6 * 1 + 4 * 4), rtol=1e-6
    )


def test_tree_equal():
    a = {"x": jnp.arange(3)}
    b = {"x": jnp.arange(3)}
    c = {"x": jnp.arange(1, 4)}
    assert tree_equal(a, b)
    assert not tree_equal(a, c)
    assert not tree_equal(a, {"y": jnp.arange(3)})


def test_timer():
    with Timer() as t:
        sum(range(1000))
    assert t.seconds >= 0.0


def test_multihost_single_process_noop():
    multihost.initialize()  # no coordinator -> no-op
    assert multihost.is_primary()
    info = multihost.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


def test_per_host_batch_sharding():
    from mgr_tpu.data.batcher import Batcher

    N = 16
    feats = np.arange(N * 4 * 2, dtype=np.float32).reshape(N, 4, 2)
    labels = np.zeros((N, 3), np.int32)
    ll = np.ones((N,), np.int32)
    il = np.full((N,), 4, np.int32)
    ids = list(range(N))
    b = Batcher(feats, labels, ll, il, ids, ids, [])

    shard0 = [c for c, _ in b.epoch(2, shuffle_seed=1, process_index=0,
                                    process_count=2)]
    shard1 = [c for c, _ in b.epoch(2, shuffle_seed=1, process_index=1,
                                    process_count=2)]
    full = [c for c, _ in b.epoch(2, shuffle_seed=1)]
    # Disjoint, interleaved, and jointly covering the full stream.
    assert shard0 + shard1 != full  # interleaved order differs
    assert sorted(map(tuple, shard0 + shard1)) == sorted(map(tuple, full))
    flat0 = {x for c in shard0 for x in c}
    flat1 = {x for c in shard1 for x in c}
    assert flat0.isdisjoint(flat1)
