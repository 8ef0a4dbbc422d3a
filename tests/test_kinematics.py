"""Skeletal kinematics vs hand-computed golden values."""

import jax.numpy as jnp
import numpy as np

from mgr_tpu.data.formats import SKELETAL_FEATURES
from mgr_tpu.ops import kinematics as K


def _track(rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_previous_shifts_with_zero_row():
    x = _track([[1, 2], [3, 4], [5, 6]])
    out = np.asarray(K.previous(x))
    np.testing.assert_array_equal(out, [[0, 0], [1, 2], [3, 4]])


def test_velocity_zeroes_first_five_then_euclidean():
    # constant step of 3-4-5 triangles: distance 5 per frame
    T = 8
    pos = _track([[3 * t, 4 * t] for t in range(T)])
    v = np.asarray(K.velocity(pos))
    np.testing.assert_array_equal(v[:5], 0.0)
    np.testing.assert_allclose(v[5:], 5.0, rtol=1e-6)


def test_acceleration_zeroes_first_five():
    vel = jnp.asarray(np.arange(8.0, dtype=np.float32))
    a = np.asarray(K.acceleration(vel))
    np.testing.assert_array_equal(a[:5], 0.0)
    np.testing.assert_allclose(a[5:], 1.0)


def test_distance_and_angle():
    a = _track([[0, 0], [3, 4]])
    b = _track([[0, 0], [0, 0]])
    np.testing.assert_allclose(np.asarray(K.distance(a, b)), [0.0, 5.0])
    ang = np.asarray(K.angle(_track([[1, 1]]), _track([[0, 0]])))
    np.testing.assert_allclose(ang, [np.pi / 4], rtol=1e-6)


def test_stage1_hand_velocity_int_truncation():
    # steps of length sqrt(2) ~ 1.414 -> int() truncates to 1
    T = 8
    pos = _track([[t, t] for t in range(T)])
    v = np.asarray(K.hand_velocity_stage1(pos))
    np.testing.assert_array_equal(v[:4], 0.0)
    np.testing.assert_array_equal(v[4:], 1.0)


def test_rest_position_masked_median():
    T = 10
    lh = _track([[10, 10]] * 5 + [[50, 50]] * 5)
    rh = _track([[20, 20]] * 5 + [[60, 60]] * 5)
    # low velocity on the first half only
    lh_v = jnp.asarray(np.array([0] * 5 + [100] * 5, np.float32))
    rh_v = jnp.asarray(np.array([0] * 5 + [100] * 5, np.float32))
    rp = K.rest_position({"lh": lh, "rh": rh}, lh_v, rh_v)
    np.testing.assert_array_equal(np.asarray(rp["lh"]), [10, 10])
    np.testing.assert_array_equal(np.asarray(rp["rh"]), [20, 20])


def test_distance_from_rest_zero_first_four():
    pos = _track([[0, 0]] * 4 + [[3, 4]] * 4)
    d = np.asarray(K.distance_from_rest(pos, jnp.asarray([0.0, 0.0])))
    np.testing.assert_array_equal(d[:4], 0.0)
    np.testing.assert_array_equal(d[4:], 5.0)


def test_skeletal_features_shape_and_order():
    T = 12
    rng = np.random.default_rng(0)
    joints = {
        name: jnp.asarray(
            rng.uniform(0, 400, size=(T, 2)).astype(np.float32)
        )
        for name in ("lh", "rh", "le", "re", "hip", "shc")
    }
    feats = np.asarray(K.skeletal_features(joints))
    assert feats.shape == (T, len(SKELETAL_FEATURES))
    # Column 6 is lh_hip_d per the canonical order.
    want = np.linalg.norm(
        np.asarray(joints["lh"]) - np.asarray(joints["hip"]), axis=-1
    )
    np.testing.assert_allclose(feats[:, 6], want, rtol=1e-5)
    # Angles live in [-pi, pi].
    assert (np.abs(feats[:, 14:]) <= np.pi + 1e-6).all()


def test_clip_kinect_range():
    xy = jnp.asarray(np.array([[700, 100], [100, 500], [10, 10]], np.float32))
    out = np.asarray(K.clip_kinect_range(xy))
    np.testing.assert_array_equal(out, [[320, 100], [100, 240], [10, 10]])
