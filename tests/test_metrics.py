"""Evaluation-metric semantics (reference evaluator.py oracle behaviors)."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from puzzlefusion_plusplus_tpu.utils import metrics as M

RNG = np.random.default_rng(2)


def _random_pose(b, p):
    q = R.random(b * p, random_state=7).as_quat()[:, [3, 0, 1, 2]]
    return (
        RNG.standard_normal((b, p, 3)).astype(np.float32),
        q.reshape(b, p, 4).astype(np.float32),
    )


def test_perfect_pose_is_fully_accurate():
    B, P, N = 2, 4, 64
    pts = RNG.standard_normal((B, P, N, 3)).astype(np.float32)
    t, q = _random_pose(B, P)
    valids = np.ones((B, P), np.float32)
    acc, acc_pp, cd = M.calc_part_acc(
        jnp.array(pts), jnp.array(t), jnp.array(t), jnp.array(q), jnp.array(q), jnp.array(valids)
    )
    np.testing.assert_allclose(np.asarray(acc), 1.0)
    np.testing.assert_allclose(np.asarray(cd), 0.0, atol=1e-5)


def test_wrong_pose_is_inaccurate_only_on_moved_parts():
    B, P, N = 1, 4, 64
    pts = RNG.standard_normal((B, P, N, 3)).astype(np.float32)
    t, q = _random_pose(B, P)
    t2 = t.copy()
    t2[0, 1] += 5.0  # move one part far away
    valids = np.ones((B, P), np.float32)
    acc, acc_pp, _ = M.calc_part_acc(
        jnp.array(pts), jnp.array(t2), jnp.array(t), jnp.array(q), jnp.array(q), jnp.array(valids)
    )
    np.testing.assert_allclose(np.asarray(acc), 0.75)
    assert not np.asarray(acc_pp)[0, 1]


def test_valid_mean_ignores_padding_and_nans():
    per_part = jnp.array([[1.0, jnp.nan, 3.0, 99.0]])
    valids = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    got = M.valid_mean(per_part, valids)
    np.testing.assert_allclose(np.asarray(got), [4.0 / 3.0], rtol=1e-6)


def test_trans_metrics_rmse():
    t1 = np.zeros((1, 2, 3), np.float32)
    t2 = np.ones((1, 2, 3), np.float32)
    valids = np.ones((1, 2), np.float32)
    got = M.trans_metrics(jnp.array(t1), jnp.array(t2), jnp.array(valids), "rmse")
    np.testing.assert_allclose(np.asarray(got), [1.0], rtol=1e-6)


def test_rot_metrics_zero_for_same_rotation():
    _, q = _random_pose(1, 3)
    valids = np.ones((1, 3), np.float32)
    got = M.rot_metrics(jnp.array(q), jnp.array(q), jnp.array(valids), "rmse")
    np.testing.assert_allclose(np.asarray(got), [0.0], atol=1e-3)


def test_rot_metrics_wraparound():
    # identity vs identity-rotated-by-360 should be ~0 via the 360 wrap
    q1 = np.array([[[1.0, 0, 0, 0]]], np.float32)
    e = np.array([179.5, 0, 0])
    q2 = R.from_euler("XYZ", e, degrees=True).as_quat()[[3, 0, 1, 2]].reshape(1, 1, 4)
    valids = np.ones((1, 1), np.float32)
    got = M.rot_metrics(jnp.array(q1), jnp.array(q2.astype(np.float32)), jnp.array(valids), "mae")
    assert np.asarray(got)[0] <= 180.0


def test_shape_cd_zero_for_identical():
    B, P, N = 1, 3, 32
    pts = RNG.standard_normal((B, P, N, 3)).astype(np.float32)
    t, q = _random_pose(B, P)
    valids = np.array([[1.0, 1.0, 0.0]], np.float32)  # one padded part
    got = M.calc_shape_cd(
        jnp.array(pts), jnp.array(t), jnp.array(t), jnp.array(q), jnp.array(q), jnp.array(valids)
    )
    np.testing.assert_allclose(np.asarray(got), [0.0], atol=1e-4)
