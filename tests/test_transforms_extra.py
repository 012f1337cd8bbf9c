"""Extra rotation-representation round trips + schedule shapes."""

import numpy as np
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.utils.transforms import (
    axis_angle_to_quat,
    matrix_to_rot6d,
    quat_normalize,
    quat_to_axis_angle,
    quat_to_matrix,
    rot6d_to_matrix,
)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(0)
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    q = axis_angle_to_quat(jnp.asarray(aa))
    back = np.asarray(quat_to_axis_angle(q))
    # wrap to the same branch: angles in (0, pi)
    norm = np.linalg.norm(aa, axis=-1, keepdims=True)
    wrapped = aa / norm * (norm % (2 * np.pi))
    wrapped = np.where(norm % (2 * np.pi) > np.pi,
                       -aa / norm * (2 * np.pi - norm % (2 * np.pi)), wrapped)
    np.testing.assert_allclose(back, wrapped, atol=1e-4)


def test_axis_angle_small_angle():
    aa = jnp.asarray([[1e-9, 0, 0], [0, 0, 0]])
    q = axis_angle_to_quat(aa)
    np.testing.assert_allclose(np.asarray(q[1]), [1, 0, 0, 0], atol=1e-7)
    assert np.isfinite(np.asarray(quat_to_axis_angle(q))).all()


def test_rot6d_roundtrip():
    rng = np.random.default_rng(1)
    from scipy.spatial.transform import Rotation as R

    m = R.random(16, random_state=rng).as_matrix().astype(np.float32)
    d6 = matrix_to_rot6d(jnp.asarray(m))
    back = np.asarray(rot6d_to_matrix(d6))
    np.testing.assert_allclose(back, m, atol=1e-5)


def test_quat_matrix_consistency_with_axis_angle():
    rng = np.random.default_rng(2)
    aa = rng.normal(size=(8, 3)).astype(np.float32)
    q = quat_normalize(axis_angle_to_quat(jnp.asarray(aa)))
    from scipy.spatial.transform import Rotation as R

    ref = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(np.asarray(quat_to_matrix(q)), ref, atol=1e-5)


def test_cosine_warmup_restarts_schedule():
    from puzzlefusion_plusplus_tpu.training.state import cosine_warmup_restarts_schedule

    s = cosine_warmup_restarts_schedule(1e-3, 100, warmup_steps=10, num_cycles=3)
    assert float(s(0)) < 1e-4  # warming up
    assert abs(float(s(10)) - 1e-3) < 1e-6  # peak after warmup
    assert float(s(99)) < 1e-4  # decayed
    assert abs(float(s(110)) - 1e-3) < 1e-6  # restarted + rewarmed
