"""Quaternion/SE(3) numerics vs scipy oracles (mirrors the reference's transform semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from puzzlefusion_plusplus_tpu.utils import transforms as T

RNG = np.random.default_rng(0)


def random_quats(n):
    q = R.random(n, random_state=42).as_quat()  # xyzw
    return q[:, [3, 0, 1, 2]].astype(np.float32)  # -> wxyz scalar-first


def test_quat_apply_matches_scipy():
    q = random_quats(16)
    v = RNG.standard_normal((16, 10, 3)).astype(np.float32)
    got = np.asarray(T.qrot(jnp.array(q), jnp.array(v)))
    r = R.from_quat(q[:, [1, 2, 3, 0]])  # back to xyzw for scipy
    want = np.stack([r[i].apply(v[i]) for i in range(16)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_qtransform_broadcast():
    q = random_quats(4).reshape(2, 2, 4)
    t = RNG.standard_normal((2, 2, 3)).astype(np.float32)
    v = RNG.standard_normal((2, 2, 7, 3)).astype(np.float32)
    got = T.qtransform(jnp.array(t), jnp.array(q), jnp.array(v))
    want = T.qrot(jnp.array(q), jnp.array(v)) + jnp.array(t)[..., None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_quat_matrix_roundtrip():
    q = random_quats(64)
    m = T.quat_to_matrix(jnp.array(q))
    r = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(np.asarray(m), r, atol=1e-5)
    q2 = np.asarray(T.matrix_to_quat(m))
    # quaternion is defined up to sign
    dot = np.abs(np.sum(q2 * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_matrix_to_euler_xyz_matches_scipy():
    q = random_quats(64)
    m = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    got = np.asarray(T.matrix_to_euler_xyz(jnp.array(m.astype(np.float32))))
    want = R.from_matrix(m).as_euler("XYZ")  # intrinsic XYZ == Rx@Ry@Rz
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_quat_multiply_composition():
    qa, qb = random_quats(8), random_quats(8)
    v = RNG.standard_normal((8, 5, 3)).astype(np.float32)
    lhs = T.qrot(T.quat_multiply(jnp.array(qa), jnp.array(qb)), jnp.array(v))
    rhs = T.qrot(jnp.array(qa), T.qrot(jnp.array(qb), jnp.array(v)))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)


def test_pose_affine_roundtrip():
    q = random_quats(32)
    t = RNG.standard_normal((32, 3)).astype(np.float32)
    aff = T.pose_to_affine(jnp.array(t), jnp.array(q))
    assert aff.shape == (32, 4, 4)
    v = RNG.standard_normal((32, 6, 3)).astype(np.float32)
    via_aff = jnp.einsum("bij,bnj->bni", aff[:, :3, :3], jnp.array(v)) + aff[:, None, :3, 3]
    via_pose = T.qtransform(jnp.array(t), jnp.array(q), jnp.array(v))
    np.testing.assert_allclose(np.asarray(via_aff), np.asarray(via_pose), atol=1e-5)
    t2, q2 = T.affine_to_pose(aff)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
    dot = np.abs(np.sum(np.asarray(q2) * q, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


@pytest.mark.parametrize("shape", [(6, 4), (2, 3, 4)])
def test_quat_to_euler_shapes(shape):
    q = RNG.standard_normal(shape).astype(np.float32)
    e = T.quat_to_euler(jnp.array(q))
    assert e.shape == shape[:-1] + (3,)
