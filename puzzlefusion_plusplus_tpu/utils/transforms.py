"""Quaternion / SE(3) transform library (pure JAX).

Conventions follow the reference pipeline (puzzlefusion_plusplus/denoiser/evaluation/transform.py,
utils/node_merge_utils.py): quaternions are **scalar-first** ``(w, x, y, z)`` and rotations act on
column vectors, ``v' = R v``. Euler angles use the XYZ convention ``M = Rx(a) @ Ry(b) @ Rz(c)``
(pytorch3d ``matrix_to_euler_angles(..., "XYZ")`` semantics), used only by the rotation metrics.

All functions broadcast over arbitrary leading dims and are jit/vmap safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize quaternion(s) to unit norm. [..., 4] -> [..., 4]."""
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps, None)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of scalar-first quaternions. [..., 4] x [..., 4] -> [..., 4]."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (= inverse for unit quaternions). [..., 4] -> [..., 4]."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``.

    Matches pytorch3d ``quaternion_apply`` (reference transform.py:7-21): computes the vector part
    of ``q * (0, v) * q^-1`` via the expanded cross-product form (no explicit Hamilton products).

    q: [..., 4], v: [..., 3]; leading dims broadcast.
    """
    w = q[..., :1]
    u = q[..., 1:]
    # v' = v + 2 w (u x v) + 2 u x (u x v)
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_apply_raw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """pytorch3d ``quaternion_apply`` semantics WITHOUT the unit-norm assumption:
    the vector part of q ⊗ (0, v) ⊗ q* (scales by |q|² for non-unit q). Used where the
    reference applies raw denoised quaternions (node_merge_utils.py:16-41)."""
    p = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_multiply(quat_multiply(q, p), quat_conjugate(q))[..., 1:]


def qrot(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate point cloud(s) ``v`` by quaternion(s) ``q``, broadcasting q over the point dim.

    Reference semantics (transform.py:7-21): if q has one fewer dim than v, q is expanded over
    v's second-to-last (point) dimension. q: [..., 4], v: [..., N, 3].
    """
    if q.ndim == v.ndim - 1:
        q = q[..., None, :]
    return quat_apply(q, v)


def qtransform(t: jnp.ndarray, q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``v`` by ``q`` then translate by ``t`` (reference transform.py:24-41).

    t: [..., 3], q: [..., 4], v: [..., N, 3]; t/q broadcast over the point dim.
    """
    if t.ndim == v.ndim - 1:
        t = t[..., None, :]
    return qrot(q, v) + t


def transform_pc(trans: jnp.ndarray, rot: jnp.ndarray, pc: jnp.ndarray) -> jnp.ndarray:
    """Apply a 7-DoF pose (trans [...,3], quat [...,4]) to point cloud [..., N, 3]."""
    return qtransform(trans, rot, pc)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion(s) -> rotation matrix(es). [..., 4] -> [..., 3, 3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    m = jnp.stack(
        [
            1.0 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1.0 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1.0 - two_s * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix(es) -> scalar-first unit quaternion(s). [..., 3, 3] -> [..., 4].

    Branchless Shepperd-style extraction: build all four candidate quaternions and select the one
    keyed by the largest squared component (numerically stable, jit-safe).
    """
    batch = m.shape[:-2]
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt_pos(x):
        return jnp.sqrt(jnp.clip(x, 0.0, None))

    q_abs = jnp.stack(
        [
            _sqrt_pos(1.0 + m00 + m11 + m22),
            _sqrt_pos(1.0 + m00 - m11 - m22),
            _sqrt_pos(1.0 - m00 + m11 - m22),
            _sqrt_pos(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )

    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # [..., 4 candidates, 4]

    denom = 2.0 * jnp.clip(q_abs[..., None], 0.1, None)
    cand = cand / denom
    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, axis=-1), axis=-2)
    q = q.reshape(batch + (4,))
    return quat_normalize(q)


def matrix_to_euler_xyz(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> Euler angles (radians) for M = Rx(a) @ Ry(b) @ Rz(c).

    Matches pytorch3d ``matrix_to_euler_angles(m, "XYZ")`` on non-degenerate inputs
    (reference transform.py:54-70 round-trips quat -> matrix -> euler this way).
    """
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_to_euler(q: jnp.ndarray, to_degree: bool = True) -> jnp.ndarray:
    """Quaternion -> Euler (XYZ), optionally in degrees (reference transform.py:54-70)."""
    e = matrix_to_euler_xyz(quat_to_matrix(quat_normalize(q)))
    if to_degree:
        e = jnp.rad2deg(e)
    return e


def axis_angle_to_quat(axis_angle: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation vector (axis * angle, radians) -> scalar-first quaternion. [..., 3] -> [..., 4].

    Part of the multi-representation rotation surface the reference exposes through its
    Rotation3D wrapper (Jigsaw_matching/utils/rotation.py:97-230)."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    # sin(half)/angle with a series fallback for tiny angles
    k = jnp.where(small, 0.5 - angle**2 / 48.0, jnp.sin(half) / jnp.clip(angle, eps, None))
    return jnp.concatenate([jnp.cos(half), axis_angle * k], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Scalar-first quaternion -> rotation vector. [..., 4] -> [..., 3]."""
    q = quat_normalize(q)
    q = jnp.where(q[..., :1] < 0, -q, q)  # canonical hemisphere
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., :1])
    small = sin_half < 1e-6
    k = jnp.where(small, 2.0 + angle**2 / 12.0, angle / jnp.clip(sin_half, eps, None))
    return q[..., 1:] * k


def rot6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D rotation -> matrix via Gram-Schmidt. [..., 6] -> [..., 3, 3]."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12, None)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.clip(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-12, None)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rot6d(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6] (first two rows)."""
    return jnp.concatenate([m[..., 0, :], m[..., 1, :]], axis=-1)


def pose_to_affine(trans: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """(trans [...,3], quat [...,4]) -> 4x4 affine [..., 4, 4] (rotation then translation)."""
    batch = trans.shape[:-1]
    rot = quat_to_matrix(quat)
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=trans.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def affine_to_pose(affine: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """4x4 affine -> (trans [...,3], quat [...,4])."""
    return affine[..., :3, 3], matrix_to_quat(affine[..., :3, :3])
