"""Point-cloud normal estimation (pure JAX).

Equivalent of pytorch3d ``ops.estimate_pointcloud_normals(pcs, neighborhood_size=20)`` as used by
the interpenetration filter (reference utils/node_merge_utils.py:170): per-point kNN neighborhood
-> 3x3 covariance -> eigenvector of the smallest eigenvalue, with pytorch3d's default direction
disambiguation (flip each normal to agree with the majority of vectors from neighbors toward the
center point).

TPU-first numerics/layout (all measured on this chip at engine shapes, B*P=160 clouds):
  * the smallest-eigenvector solve is CLOSED-FORM (Cardano trigonometric eigenvalues +
    cross-product eigenvector) over SCALAR coefficient arrays: ``jnp.linalg.eigh`` lowers
    batched 3x3 problems to a generic routine that measured 660 ms for 160k matrices —
    the hottest op in the whole inference engine — and a [..., 3, 3] operand tiles to
    (8, 128) lanes, a 113x memory expansion.
  * ``method='analytic'`` (default): Pallas one-hot gathers of [B, N, K, 3] neighborhoods —
    fastest (130 ms), but XLA lays the trailing-3 temporaries out 128 lanes wide, a 42.7x
    memory expansion (12 GB of the batch-32 engine's failed 19.5 G HBM allocation).
  * ``method='lowmem'``: coordinate-split statistics in [B, K, N] layout (trailing N tiles
    cleanly, no padded temporaries) — 204 ms, for large-batch/memory-tight programs.
  * an uncentered W-matmul moments variant (kNN adjacency @ moment features, 84 ms) was
    REJECTED: computing covariances as sum(x^2) - K*mu^2 in f32 loses the small eigenvector
    to cancellation (10% of normals flip vs the centered computation).
``method='eigh'`` keeps the LAPACK-parity path for verification (tests/test_ops.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.ops.grouping import knn_points


def smallest_eigvec_sym3x3_coeffs(a00, a01, a02, a11, a12, a22):
    """Unit eigenvector of the smallest eigenvalue of symmetric 3x3 matrices given as six
    coefficient arrays of any (equal) shape. Returns (vx, vy, vz), same shape each.

    Trigonometric (Cardano) eigenvalue solution + max-norm cross product of rows of
    (A - lambda I). Sign is arbitrary (as with eigh). For isotropic matrices (repeated
    smallest eigenvalue) the eigenspace is degenerate; returns e_x."""
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00**2 + b11**2 + b22**2 + 2.0 * (a01**2 + a02**2 + a12**2)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    det_b = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    safe_p = jnp.maximum(p, 1e-30)
    r = jnp.clip(det_b / (2.0 * safe_p**3), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest eigenvalue

    # rows of (A - lam I)
    r0 = (a00 - lam, a01, a02)
    r1 = (a01, a11 - lam, a12)
    r2 = (a02, a12, a22 - lam)

    def cross(u, v):
        return (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )

    c01, c02, c12 = cross(r0, r1), cross(r0, r2), cross(r1, r2)
    n01 = c01[0] ** 2 + c01[1] ** 2 + c01[2] ** 2
    n02 = c02[0] ** 2 + c02[1] ** 2 + c02[2] ** 2
    n12 = c12[0] ** 2 + c12[1] ** 2 + c12[2] ** 2
    # max-norm cross product, selected with scalar where-chains (no stacked [., 3] tensors)
    use02 = n02 > n01
    best_n = jnp.where(use02, n02, n01)
    vx = jnp.where(use02, c02[0], c01[0])
    vy = jnp.where(use02, c02[1], c01[1])
    vz = jnp.where(use02, c02[2], c01[2])
    use12 = n12 > best_n
    best_n = jnp.where(use12, n12, best_n)
    vx = jnp.where(use12, c12[0], vx)
    vy = jnp.where(use12, c12[1], vy)
    vz = jnp.where(use12, c12[2], vz)
    norm = jnp.sqrt(best_n)
    ok = norm > 1e-20
    inv = 1.0 / jnp.maximum(norm, 1e-30)
    # degenerate eigenspace: fixed e_x convention (direction mathematically arbitrary there)
    return (
        jnp.where(ok, vx * inv, 1.0),
        jnp.where(ok, vy * inv, 0.0),
        jnp.where(ok, vz * inv, 0.0),
    )


def smallest_eigvec_sym3x3(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> unit eigenvector [..., 3] of the smallest eigenvalue."""
    vx, vy, vz = smallest_eigvec_sym3x3_coeffs(
        cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
        cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
    )
    return jnp.stack([vx, vy, vz], axis=-1)


def estimate_pointcloud_normals(
    pcs: jnp.ndarray,
    neighborhood_size: int = 20,
    valid: jnp.ndarray | None = None,
    method: str = "analytic",
) -> jnp.ndarray:
    """pcs: [B, N, 3] -> unit normals [B, N, 3]. ``method``: analytic | lowmem | eigh."""
    B, N, _ = pcs.shape
    K = neighborhood_size
    _, idx = knn_points(pcs, pcs, K, valid=valid)  # [B, N, K], includes self

    if method in ("analytic", "eigh"):
        from puzzlefusion_plusplus_tpu.ops.grouping import index_points

        nbrs = index_points(pcs, idx)  # [B, N, K, 3]
        mean = nbrs.mean(axis=2, keepdims=True)
        centered = nbrs - mean
        cov = jnp.einsum("bnki,bnkj->bnij", centered, centered)  # [B, N, 3, 3]
        if method == "eigh":
            _, eigvecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
            normals = eigvecs[..., 0]
        else:
            normals = smallest_eigvec_sym3x3(cov)
        df = nbrs - pcs[:, :, None, :]
        proj = jnp.einsum("bnki,bni->bnk", df, normals)
        n_pos = (proj > 0).sum(-1)
        flip = n_pos < 0.5 * K
        return jnp.where(flip[..., None], -normals, normals)

    # 'lowmem': coordinate-split neighbor coordinates in [B, K, N] layout
    idx_t = jnp.swapaxes(idx, 1, 2)  # [B, K, N]
    nbr = [
        jnp.take_along_axis(
            jnp.broadcast_to(pcs[..., c][:, None, :], (B, K, N)), idx_t, axis=2
        )
        for c in range(3)
    ]
    mean = [m.mean(axis=1) for m in nbr]  # [B, N] each
    cen = [nbr[c] - mean[c][:, None, :] for c in range(3)]
    cov = {
        (c, d): (cen[c] * cen[d]).sum(axis=1)  # [B, N]
        for c in range(3)
        for d in range(c, 3)
    }
    vx, vy, vz = smallest_eigvec_sym3x3_coeffs(
        cov[(0, 0)], cov[(0, 1)], cov[(0, 2)], cov[(1, 1)], cov[(1, 2)], cov[(2, 2)]
    )

    # disambiguation (pytorch3d _disambiguate_vector_directions, Tombari SHOT convention):
    # flip when fewer than half of the (neighbor - point) offsets project positively
    v = (vx, vy, vz)
    proj = sum((nbr[c] - pcs[..., c][:, None, :]) * v[c][:, None, :] for c in range(3))
    n_pos = (proj > 0).sum(axis=1)  # [B, N]
    sign = jnp.where(n_pos < 0.5 * K, -1.0, 1.0)
    return jnp.stack([vx * sign, vy * sign, vz * sign], axis=-1)
