"""Point-cloud normal estimation (pure JAX).

Equivalent of pytorch3d ``ops.estimate_pointcloud_normals(pcs, neighborhood_size=20)`` as used by
the interpenetration filter (reference utils/node_merge_utils.py:170): per-point kNN neighborhood
-> 3x3 covariance -> eigenvector of the smallest eigenvalue, with pytorch3d's default direction
disambiguation (flip each normal to agree with the majority of vectors from neighbors toward the
center point).

The 3x3 eigendecompositions batch onto the VPU via ``jnp.linalg.eigh`` (ascending eigenvalues, so
normals are column 0).
"""

from __future__ import annotations

import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.ops.grouping import index_points, knn_points


def estimate_pointcloud_normals(
    pcs: jnp.ndarray, neighborhood_size: int = 20, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """pcs: [B, N, 3] -> unit normals [B, N, 3]."""
    _, idx = knn_points(pcs, pcs, neighborhood_size, valid=valid)  # includes self
    nbrs = index_points(pcs, idx)  # [B, N, K, 3]
    mean = nbrs.mean(axis=2, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("bnki,bnkj->bnij", centered, centered)  # [B, N, 3, 3]
    _, eigvecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normals = eigvecs[..., 0]  # smallest-variance direction, [B, N, 3]
    # disambiguate (pytorch3d _disambiguate_vector_directions, Tombari et al. SHOT convention):
    # flip the normal when fewer than half of the (neighbor - point) offsets project positively
    df = nbrs - pcs[:, :, None, :]  # [B, N, K, 3]
    proj = jnp.einsum("bnki,bni->bnk", df, normals)
    n_pos = (proj > 0).sum(-1)
    flip = n_pos < 0.5 * neighborhood_size
    normals = jnp.where(flip[..., None], -normals, normals)
    return normals
