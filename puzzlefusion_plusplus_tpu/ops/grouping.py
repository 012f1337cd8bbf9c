"""Point grouping ops: square distance, index gather, ball query, kNN (pure JAX, fixed-shape).

Semantics match the reference PointNet++ utilities (utils/pn2_utils.py):
  * ``square_distance``  (:21-43) — expanded-form pairwise squared L2.
  * ``index_points``     (:45-62) — batched gather.
  * ``query_ball_point`` (:92-112) — radius query keeping the *lowest-index* ``nsample`` points
    (the reference sorts candidate indices, not distances), empty slots backfilled with the first
    hit.
  * ``knn_points``       — k nearest neighbors (torch_geometric/pytorch3d knn equivalent, used by
    normal estimation and the dynamic encoders).

Everything is dense and static-shape: [B, S, N] distance matrices flow through the MXU; selection
uses top_k rather than sorts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances. src: [B, N, C], dst: [B, M, C] -> [B, N, M]."""
    d = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
    d = d + jnp.sum(src**2, axis=-1)[..., :, None]
    d = d + jnp.sum(dst**2, axis=-1)[..., None, :]
    return d


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Batched gather. points: [B, N, C], idx: [B, ...] int -> [B, ..., C].

    On TPU this dispatches to the one-hot-matmul Pallas kernel (ops/gather_pallas.py) —
    XLA's gather is ~10x slower on this access pattern — whenever the cloud fits VMEM.
    """
    if jax.default_backend() == "tpu" and points.ndim == 3:
        from puzzlefusion_plusplus_tpu.ops.gather_pallas import (
            gather_points,
            gather_vmem_bytes,
        )

        N, C = points.shape[1], points.shape[2]
        if gather_vmem_bytes(N, C) < 10 * 2**20 and jnp.issubdtype(
            points.dtype, jnp.floating
        ):
            return gather_points(points, idx)
    return jax.vmap(lambda p, i: p[i])(points, idx)


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Radius query. xyz: [B, N, 3], new_xyz: [B, S, 3] -> group idx [B, S, nsample] i32.

    Keeps the ``nsample`` lowest-index points within ``radius`` of each query (exact reference
    behavior, pn2_utils.py:92-112); slots beyond the hit count repeat the first hit. If a query
    has no hit at all (possible only for padded/degenerate queries), falls back to index 0.

    On TPU the selection runs as a counting formulation on the MXU instead of ``lax.top_k``
    (bit-identical results, parity-tested); the N^2 triangular matmul caps it at N <= 2048.
    """
    N = xyz.shape[1]
    sqd = square_distance(new_xyz, xyz)  # [B, S, N]
    in_ball = sqd <= radius**2
    if valid is not None:
        in_ball = in_ball & valid[:, None, :]
    if jax.default_backend() == "tpu" and N <= 2048:
        group_idx = _ball_select_counting(in_ball, nsample)
    else:
        group_idx = _ball_select_topk(in_ball, nsample)
    first = group_idx[..., :1]
    group_idx = jnp.where(group_idx == N, first, group_idx)
    group_idx = jnp.where(group_idx == N, 0, group_idx)  # no hits at all
    return group_idx


def _ball_select_topk(in_ball: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """First-``nsample``-hit selection: k smallest candidate indices via lax.top_k."""
    N = in_ball.shape[-1]
    cand = jnp.where(in_ball, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))
    neg_topk, _ = jax.lax.top_k(-cand, nsample)  # [B, S, nsample]
    return -neg_topk


def _ball_select_counting(in_ball: jnp.ndarray, nsample: int) -> jnp.ndarray:
    """First-``nsample``-hit selection via hit-prefix counting (exact, MXU-friendly).

    The k-th (0-based) in-ball index equals the count of positions whose inclusive hit
    prefix is <= k. The prefix is a triangular matmul — 0/1 operands are exact under the
    MXU's bf16 operand rounding and counts stay far below 2^24 — and the count is a
    broadcast-compare reduce that XLA fuses without materializing [B, S, N, K]. Replaces
    ``lax.top_k`` over the N axis, which at SA-stage shapes (131k rows x 1000) was ~2/3 of
    the whole grouping chain's time (VALIDATION.md r3 ball-query note)."""
    N = in_ball.shape[-1]
    x = in_ball.astype(jnp.float32)
    prefix = jnp.einsum("bsn,nm->bsm", x, jnp.triu(jnp.ones((N, N), jnp.float32)))
    ks = jnp.arange(nsample, dtype=jnp.float32)
    return jnp.sum(
        (prefix[..., None] <= ks + 0.5).astype(jnp.int32), axis=-2, dtype=jnp.int32
    )


def index_points_matmul_safe(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather for values that feed DIRECTLY into an MXU matmul (e.g. grouped features into
    a Dense layer). On TPU uses the single-matmul approx gather — its bf16 operand rounding
    is exactly the rounding the consuming matmul applies, so results are unchanged at ~4x
    fewer gather FLOPs. Falls back to the exact path elsewhere."""
    if jax.default_backend() == "tpu" and points.ndim == 3:
        from puzzlefusion_plusplus_tpu.ops.gather_pallas import (
            gather_points_approx,
            gather_vmem_bytes,
        )

        N, C = points.shape[1], points.shape[2]
        if gather_vmem_bytes(N, C) < 10 * 2**20 and jnp.issubdtype(
            points.dtype, jnp.floating
        ):
            return gather_points_approx(points, idx)
    return index_points(points, idx)


def knn_points(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors. query: [B, S, 3], points: [B, N, 3] -> (sqdist, idx) [B, S, k]."""
    sqd = square_distance(query, points)
    if valid is not None:
        sqd = jnp.where(valid[:, None, :], sqd, jnp.float32(1e10))
    neg, idx = jax.lax.top_k(-sqd, k)
    return -neg, idx.astype(jnp.int32)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: jnp.ndarray | None,
    fps_idx: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FPS-center grouping (reference pn2_utils.py:115-152 with precomputed fps_idx).

    xyz: [B, N, 3], points: [B, N, D] or None, fps_idx: [B, npoint].
    Returns (new_xyz [B, npoint, 3], new_points [B, npoint, nsample, 3(+D)]) where grouped
    coordinates are recentered on their query point.
    """
    new_xyz = index_points(xyz, fps_idx)  # [B, S, 3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)  # [B, S, K]
    grouped_xyz = index_points(xyz, idx)  # [B, S, K, 3]
    grouped_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_norm
    return new_xyz, new_points
