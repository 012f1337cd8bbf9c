"""Assembly evaluation metrics (pure JAX, fixed-shape, vmap/jit safe).

Semantics match puzzlefusion_plusplus/denoiser/evaluation/evaluator.py:
  * ``calc_part_acc``   — per-part bidirectional mean chamfer < 0.01 -> per-shape accuracy (:84-117)
  * ``calc_shape_cd``   — padded parts pushed to 1e3, whole-shape per-point chamfer (:121-148)
  * ``trans_metrics`` / ``rot_metrics`` — (R)MSE with 360-degree euler wraparound (:25-80)
  * ``_valid_mean``     — NaN-zeroing masked mean over valid parts (:8-22)
"""

from __future__ import annotations

import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.ops.chamfer import (
    chamfer_distance_mean,
    chamfer_distance_per_point,
)
from puzzlefusion_plusplus_tpu.utils.transforms import quat_to_euler, transform_pc


def valid_mean(per_part: jnp.ndarray, valids: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the part dim with NaN zeroing. per_part/valids: [B, P] -> [B]."""
    per_part = jnp.where(jnp.isnan(per_part), 0.0, per_part)
    valids = valids.astype(per_part.dtype)
    return (per_part * valids).sum(-1) / valids.sum(-1)


def trans_metrics(
    trans1: jnp.ndarray, trans2: jnp.ndarray, valids: jnp.ndarray, metric: str = "rmse"
) -> jnp.ndarray:
    """Translation error. trans1/2: [B, P, 3], valids: [B, P] -> [B]."""
    if metric == "mse":
        per_part = ((trans1 - trans2) ** 2).mean(-1)
    elif metric == "rmse":
        per_part = ((trans1 - trans2) ** 2).mean(-1) ** 0.5
    elif metric == "mae":
        per_part = jnp.abs(trans1 - trans2).mean(-1)
    else:
        raise ValueError(metric)
    return valid_mean(per_part, valids)


def rot_metrics(
    rot1: jnp.ndarray, rot2: jnp.ndarray, valids: jnp.ndarray, metric: str = "rmse"
) -> jnp.ndarray:
    """Rotation error in euler degrees with 360 wraparound. rot1/2: [B, P, 4] -> [B]."""
    deg1 = quat_to_euler(rot1, to_degree=True)
    deg2 = quat_to_euler(rot2, to_degree=True)
    diff1 = jnp.abs(deg1 - deg2)
    diff = jnp.minimum(diff1, 360.0 - diff1)
    if metric == "mse":
        per_part = (diff**2).mean(-1)
    elif metric == "rmse":
        per_part = (diff**2).mean(-1) ** 0.5
    elif metric == "mae":
        per_part = jnp.abs(diff).mean(-1)
    else:
        raise ValueError(metric)
    return valid_mean(per_part, valids)


def calc_part_acc(
    pts: jnp.ndarray,
    trans1: jnp.ndarray,
    trans2: jnp.ndarray,
    rot1: jnp.ndarray,
    rot2: jnp.ndarray,
    valids: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Part accuracy: per-part bidirectional mean chamfer < 0.01 counted correct.

    pts: [B, P, N, 3] (already scaled to world units), poses: [B, P, 3/4], valids: [B, P].
    Returns (acc [B], acc_per_part [B, P], cd_per_part [B, P]).
    """
    B, P = pts.shape[:2]
    pts1 = transform_pc(trans1, rot1, pts).reshape(B * P, *pts.shape[2:])
    pts2 = transform_pc(trans2, rot2, pts).reshape(B * P, *pts.shape[2:])
    cd = chamfer_distance_mean(pts1, pts2, bidirectional=True).reshape(B, P)
    acc_per_part = (cd < 0.01) & (valids == 1)
    acc = acc_per_part.sum(-1) / (valids == 1).sum(-1)
    return acc, acc_per_part, cd


def calc_shape_cd(
    pts: jnp.ndarray,
    trans1: jnp.ndarray,
    trans2: jnp.ndarray,
    rot1: jnp.ndarray,
    rot2: jnp.ndarray,
    valids: jnp.ndarray,
) -> jnp.ndarray:
    """Whole-shape chamfer: padded parts pushed to 1e3 so they never match real points.

    pts: [B, P, N, 3] -> [B].
    """
    B, P, N, _ = pts.shape
    pts = jnp.where(valids[..., None, None] == 0, 1e3, pts)
    pts1 = transform_pc(trans1, rot1, pts).reshape(B, P * N, 3)
    pts2 = transform_pc(trans2, rot2, pts).reshape(B, P * N, 3)
    fwd, bwd = chamfer_distance_per_point(pts1, pts2)
    shape_cd = (fwd + bwd).reshape(B, P, N).mean(-1)
    return valid_mean(shape_cd, valids)
