"""Piece-aware pointwise encoders for the matching model (flax.linen, fixed-shape).

Parity targets (Jigsaw_matching/model/modules/encoder/):
  * ``PointNet2MSGPointwise`` — PointNet++ multi-scale-grouping with 4 SA + 4 FP stages and a
    per-point head (pointnet2_msg.py:8-45 channel plan: SA npoints 1024/256/64/16, dual radii,
    FP back up to per-point 128 feats -> conv1 to feat_out).
  * ``DGCNN``                 — kNN edge-conv feature extractor (dgcnn.py).

TPU adaptation of the "dynamic" variants (pointnet2_msg.py:48-94): the reference runs ragged
per-piece FPS/kNN through torch_geometric with batch vectors at B=1. Here clouds stay flat
[B, N_sum, 3] with a per-point ``piece_id``; sampling uses masked FPS over the whole flat cloud
(fixed npoint, so shapes are static) and all neighborhood queries mask cross-piece pairs with a
large distance bias — the exact trick of the reference's ``square_distance_with_piece``
(pointnet2_dynamic_utils.py:8-35).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.matching.ops import square_distance
from puzzlefusion_plusplus_tpu.ops.fps import farthest_point_sample_xla

_BIG = 1e6


def _gather(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: [B, N, C], idx: [B, ...] -> [B, ..., C] (Pallas one-hot gather on TPU)."""
    from puzzlefusion_plusplus_tpu.ops.grouping import index_points

    return index_points(points, idx)


def piece_aware_sqdist(src, dst, src_pid, dst_pid):
    """Squared distances with cross-piece pairs pushed far away (reference :8-35)."""
    d = square_distance(src, dst)
    return d + jnp.where(src_pid[:, :, None] == dst_pid[:, None, :], 0.0, _BIG)


def ball_group(radius, nsample, xyz, new_xyz, pid, new_pid, feats):
    """Piece-aware radius grouping, recentered; lowest-index selection within the ball."""
    B, N, _ = xyz.shape
    nsample = min(nsample, N)  # neighborhoods can't exceed the source level's size
    d = piece_aware_sqdist(new_xyz, xyz, new_pid, pid)
    in_ball = d <= radius**2
    cand = jnp.where(in_ball, jnp.arange(N, dtype=jnp.int32), jnp.int32(N))
    neg_topk, _ = jax.lax.top_k(-cand, nsample)
    idx = -neg_topk
    first = idx[..., :1]
    idx = jnp.where(idx == N, first, idx)
    idx = jnp.where(idx == N, 0, idx)
    grouped_xyz = _gather(xyz, idx) - new_xyz[:, :, None, :]
    if feats is None:
        return grouped_xyz
    return jnp.concatenate([grouped_xyz, _gather(feats, idx)], axis=-1)


class SetAbstractionMsg(nn.Module):
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, pid, feats, valid, train: bool = False):
        """xyz: [B, N, 3], pid/valid: [B, N], feats: [B, N, D] or None.

        Returns (new_xyz [B, S, 3], new_pid [B, S], new_feats [B, S, C], new_valid [B, S]).
        """
        fps_idx = farthest_point_sample_xla(xyz, self.npoint, mask=valid)
        new_xyz = _gather(xyz, fps_idx)
        new_pid = jnp.take_along_axis(pid, fps_idx, axis=1)
        new_valid = jnp.take_along_axis(valid, fps_idx, axis=1)

        outs = []
        for r_i, (radius, nsample, mlp) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            g = ball_group(radius, nsample, xyz, new_xyz, pid, new_pid, feats)
            for j, ch in enumerate(mlp):
                g = nn.Dense(ch, name=f"conv{r_i}_{j}")(g)
                g = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    name=f"bn{r_i}_{j}",
                )(g)
                g = nn.relu(g)
            outs.append(g.max(axis=2))
        return new_xyz, new_pid, jnp.concatenate(outs, axis=-1), new_valid


class FeaturePropagation(nn.Module):
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz1, xyz2, pid1, pid2, feats1, feats2, train: bool = False):
        """Inverse-distance 3-NN interpolation from level 2 up to level 1
        (pn2 FP semantics, piece-aware)."""
        d = piece_aware_sqdist(xyz1, xyz2, pid1, pid2)
        neg, idx = jax.lax.top_k(-d, 3)
        dists = jnp.maximum(-neg, 1e-10)
        w = 1.0 / dists
        w = w / w.sum(-1, keepdims=True)
        interp = (_gather(feats2, idx) * w[..., None]).sum(axis=2)
        h = interp if feats1 is None else jnp.concatenate([feats1, interp], axis=-1)
        for j, ch in enumerate(self.mlp):
            h = nn.Dense(ch, name=f"conv{j}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{j}"
            )(h)
            h = nn.relu(h)
        return h


class PointNet2MSGPointwise(nn.Module):
    """4-SA / 4-FP per-point encoder (reference channel plan, scaled by ``width``)."""

    feat_out: int = 128
    npoints: Sequence[int] = (1024, 256, 64, 16)

    @nn.compact
    def __call__(self, xyz, pid, valid, train: bool = False):
        """xyz: [B, N, 3] flat cloud -> per-point features [B, N, feat_out]."""
        l0 = (xyz, pid, xyz, valid)
        l1 = SetAbstractionMsg(
            self.npoints[0], (0.05, 0.1), (16, 32),
            ((16, 16, 32), (32, 32, 64)), name="sa1",
        )(*l0, train)
        l2 = SetAbstractionMsg(
            self.npoints[1], (0.1, 0.2), (16, 32),
            ((64, 64, 128), (64, 96, 128)), name="sa2",
        )(*l1, train)
        l3 = SetAbstractionMsg(
            self.npoints[2], (0.2, 0.4), (16, 32),
            ((128, 196, 256), (128, 196, 256)), name="sa3",
        )(*l2, train)
        l4 = SetAbstractionMsg(
            self.npoints[3], (0.4, 0.8), (16, 32),
            ((256, 256, 512), (256, 384, 512)), name="sa4",
        )(*l3, train)

        p3 = FeaturePropagation((256, 256), name="fp4")(
            l3[0], l4[0], l3[1], l4[1], l3[2], l4[2], train
        )
        p2 = FeaturePropagation((256, 256), name="fp3")(
            l2[0], l3[0], l2[1], l3[1], l2[2], p3, train
        )
        p1 = FeaturePropagation((256, 128), name="fp2")(
            l1[0], l2[0], l1[1], l2[1], l1[2], p2, train
        )
        p0 = FeaturePropagation((128, 128, 128), name="fp1")(
            xyz, l1[0], pid, l1[1], None, p1, train
        )
        h = nn.Dense(self.feat_out, name="conv1")(p0)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn1")(h)
        return h


class DGCNN(nn.Module):
    """Piece-aware kNN edge-conv encoder (reference dgcnn.py alternative)."""

    feat_out: int = 128
    k: int = 20
    channels: Sequence[int] = (64, 64, 128)

    @nn.compact
    def __call__(self, xyz, pid, valid, train: bool = False):
        from puzzlefusion_plusplus_tpu.matching.ops import knn_piece_aware

        h = xyz
        feats = []
        for li, ch in enumerate(self.channels):
            _, idx = knn_piece_aware(xyz, pid, self.k)
            nbr = _gather(h, idx)  # [B, N, k, C]
            edge = jnp.concatenate(
                [nbr - h[:, :, None, :], jnp.broadcast_to(h[:, :, None, :], nbr.shape)],
                axis=-1,
            )
            e = nn.Dense(ch, name=f"edge{li}")(edge)
            e = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             name=f"bn{li}")(e)
            h = nn.leaky_relu(e, 0.2).max(axis=2)
            feats.append(h)
        h = jnp.concatenate(feats, axis=-1)
        h = nn.Dense(self.feat_out, name="head")(h)
        return h
