"""Farthest point sampling (TPU-first).

Semantics match ``torch_cluster.fps(..., random_start=False)`` as used by the reference's
PointNet++ set abstraction (utils/pn2_utils.py:131-137) and merged-cloud downsampling
(utils/node_merge_utils.py:219): greedy max-min selection starting from the first valid point of
each cloud, ties broken toward the lowest index.

FPS is sequential in the number of selections but embarrassingly parallel across clouds, so the
TPU-idiomatic layout is a single ``lax.fori_loop`` over selections whose body does *batched*
[B, N] work (one fused XLA step per selection, all clouds advance together). That is
``farthest_point_sample_xla`` and it is the default on every backend.

``farthest_point_sample_pallas`` covers the opposite regime — few clouds, many points (the merged
super-fragment downsample, node_merge_utils.py:219: one 2..20k-point cloud -> 1000 samples). There
the whole cloud and the running min-distance array stay resident in VMEM across all selections so
the sequential loop never round-trips HBM.

An optional mask restricts selection to valid points (used by the agglomeration engine when
sampling from merged, partially-invalidated clouds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def farthest_point_sample_xla(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Batched FPS. xyz: [B, N, 3], mask: [B, N] bool -> idx [B, npoint] i32."""
    B, N, _ = xyz.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    big = jnp.float32(_BIG)
    dist0 = jnp.where(mask, big, -big)  # invalid points can never be argmax
    start = jnp.argmax(mask, axis=1).astype(jnp.int32)  # first valid point per cloud

    def body(i, carry):
        dist, farthest, out = carry
        out = out.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)  # [B, 1, 3]
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        d = jnp.where(mask, d, -big)
        dist = jnp.minimum(dist, d)
        return dist, jnp.argmax(dist, axis=1).astype(jnp.int32), out

    out = jnp.zeros((B, npoint), jnp.int32)
    _, _, out = jax.lax.fori_loop(0, npoint, body, (dist0, start, out))
    return out


def _fps_batched_kernel(
    x_ref, y_ref, z_ref, mask_ref, out_ref, *, npoint: int, out_pad: int, n: int
):
    """All clouds advance together: one program, ``npoint`` iterations of [B, N] vector work.

    x/y/z_ref, mask_ref: [B, N] (N padded to lanes); out_ref: [B, out_pad] i32.
    """
    x, y, z = x_ref[:, :], y_ref[:, :], z_ref[:, :]
    valid = mask_ref[:, :] > 0.5
    B = x.shape[0]
    big = jnp.float32(_BIG)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    start = jnp.min(jnp.where(valid, col, jnp.int32(n)), axis=1, keepdims=True)  # [B, 1]

    def body(i, carry):
        dist, farthest, acc = carry  # [B, N], [B, 1], [B, out_pad]
        sel = jax.lax.broadcasted_iota(jnp.int32, (B, out_pad), 1)
        acc = jnp.where(sel == i, farthest, acc)
        onehot = (col == farthest).astype(jnp.float32)  # [B, N]
        cx = jnp.sum(x * onehot, axis=1, keepdims=True)
        cy = jnp.sum(y * onehot, axis=1, keepdims=True)
        cz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
        d = jnp.where(valid, d, -big)
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(dist >= m, col, jnp.int32(n)), axis=1, keepdims=True)
        return dist, nxt, acc

    dist0 = jnp.where(valid, big, -big)
    acc0 = jnp.zeros((B, out_pad), jnp.int32)
    _, _, acc = jax.lax.fori_loop(0, npoint, body, (dist0, start, acc0))
    out_ref[:, :] = acc


def _fps_rows_per_block(B: int, N: int, budget_bytes: int = 6 * 2**20) -> int:
    """Largest sublane-multiple row-block whose ~6 [SB, N] f32 arrays fit the VMEM budget.
    Blocks must stay small even per-program because vmap composes by adding grid dims, not by
    fattening blocks — a grid-less call OOMs VMEM the moment it is vmapped."""
    np_ = N + (-N) % 128
    sb = max(8, (budget_bytes // (np_ * 4 * 6)) // 8 * 8)
    bp = B + (-B) % 8
    return min(sb, bp)


def _fps_pallas_batched(xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray) -> jnp.ndarray:
    """Batched FPS, grid over row-blocks; every block VMEM-resident.

    xyz: [B, N, 3] -> [B, npoint] i32. All clouds in a block advance together each
    selection; vmap adds grid dimensions (vmap-safe by construction).
    """
    B, N, _ = xyz.shape
    SB = _fps_rows_per_block(B, N)
    n_pad = (-N) % 128
    b_pad = (-B) % SB
    o_pad = (-npoint) % 128
    xt = jnp.pad(xyz.astype(jnp.float32), ((0, b_pad), (0, n_pad), (0, 0)))
    mk = jnp.pad(mask.astype(jnp.float32), ((0, b_pad), (0, n_pad)))
    Bp, Np = B + b_pad, N + n_pad
    out = pl.pallas_call(
        functools.partial(
            _fps_batched_kernel, npoint=npoint, out_pad=npoint + o_pad, n=Np
        ),
        grid=(Bp // SB,),
        in_specs=[
            pl.BlockSpec((SB, Np), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec((SB, npoint + o_pad), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, npoint + o_pad), jnp.int32),
    )(xt[:, :, 0], xt[:, :, 1], xt[:, :, 2], mk)
    return out[:B, :npoint]


def _fps_pallas_vmem_bytes(B: int, N: int, npoint: int) -> int:
    sb = _fps_rows_per_block(B, N)
    np_ = N + (-N) % 128
    op = npoint + (-npoint) % 128
    return sb * np_ * 4 * 6 + sb * op * 4  # per-block: x, y, z, mask, dist, scratch + out


def _fps_kernel(xyz_ref, mask_ref, out_ref, *, npoint: int, n: int):
    # xyz_ref: [1, 8, N] (coords in sublanes 0..2), mask_ref: [1, 1, N] f32 (1 valid / 0 pad)
    xyz = xyz_ref[0, :, :]  # [8, N]
    valid = mask_ref[0, 0:1, :] > 0.5  # [1, N]
    big = jnp.float32(_BIG)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # [1, N]
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, npoint), 1)  # [1, npoint]
    start = jnp.min(jnp.where(valid, col, jnp.int32(n)))

    def body(i, carry):
        dist, farthest, acc = carry  # [1, N] f32, i32 scalar, [1, npoint] i32
        acc = jnp.where(sel == i, farthest, acc)
        onehot = (col == farthest).astype(jnp.float32)  # [1, N]
        centroid = jnp.sum(xyz * onehot, axis=1, keepdims=True)  # [8, 1]
        d = jnp.sum((xyz - centroid) ** 2, axis=0, keepdims=True)  # [1, N]
        d = jnp.where(valid, d, -big)
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist)
        nxt = jnp.min(jnp.where(dist >= m, col, jnp.int32(n)))
        return dist, nxt, acc

    dist0 = jnp.where(valid, big, -big)
    acc0 = jnp.zeros((1, npoint), jnp.int32)
    _, _, acc = jax.lax.fori_loop(0, npoint, body, (dist0, start, acc0))
    out_ref[0, 0, :] = acc[0, :]


def farthest_point_sample_pallas(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Per-cloud VMEM-resident FPS. xyz: [B, N, 3] -> idx [B, npoint] i32."""
    B, N, _ = xyz.shape
    if mask is None:
        mask = jnp.ones((B, N), bool)
    n_pad = (-N) % 128
    xt = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, n_pad)))
    mk = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, n_pad)))[:, None, :]
    Np = N + n_pad
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint, n=Np),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 8, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, npoint), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint), jnp.int32),
    )(xt, mk)
    return out[:, 0, :]


def farthest_point_sample(
    xyz: jnp.ndarray, npoint: int, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Dispatching FPS. xyz: [B, N, 3] -> [B, npoint] i32.

    On TPU the batched single-program Pallas kernel is the default: the whole selection loop
    runs inside one kernel with every array VMEM-resident, which is both orders of magnitude
    faster to compile than the XLA fori_loop lowering (372s -> 0.6s measured on this chip) and
    free of per-step dispatch overhead. Falls back to batched XLA when the working set exceeds
    VMEM or off-TPU (tests, CPU mesh).
    """
    B, N = xyz.shape[:2]
    if jax.default_backend() == "tpu" and _fps_pallas_vmem_bytes(B, N, npoint) < 12 * 2**20:
        if mask is None:
            mask = jnp.ones((B, N), bool)
        return _fps_pallas_batched(xyz, npoint, mask)
    return farthest_point_sample_xla(xyz, npoint, mask)
