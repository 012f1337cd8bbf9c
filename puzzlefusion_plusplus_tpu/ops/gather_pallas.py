"""Batched point gather as a tiled one-hot matmul (Pallas TPU kernel).

XLA's native gather is pathologically slow on TPU for the PointNet++ grouping pattern —
measured 10-15 ms per call at [160, 1000, C] -> [160, S, K, C] on this chip while moving only
~16 MB (it is neither MXU nor well-vectorized VPU work). The TPU-native formulation is
``out[r, c] = onehot[r, n] @ points[n, c]``: build the one-hot rows in-register per tile and
ride the MXU. Same result bit-exactly (f32 one-hot x f32 values; 1.0 * x + 0.0 * y = x), ~10x
faster, and the kernel keeps the whole cloud VMEM-resident across row tiles.

Grid = (B, row-tiles); vmap composes by adding grid dimensions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TR = 512  # gathered rows per tile


def _gather_kernel(idx_ref, pts_ref, out_ref, *, n: int):
    # idx_ref: [1, 8, Rp] i32 (row 0 carries the indices), pts_ref: [1, N, C] f32,
    # out_ref: [1, TR, C] f32
    #
    # Bit-exactness: the MXU's single-pass f32 matmul rounds operands to bf16, which would
    # corrupt gathered values. Instead the f32 payload is split into 4 bytes (integers
    # 0..255 are exact in bf16), each byte plane is selected with the one-hot matmul, and
    # the planes are recombined bitwise — exact gather at MXU speed.
    r = pl.program_id(1)
    idx = idx_ref[0, 0, pl.ds(r * _TR, _TR)]  # [TR]
    u = pltpu.bitcast(pts_ref[0, :, :], jnp.int32)  # [N, C] (bit pattern; int32 ops only —
    # Mosaic has no uint32<->f32 casts, but two's-complement shifts/ors are bit-identical)
    col = jax.lax.broadcasted_iota(jnp.int32, (_TR, n), 1)
    onehot = (col == idx[:, None]).astype(jnp.float32)  # [TR, N]

    def select(plane):  # [N, C] f32 with values 0..255 -> [TR, C]
        return jax.lax.dot_general(
            onehot, plane, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g0 = select((u & 0xFF).astype(jnp.float32))
    g1 = select(((u >> 8) & 0xFF).astype(jnp.float32))
    g2 = select(((u >> 16) & 0xFF).astype(jnp.float32))
    g3 = select(((u >> 24) & 0xFF).astype(jnp.float32))
    lo = (g0 + g1 * 256.0).astype(jnp.int32)  # <= 65535, exact in f32
    hi = (g2 + g3 * 256.0).astype(jnp.int32)
    out_ref[0, :, :] = pltpu.bitcast(lo | (hi << 16), jnp.float32)


def gather_points_pallas(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """points: [B, N, C] f32, idx: [B, ...] i32 -> [B, ..., C]."""
    B, N, C = points.shape
    idx_shape = idx.shape
    R = 1
    for d in idx_shape[1:]:
        R *= d
    flat_idx = idx.reshape(B, R).astype(jnp.int32)

    r_pad = (-R) % _TR
    n_pad = (-N) % 128
    c_pad = (-C) % 128
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad), (0, c_pad)))
    # indices ride in an 8-sublane carrier (Mosaic block constraint on the trailing dims)
    fidx = jnp.pad(flat_idx[:, None, :], ((0, 0), (0, 7), (0, r_pad)))
    Np, Cp, Rp = N + n_pad, C + c_pad, R + r_pad

    out = pl.pallas_call(
        functools.partial(_gather_kernel, n=Np),
        grid=(B, Rp // _TR),
        in_specs=[
            pl.BlockSpec((1, 8, Rp), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Cp), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TR, Cp), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Rp, Cp), jnp.float32),
    )(fidx, pts)
    return out[:, :R, :C].reshape(idx_shape + (C,)).astype(points.dtype)


def gather_vmem_bytes(N: int, C: int) -> int:
    np_ = N + (-N) % 128
    cp = C + (-C) % 128
    # cloud + one-hot tile + out tile (f32)
    return np_ * cp * 4 + _TR * np_ * 4 + _TR * cp * 4


# ------------------------------------------------------- approx gather (single matmul)


def _gather_approx_kernel(idx_ref, pts_ref, out_ref, *, n: int):
    # one f32 matmul: the MXU rounds operands to bf16, i.e. gathered values come back
    # bf16-rounded. Safe EXACTLY when the consumer is another MXU matmul (Dense layers),
    # whose own operand rounding makes the pre-rounding invisible: bf16(bf16(x)) == bf16(x).
    r = pl.program_id(1)
    idx = idx_ref[0, 0, pl.ds(r * _TR, _TR)]
    pts = pts_ref[0, :, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (_TR, n), 1)
    onehot = (col == idx[:, None]).astype(jnp.float32)
    out_ref[0, :, :] = jax.lax.dot_general(
        onehot, pts, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gather_pallas_call(kernel, points, idx):
    B, N, C = points.shape
    idx_shape = idx.shape
    R = 1
    for d in idx_shape[1:]:
        R *= d
    flat_idx = idx.reshape(B, R).astype(jnp.int32)
    r_pad = (-R) % _TR
    n_pad = (-N) % 128
    c_pad = (-C) % 128
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad), (0, c_pad)))
    fidx = jnp.pad(flat_idx[:, None, :], ((0, 0), (0, 7), (0, r_pad)))
    Np, Cp, Rp = N + n_pad, C + c_pad, R + r_pad
    out = pl.pallas_call(
        functools.partial(kernel, n=Np),
        grid=(B, Rp // _TR),
        in_specs=[
            pl.BlockSpec((1, 8, Rp), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Cp), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TR, Cp), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Rp, Cp), jnp.float32),
    )(fidx, pts)
    return out[:, :R, :C].reshape(idx_shape + (C,)).astype(points.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather_points_approx(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Single-matmul gather (values bf16-rounded by the MXU; ~4x fewer FLOPs than the exact
    byte-split path). Use ONLY when the gathered values feed straight into matmuls."""
    return _gather_pallas_call(_gather_approx_kernel, points, idx)


def _gather_approx_fwd(points, idx):
    shape_token = jnp.zeros((points.shape[1], 0), points.dtype)
    return _gather_pallas_call(_gather_approx_kernel, points, idx), (idx, shape_token)


def _gather_approx_bwd(res, g):
    idx, shape_token = res
    return _gather_bwd_pallas(idx, g, shape_token.shape[0]).astype(shape_token.dtype), None


gather_points_approx.defvjp(_gather_approx_fwd, _gather_approx_bwd)


# ---------------------------------------------------------------- backward (scatter-add)


def _scatter_add_kernel(idx_ref, g_ref, out_ref, *, n: int, r_tiles: int):
    # idx_ref: [1, 8, Rp], g_ref: [1, TR, C] (per-tile block), out_ref: [1, N, C]
    # (out block is revisited across the r grid dim and accumulated in place)
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0, :, :])

    idx = idx_ref[0, 0, pl.ds(r * _TR, _TR)]  # [TR]
    g = g_ref[0, :, :]  # [TR, C]
    col = jax.lax.broadcasted_iota(jnp.int32, (_TR, n), 1)
    onehot = (col == idx[:, None]).astype(jnp.float32)  # [TR, N]
    # dpts[n, c] += sum_r onehot[r, n] * g[r, c]; f32 accumulation (grad precision: the
    # operand rounding of the MXU applies to g, which is standard mixed-precision behavior)
    out_ref[0, :, :] += jax.lax.dot_general(
        onehot, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gather_bwd_pallas(idx: jnp.ndarray, g: jnp.ndarray, N: int) -> jnp.ndarray:
    """idx: [B, ...], cotangent g: [B, ..., C] -> dpoints [B, N, C] via scatter-add."""
    B = idx.shape[0]
    C = g.shape[-1]
    R = 1
    for d in idx.shape[1:]:
        R *= d
    flat_idx = idx.reshape(B, R).astype(jnp.int32)
    flat_g = g.reshape(B, R, C).astype(jnp.float32)
    r_pad = (-R) % _TR
    n_pad = (-N) % 128
    c_pad = (-C) % 128
    # padded rows scatter into index 0 with a zero cotangent (g padded with zeros) — harmless
    fidx = jnp.pad(flat_idx[:, None, :], ((0, 0), (0, 7), (0, r_pad)))
    fg = jnp.pad(flat_g, ((0, 0), (0, r_pad), (0, c_pad)))
    Np, Cp, Rp = N + n_pad, C + c_pad, R + r_pad
    out = pl.pallas_call(
        functools.partial(_scatter_add_kernel, n=Np, r_tiles=Rp // _TR),
        grid=(B, Rp // _TR),
        in_specs=[
            pl.BlockSpec((1, 8, Rp), lambda b, r: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TR, Cp), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Np, Cp), lambda b, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Cp), jnp.float32),
    )(fidx, fg)
    return out[:, :N, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Differentiable exact gather (forward: one-hot matmul; backward: scatter-add)."""
    return gather_points_pallas(points, idx)


def _gather_fwd(points, idx):
    # residuals must be JAX types: a zero-size array carries N and dtype statically
    shape_token = jnp.zeros((points.shape[1], 0), points.dtype)
    return gather_points_pallas(points, idx), (idx, shape_token)


def _gather_bwd(res, g):
    idx, shape_token = res
    return _gather_bwd_pallas(idx, g, shape_token.shape[0]).astype(shape_token.dtype), None


gather_points.defvjp(_gather_fwd, _gather_bwd)
