"""Fused PointNet++ set-abstraction stage (Pallas TPU kernel, frozen-eval path).

One kernel per SA stage computes, per cloud and per tile of centers:
  neighbor gather (exact byte-split one-hot matmul) -> recenter -> [3-layer Dense+BN+ReLU
  with BN folded into the weights] -> max over the K neighbors,
entirely VMEM-resident. The composable path (models/vqvae.py) materializes the grouped
[M, S, K, C] activations in HBM between every layer — at inference shapes that HBM traffic,
not FLOPs, dominates the encoder. This kernel exists for the frozen encoder inside the
diffusion sampler (the single hottest computation of the pipeline); training keeps the
composable path (BatchNorm batch statistics + autodiff).

Numerics: gather is bit-exact (byte planes); the MLP matmuls round operands to bf16 exactly
like the XLA path's MXU matmuls, so outputs match the composable eval path to float tolerance.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _centers_per_tile(k: int) -> int:
    """Centers per tile such that the gathered row count ST*K is a 128 multiple (Mosaic
    requires 128-aligned lane offsets for the per-tile index slices)."""
    assert 128 % k == 0 or k % 128 == 0, f"K={k} must divide/be divisible by 128"
    return max(8, 256 // k)  # >= 8 so output blocks meet the (8, 128) tile constraint


def fold_batchnorm(kernel, bias, scale, bn_bias, mean, var, eps=1e-5):
    """Dense(W, b) followed by eval-mode BatchNorm -> folded (W', b')."""
    s = scale / jnp.sqrt(jnp.asarray(var) + eps)
    return kernel * s[None, :], (bias - mean) * s + bn_bias


def _exact_gather(onehot, payload_planes):
    """onehot [R, N] f32 x 4 byte planes [N, C] -> exact f32 gather [R, C]."""
    def mm(p):
        return jax.lax.dot_general(
            onehot, p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    g0, g1, g2, g3 = (mm(p) for p in payload_planes)
    lo = (g0 + g1 * 256.0).astype(jnp.int32)
    hi = (g2 + g3 * 256.0).astype(jnp.int32)
    return pltpu.bitcast(lo | (hi << 16), jnp.float32)


def _byte_planes(x_i32):
    return (
        (x_i32 & 0xFF).astype(jnp.float32),
        ((x_i32 >> 8) & 0xFF).astype(jnp.float32),
        ((x_i32 >> 16) & 0xFF).astype(jnp.float32),
        ((x_i32 >> 24) & 0xFF).astype(jnp.float32),
    )


def _sa_kernel(
    gidx_ref,  # [1, 8, Tiles*rows] i32 (row 0 = group indices, per-tile 128-aligned)
    fidx_ref,  # [1, 8, Tiles*128] i32 (row 0 = per-tile center indices, 128-lane segments)
    pts_ref,  # [1, N, Cin_p] f32  (xyz ++ feats, padded)
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,  # folded Dense+BN weights
    out_ref,  # [1, ST, Cout_p]
    *, n: int, k: int, cin: int, st: int,
):
    s_tile = pl.program_id(1)
    rows = st * k  # multiple of 128 by construction
    gidx = gidx_ref[0, 0, pl.ds(s_tile * rows, rows)]  # [rows]
    fseg = fidx_ref[0, 0, pl.ds(s_tile * 128, 128)]  # [128], first st entries real
    pts = pts_ref[0, :, :]  # [N, Cin_p]
    planes = _byte_planes(pltpu.bitcast(pts, jnp.int32))

    col = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    onehot_g = (col == gidx[:, None]).astype(jnp.float32)
    grouped = _exact_gather(onehot_g, planes)  # [rows, Cin_p]

    # per-row center index: fseg[row // k] — build by comparing segment position
    seg_pos = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    row_center = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) // k
    fidx_rows = jnp.sum(
        jnp.where(seg_pos == row_center, fseg[None, :], 0), axis=1
    )  # [rows] center point index per gathered row
    onehot_c = (col == fidx_rows[:, None]).astype(jnp.float32)
    center_rows = _exact_gather(onehot_c, planes)  # [rows, Cin_p]

    # recenter the xyz channels (first 3) on each row's center
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, grouped.shape[1]), 1)
    h = jnp.where(ch < 3, grouped - center_rows, grouped)
    # zero the padded input channels (beyond cin) so folded weights see exact zeros
    h = jnp.where(ch < cin, h, 0.0)

    def dense_relu(h, w_ref, b_ref):
        y = jax.lax.dot_general(
            h, w_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(y + b_ref[0, :], 0.0)

    h = dense_relu(h, w1_ref, b1_ref)
    h = dense_relu(h, w2_ref, b2_ref)
    h = dense_relu(h, w3_ref, b3_ref)  # [rows, Cout_p]

    out_ref[0, :, :] = h.reshape(st, k, -1).max(axis=1)


def sa_stage_fused(
    pts_cat: jnp.ndarray,  # [M, N, Cin] xyz(3) ++ feats, f32
    fps_idx: jnp.ndarray,  # [M, S] i32
    group_idx: jnp.ndarray,  # [M, S, K] i32
    weights: Sequence[tuple],  # 3 x (folded kernel [Cin_i, Cout_i], folded bias [Cout_i])
) -> jnp.ndarray:
    """-> (new_feats [M, S, C3]). new_xyz is pts_cat[:, :, :3] gathered by fps_idx (caller)."""
    M, N, Cin = pts_cat.shape
    S, K = group_idx.shape[1], group_idx.shape[2]
    (w1, b1), (w2, b2), (w3, b3) = weights
    C3 = w3.shape[1]
    _ST = _centers_per_tile(K)

    n_pad = (-N) % 128
    cin_pad = (-Cin) % 128
    s_pad = (-S) % _ST
    Sp = S + s_pad
    n_tiles = Sp // _ST

    pts_p = jnp.pad(pts_cat.astype(jnp.float32), ((0, 0), (0, n_pad), (0, cin_pad)))
    gidx = jnp.pad(group_idx.reshape(M, S * K), ((0, 0), (0, s_pad * K)))
    gidx = jnp.pad(gidx[:, None, :], ((0, 0), (0, 7), (0, 0)))  # 8-sublane carrier
    # per-tile center indices packed into 128-lane segments (Mosaic-aligned slicing)
    fidx = jnp.pad(fps_idx, ((0, 0), (0, s_pad))).reshape(M, n_tiles, _ST)
    fidx = jnp.pad(fidx, ((0, 0), (0, 0), (0, 128 - _ST))).reshape(M, n_tiles * 128)
    fidx = jnp.pad(fidx[:, None, :], ((0, 0), (0, 7), (0, 0)))

    # pad layer-1 input dim to the padded Cin (zeros: padded channels are zeroed in-kernel)
    w1p = jnp.pad(jnp.asarray(w1, jnp.float32), ((0, cin_pad), (0, (-w1.shape[1]) % 128)))
    b1p = jnp.pad(jnp.asarray(b1, jnp.float32), (0, (-b1.shape[0]) % 128))[None, :]
    w2p = jnp.pad(jnp.asarray(w2, jnp.float32),
                  ((0, (-w2.shape[0]) % 128), (0, (-w2.shape[1]) % 128)))
    b2p = jnp.pad(jnp.asarray(b2, jnp.float32), (0, (-b2.shape[0]) % 128))[None, :]
    w3p = jnp.pad(jnp.asarray(w3, jnp.float32),
                  ((0, (-w3.shape[0]) % 128), (0, (-w3.shape[1]) % 128)))
    b3p = jnp.pad(jnp.asarray(b3, jnp.float32), (0, (-b3.shape[0]) % 128))[None, :]

    Np, Cin_p = N + n_pad, Cin + cin_pad
    out = pl.pallas_call(
        functools.partial(_sa_kernel, n=Np, k=K, cin=Cin, st=_ST),
        grid=(M, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, Sp * K), lambda m, s: (m, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, n_tiles * 128), lambda m, s: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np, Cin_p), lambda m, s: (m, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b3p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ST, w3p.shape[1]), lambda m, s: (m, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Sp, w3p.shape[1]), jnp.float32),
    )(gidx, fidx, pts_p, w1p, b1p, w2p, b2p, w3p, b3p)
    return out[:, :S, :C3]
