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

import os

_ROW_BUDGET = int(os.environ.get("PFPP_SA_TILE_ROWS", "2048"))


def _centers_per_tile(k: int) -> int:
    """Centers per tile such that the gathered row count ST*K is a 128 multiple (Mosaic
    requires 128-aligned lane offsets for the per-tile index slices). The row budget
    trades grid-invocation overhead against VMEM block size (PFPP_SA_TILE_ROWS);
    measured on v5e (b8 encoder scan, ms/step): 256->7.86, 512->6.92, 1024->6.01,
    2048->5.58, 4096->6.31 — outputs bitwise identical across budgets."""
    assert 128 % k == 0 or k % 128 == 0, f"K={k} must divide/be divisible by 128"
    # constraints (independent of the env budget): ST*K % 128 == 0 (dynamic lane-slice
    # offsets at s_tile*ST*K must be provable 128-multiples), 8 <= ST <= 128 (the per-tile
    # center indices are packed into 128-lane fidx segments)
    m = max(128 // k, 1)  # ST granularity making ST*K a 128-multiple
    st = max(max(8, m), (_ROW_BUDGET // k) // m * m)
    return min(st, 128)


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


# ---------------------------------------------------------------------------
# Round-2 variant: fused SA stage over CACHED grouped geometry (no xyz gathers).
#
# The diffusion sampler caches the grouped relative coordinates once per engine
# iteration (inference/sampler.py FeatureCache) and folds the per-step rotation into
# the first Dense (models/vqvae.py): conv0(g R^T) == g (R^T K_xyz). What remains per
# step and per stage is
#     h1 = g_rel @ W_eff[m] + gather(feats)[.] @ K_feat + b1 ; relu
#     h2 = relu(h1 @ W2 + b2) ; h3 = relu(h2 @ W3 + b3) ; max over K
# This kernel runs that chain VMEM-resident per (cloud, center-tile):
#   * no xyz gather at all (g_rel is an input, [rows, 3] tiles);
#   * the feature gather is fused with conv0: gather(f) @ K_feat == onehot @ (f @ K_feat),
#     and `proj = f @ K_feat` is computed ONCE per cloud outside the kernel — one
#     one-hot matmul replaces gather-then-dense (2/3 of the gather+conv1 FLOPs);
#   * conv2/conv3 intermediates never touch HBM (the composable path round-trips
#     [M, S, K, C] activations between every layer).
# BatchNorm is eval-mode folded (fold_batchnorm); numerics match the composable eval
# path to MXU-bf16 tolerance (the one-hot matmul rounds `proj` exactly like the Dense
# matmul the composable path feeds its gathered features into).
# ---------------------------------------------------------------------------


def _sa_cached_kernel(
    gidx_ref,  # [1, 8, Sp*K] i32 (row 0 = group indices, per-tile 128-aligned slices)
    g_ref,  # [1, rows, 3] f32 grouped relative xyz for THIS tile (unrotated)
    weff_ref,  # [1, 3, C1] f32 per-cloud rotation-folded xyz weights
    proj_ref,  # [1, N2, C1] f32 per-cloud pre-projected features (or [1, 8, C1] dummy);
    # int8 quantized codes for gather_impl='int8'
    scale_ref,  # [1, 1, C1] f32 per-cloud per-column dequant scales (ones unless 'int8')
    b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    out_ref,  # [1, ST, C3]
    *, n2: int, k: int, st: int, has_feats: bool, gather_impl: str = "onehot",
):
    s_tile = pl.program_id(1)
    rows = st * k
    g = g_ref[0, :, :]  # [rows, 3]
    h = jax.lax.dot_general(
        g, weff_ref[0, :, :], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [rows, C1]
    if has_feats:
        gidx = gidx_ref[0, 0, pl.ds(s_tile * rows, rows)]  # [rows]
        if gather_impl == "int8":
            # int8 x int8 one-hot gather on the MXU's double-rate int8 path (v5e: 394
            # TOPS int8 vs 197 TFLOP/s bf16) — the 'cheaper one-hot operands' half of the
            # named 18% follow-up (VALIDATION.md roofline; the VPU 'dynamic' half was the
            # r4 negative result). `proj` arrives pre-quantized per cloud and column
            # (q = round(proj/s), s = colmax|proj|/127); a one-hot row selects exactly one
            # code, so the int32 accumulator holds q[gidx] exactly and dequantizes by one
            # VPU multiply. Accuracy cost is 8-bit quantization of the SA2/SA3 feature
            # projections only (engine-metric impact measured in the bench A/B).
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, n2), 1)
            onehot8 = (col == gidx[:, None]).astype(jnp.int8)
            q = jax.lax.dot_general(
                onehot8, proj_ref[0, :, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [rows, C1] exact int8 codes
            h = h + q.astype(jnp.float32) * scale_ref[0, 0, :]
        elif gather_impl == "dynamic":
            # VPU dynamic gather (Mosaic DynamicGatherOp), chunked because Mosaic needs
            # output rows == table rows: rows % n2 == 0 guaranteed by the dispatcher.
            # Moves the 18%-of-engine-FLOPs gather matmuls (VALIDATION.md roofline) off
            # the MXU; exact (no bf16 operand rounding), unlike the onehot matmul.
            tab = proj_ref[0, :, :]  # [n2, C1]
            c1 = tab.shape[1]
            parts = []
            for j in range(rows // n2):
                ids = gidx[j * n2 : (j + 1) * n2]  # static 128-multiple offsets
                ix = jnp.broadcast_to(ids[:, None], (n2, c1))
                parts.append(jnp.take_along_axis(tab, ix, axis=0))
            h = h + jnp.concatenate(parts, axis=0)
        else:
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, n2), 1)
            onehot = (col == gidx[:, None]).astype(jnp.float32)
            h = h + jax.lax.dot_general(
                onehot, proj_ref[0, :, :], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h = jnp.maximum(h + b1_ref[0, :], 0.0)
    h = jnp.maximum(
        jax.lax.dot_general(h, w2_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b2_ref[0, :], 0.0)
    h = jnp.maximum(
        jax.lax.dot_general(h, w3_ref[:, :], dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b3_ref[0, :], 0.0)
    out_ref[0, :, :] = h.reshape(st, k, -1).max(axis=1)


def sa_stage_fused_cached(
    g_rel: jnp.ndarray,  # [M, S, K, 3] cached grouped relative xyz (unrotated)
    w_eff: jnp.ndarray,  # [M, 3, C1] rotation+BN-folded conv0 xyz weights
    feats: jnp.ndarray | None,  # [M, N2, D] previous-stage features (None for stage 1)
    group_idx: jnp.ndarray | None,  # [M, S, K] i32 (None for stage 1)
    k1_feat: jnp.ndarray | None,  # [D, C1] BN-folded conv0 feature weights
    b1: jnp.ndarray,  # [C1] folded bias
    w2: jnp.ndarray, b2: jnp.ndarray,  # folded conv1
    w3: jnp.ndarray, b3: jnp.ndarray,  # folded conv2
    interpret: bool = False,  # Pallas interpret mode (CPU tests; kernel has no TPU intrinsics)
    gather_impl: str | None = None,  # 'onehot' (MXU f32 matmul) | 'int8' (MXU int8
    # matmul on per-cloud-quantized projections, 2x rate) | 'dynamic' (VPU gather);
    # None -> PFPP_SA_GATHER env, default 'onehot'
) -> jnp.ndarray:
    """-> new_feats [M, S, C3] (max over K of the 3-layer folded MLP)."""
    M, S, K, _ = g_rel.shape
    C1 = w_eff.shape[2]
    C3 = w3.shape[1]
    has_feats = feats is not None
    _ST = _centers_per_tile(K)
    s_pad = (-S) % _ST
    Sp = S + s_pad
    n_tiles = Sp // _ST
    rows = _ST * K
    if gather_impl is None:
        gather_impl = os.environ.get("PFPP_SA_GATHER", "onehot")

    g_flat = jnp.pad(
        g_rel.reshape(M, S * K, 3).astype(jnp.float32),
        ((0, 0), (0, s_pad * K), (0, 0)),
    )
    if has_feats:
        N2, D = feats.shape[1], feats.shape[2]
        proj = jnp.einsum("mnd,dc->mnc", feats.astype(jnp.float32),
                          k1_feat.astype(jnp.float32))  # [M, N2, C1]
        n2p = (-N2) % 128
        proj = jnp.pad(proj, ((0, 0), (0, n2p), (0, 0)))
        N2p = N2 + n2p
        gidx = jnp.pad(group_idx.reshape(M, S * K), ((0, 0), (0, s_pad * K)))
        gidx = jnp.pad(gidx[:, None, :], ((0, 0), (0, 7), (0, 0)))  # 8-sublane carrier
    else:
        N2p = 8
        proj = jnp.zeros((M, 8, C1), jnp.float32)
        gidx = jnp.zeros((M, 8, max(Sp * K, 128)), jnp.int32)
    if gather_impl == "dynamic" and (not has_feats or rows % N2p != 0):
        gather_impl = "onehot"  # chunked VPU gather needs rows to tile by the table height
    scale = jnp.ones((M, 1, C1), jnp.float32)
    if gather_impl == "int8" and has_feats:
        # per-cloud per-column symmetric quantization of the pre-projected features; the
        # quantize pass is O(N2*C1) VPU work vs the O(rows*N2*C1) gather matmul it halves
        s = jnp.max(jnp.abs(proj), axis=1, keepdims=True) / 127.0  # [M, 1, C1]
        scale = jnp.maximum(s, 1e-30)
        proj = jnp.clip(jnp.round(proj / scale), -127, 127).astype(jnp.int8)
    elif gather_impl == "int8":
        gather_impl = "onehot"  # stage 1 has no feature gather; nothing to quantize

    b1p = jnp.asarray(b1, jnp.float32)[None, :]
    w2p = jnp.asarray(w2, jnp.float32)
    b2p = jnp.asarray(b2, jnp.float32)[None, :]
    w3p = jnp.asarray(w3, jnp.float32)
    b3p = jnp.asarray(b3, jnp.float32)[None, :]

    out = pl.pallas_call(
        functools.partial(
            _sa_cached_kernel, n2=N2p, k=K, st=_ST, has_feats=has_feats,
            gather_impl=gather_impl,
        ),
        grid=(M, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, gidx.shape[2]), lambda m, s: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 3), lambda m, s: (m, s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, C1), lambda m, s: (m, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N2p, C1), lambda m, s: (m, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C1), lambda m, s: (m, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b3p.shape, lambda m, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ST, C3), lambda m, s: (m, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Sp, C3), jnp.float32),
        interpret=interpret,
    )(gidx, g_flat, w_eff, proj, scale, b1p, w2p, b2p, w3p, b3p)
    return out[:, :S, :]
