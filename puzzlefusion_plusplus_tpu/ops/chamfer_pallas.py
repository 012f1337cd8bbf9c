"""Pallas TPU kernel for batched nearest-neighbor (chamfer) distance.

TPU-native equivalent of the reference's CUDA chamfer kernel
(Jigsaw_matching/utils/chamfer/cuda/chamfer_kernel.cu:32-94: tiled shared-memory NN min-reduce)
and of the external ``chamferdist`` extension used on the main hot path.

Design:
  * Point clouds are passed transposed, ``[B, 3, N]``, so the coordinate dim sits in sublanes
    (3 -> padded to 8) instead of lanes (3 -> padded to 128): ~16x less VMEM per cloud.
  * Grid = (B, N-tiles). Each program owns one tile of query points and loops over target tiles,
    computing a [TN, TM] squared-distance block on the MXU via the expanded form
    ``|x|^2 + |y|^2 - 2 x.y`` and keeping a running (min, argmin) pair in registers.
  * Ties resolve to the lowest index (matches jnp.argmin / torch argmin).
  * Padding of N/M to tile multiples happens in the wrapper; padded target points are placed at
    1e6 so their distances (~3e12) never win; padded query rows are sliced off on return.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 256  # query-point tile
_TM = 512  # target-point tile
_BIG = 3.9e12  # larger than any padded-point distance (3 * (1e6)^2)


def _nn_kernel(x_ref, y_ref, dist_ref, idx_ref, *, m_tiles: int):
    # x_ref: [1, 8, TN] (coords padded 3->8), y_ref: [1, 8, M], outputs: [1, 1, N] (full row,
    # revisited across the N-tile grid dim; each program writes its TN slice)
    x = x_ref[0, :, :]  # [8, TN]
    x2 = jnp.sum(x * x, axis=0, keepdims=True)  # [1, TN] (pad rows are zero)

    def body(j, carry):
        run_min, run_idx = carry  # [TN, 1] f32, [TN, 1] i32
        y = y_ref[0, :, pl.ds(j * _TM, _TM)]  # [8, TM]
        y2 = jnp.sum(y * y, axis=0, keepdims=True)  # [1, TM]
        xy = jax.lax.dot_general(
            x,
            y,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TN, TM]
        d = x2.T + y2 - 2.0 * xy  # [TN, TM]
        tile_min = jnp.min(d, axis=1, keepdims=True)  # [TN, 1]
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        tile_idx = jnp.min(
            jnp.where(d <= tile_min, col, jnp.int32(2**30)), axis=1, keepdims=True
        ) + j * _TM
        better = tile_min < run_min
        return jnp.where(better, tile_min, run_min), jnp.where(better, tile_idx, run_idx)

    init = (
        jnp.full((_TN, 1), jnp.float32(_BIG), jnp.float32),
        jnp.zeros((_TN, 1), jnp.int32),
    )
    run_min, run_idx = jax.lax.fori_loop(0, m_tiles, body, init)
    i = pl.program_id(1)
    dist_ref[0, 0, pl.ds(i * _TN, _TN)] = run_min[:, 0]
    idx_ref[0, 0, pl.ds(i * _TN, _TN)] = run_idx[:, 0]


@functools.partial(jax.jit, static_argnames=())
def nn_distance_pallas(x: jnp.ndarray, y: jnp.ndarray):
    """x: [B, N, 3], y: [B, M, 3] -> (sqdist [B, N] f32, idx [B, N] i32)."""
    B, N, _ = x.shape
    M = y.shape[1]
    n_pad = (-N) % _TN
    m_pad = (-M) % _TM
    xt = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)  # [B, 3, N]
    yt = jnp.transpose(y, (0, 2, 1)).astype(jnp.float32)
    xt = jnp.pad(xt, ((0, 0), (0, 5), (0, n_pad)))  # coords 3 -> 8 sublanes
    yt = jnp.pad(yt, ((0, 0), (0, 5), (0, m_pad)), constant_values=0.0)
    if m_pad:
        # push padded target points far away (only their xyz rows; pad rows stay 0)
        far = jnp.zeros((B, 8, m_pad), jnp.float32).at[:, :3, :].set(1e6)
        yt = yt.at[:, :, M:].set(far)
    Np, Mp = xt.shape[2], yt.shape[2]
    m_tiles = Mp // _TM

    grid = (B, Np // _TN)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, m_tiles=m_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, _TN), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Mp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Np), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Np), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * Np * Mp + B * Np * Mp,
            bytes_accessed=B * (3 * Np + 3 * Mp + 2 * Np) * 4,
            transcendentals=0,
        ),
    )(xt, yt)
    return dist[:, 0, :N].astype(x.dtype), idx[:, 0, :N]


# ---------------------------------------------------------------- masked pairwise NN


def _masked_pair_nn_kernel(mask_ref, x_ref, y_ref, dist_ref, *, m_tiles: int):
    """One (part i, part j, query-tile) program: per-point NN distance of i's tile to j's
    cloud when mask[i, j] is set, else BIG. Skipped pairs skip all MXU/VPU compute — but
    NOT bandwidth: Mosaic still DMAs each program's input blocks (the [1,16,Mp] target
    slab included) into VMEM unconditionally, so for bandwidth-bound shapes the saving is
    smaller than active/P^2. This is how the engine's interpenetration test pays compute
    only for parts inside merging components (VERDICT r2 #6) while keeping every shape
    static; if the DMA cost ever matters at P=20, compact active pairs into a dense
    prefix and shrink the grid instead.

    No ``program_id`` anywhere: every ref's block is exactly this program's slice, so the
    kernel composes under vmap (batching PREPENDS a grid dim, which would shift
    program_id axes). The mask arrives as a [1, 1, 128] VMEM block (lane-broadcast value
    — Mosaic rejects (1, 1) SMEM blocks).

    Precision: the MXU rounds f32 matmul operands to bf16, which near the engine's 1e-3
    interpenetration threshold is real noise. Coordinates arrive hi/lo-split over sublanes
    (x rows [hi, lo, hi, lo], y rows [hi, hi, lo, lo], 3 rows each), so ONE dot sums all
    four partial products and recovers ~f32-accurate x.y at zero extra matmul cost (the
    3-deep contraction underfills the MXU either way). |x|^2 terms are exact VPU f32 from
    the recombined coordinates."""
    active = mask_ref[0, 0, 0] != 0

    @pl.when(active)
    def _active():
        x = x_ref[0, :, :]  # [16, TN] hi/lo-packed rows
        x_full = x[0:3, :] + x[3:6, :]  # exact f32 coordinates
        x2 = jnp.sum(x_full * x_full, axis=0, keepdims=True)

        def body(j, run_min):
            y = y_ref[0, :, pl.ds(j * _TM, _TM)]  # [16, TM]
            y_full = y[0:3, :] + y[6:9, :]
            y2 = jnp.sum(y_full * y_full, axis=0, keepdims=True)
            xy = jax.lax.dot_general(
                x, y, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # sums hi.hi + lo.hi + hi.lo + lo.lo
            d = x2.T + y2 - 2.0 * xy
            return jnp.minimum(run_min, jnp.min(d, axis=1, keepdims=True))

        run_min = jax.lax.fori_loop(
            0, m_tiles, body, jnp.full((_TN, 1), jnp.float32(_BIG), jnp.float32)
        )
        dist_ref[0, 0, :] = run_min[:, 0]

    @pl.when(~active)
    def _inactive():
        dist_ref[0, 0, :] = jnp.full((_TN,), jnp.float32(_BIG))


def masked_pairwise_nn(
    pts: jnp.ndarray, pair_mask: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """pts: [P, N, 3], pair_mask: [P, P] bool -> sqdist [P, P, N] f32 where
    out[i, j, n] = min_m |pts[i, n] - pts[j, m]|^2 for active pairs, BIG elsewhere.

    The compute of inactive (i, j) programs is skipped inside the kernel, so cost scales
    with the number of ACTIVE pairs while shapes stay static (the engine typically has 1-3
    active pairs out of P^2 on a merging iteration; node_merge_utils.py:159-222)."""
    P, N, _ = pts.shape
    n_pad = (-N) % _TN
    m_pad = (-N) % _TM
    xt = jnp.transpose(pts, (0, 2, 1)).astype(jnp.float32)  # [P, 3, N]
    hi = xt.astype(jnp.bfloat16).astype(jnp.float32)
    lo = xt - hi
    # hi/lo sublane packing (see kernel docstring): x rows [hi, lo, hi, lo], y rows
    # [hi, hi, lo, lo]; 12 used rows padded to 16 sublanes
    zpad = jnp.zeros((P, 4, xt.shape[2]), jnp.float32)
    xq = jnp.concatenate([hi, lo, hi, lo, zpad], axis=1)
    yt = jnp.concatenate([hi, hi, lo, lo, zpad], axis=1)
    xq = jnp.pad(xq, ((0, 0), (0, 0), (0, n_pad)))  # queries: zero-pad (rows sliced off)
    yt = jnp.pad(yt, ((0, 0), (0, 0), (0, m_pad)))
    if m_pad:
        # push padded target points far away (hi rows only; lo rows stay 0)
        far = jnp.zeros((P, 16, m_pad), jnp.float32).at[:, 0:3, :].set(1e6)
        far = far.at[:, 3:6, :].set(1e6)
        yt = yt.at[:, :, N:].set(far)
    Np, Mp = xq.shape[2], yt.shape[2]
    # mask flattened to [P*P, 1, 128] so its per-program block (1, 1, 128) satisfies the
    # Mosaic trailing-dims rule; outputs flattened to [P*P, 1, Np] for the same reason
    mask_lanes = jnp.broadcast_to(
        pair_mask.astype(jnp.int32).reshape(P * P, 1, 1), (P * P, 1, 128)
    )
    grid = (P, P, Np // _TN)
    dist = pl.pallas_call(
        functools.partial(_masked_pair_nn_kernel, m_tiles=Mp // _TM),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, j, t: (i * pair_mask.shape[0] + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, _TN), lambda i, j, t: (i, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, Mp), lambda i, j, t: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _TN), lambda i, j, t: (i * pair_mask.shape[0] + j, 0, t),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((P * P, 1, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=7 * P * P * Np * Mp,
            bytes_accessed=P * P * Np * 4 + P * 8 * (Np + Mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mask_lanes, xq, yt)
    return dist.reshape(P, P, Np)[:, :, :N]
