"""Chamfer / nearest-neighbor distance ops (TPU-first).

The single core primitive is ``nn_distance(x, y) -> (sqdist, idx)``: for every point in ``x``,
the squared L2 distance to (and index of) its nearest neighbor in ``y``. Everything chamfer-shaped
in the pipeline is built from it:

  * VQ-VAE reconstruction loss       (reference vq_vae.py:75-88, chamferdist bidirectional mean)
  * part-accuracy / shape-CD metrics (reference evaluator.py:84-148)
  * verifier edge features + interpenetration filter (reference auto_aggl.py:184-193,
    node_merge_utils.py:159-222)

On TPU the forward runs as a Pallas kernel (ops/chamfer_pallas.py) that tiles the [N, M] distance
matrix through VMEM with a running min/argmin — the TPU-native equivalent of the reference's
in-repo CUDA chamfer kernel (Jigsaw_matching/utils/chamfer/cuda/chamfer_kernel.cu:32-94). On CPU
(tests) it falls back to a chunked XLA implementation. The backward pass is plain XLA: gather for
the query side, scatter-add for the target side (equivalent of the CUDA atomicAdd backward,
chamfer_kernel.cu:175-209).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _nn_distance_xla(x: jnp.ndarray, y: jnp.ndarray, chunk: int = 256):
    """Chunked XLA nearest-neighbor. x: [B, N, 3], y: [B, M, 3] -> ([B, N], [B, N])."""
    B, N, _ = x.shape
    pad = (-N) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    n_chunks = x.shape[1] // chunk
    xc = x.reshape(B, n_chunks, chunk, 3).transpose(1, 0, 2, 3)  # [C, B, chunk, 3]
    y2 = jnp.sum(y * y, axis=-1)[:, None, :]  # [B, 1, M]

    def one_chunk(xb):
        # xb: [B, chunk, 3]
        d = (
            jnp.sum(xb * xb, axis=-1)[..., None]
            - 2.0 * jnp.einsum("bnc,bmc->bnm", xb, y)
            + y2
        )
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    dists, idxs = jax.lax.map(one_chunk, xc)  # [C, B, chunk]
    dists = dists.transpose(1, 0, 2).reshape(B, -1)[:, :N]
    idxs = idxs.transpose(1, 0, 2).reshape(B, -1)[:, :N]
    return dists, idxs


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def nn_distance(x: jnp.ndarray, y: jnp.ndarray):
    """Squared distance to the nearest neighbor of each x-point in y.

    x: [B, N, 3], y: [B, M, 3] -> (sqdist [B, N] float, idx [B, N] int32).
    """
    return _nn_distance_impl(x, y)


def _nn_distance_impl(x, y):
    if _use_pallas():
        from puzzlefusion_plusplus_tpu.ops.chamfer_pallas import nn_distance_pallas

        return nn_distance_pallas(x, y)
    return _nn_distance_xla(x, y)


def _nn_distance_fwd(x, y):
    d, idx = _nn_distance_impl(x, y)
    return (d, idx), (x, y, idx)


def _nn_distance_bwd(res, g):
    x, y, idx = res
    gd = g[0]  # [B, N]; no gradient flows through idx
    y_near = jnp.take_along_axis(y, idx[..., None], axis=1)  # [B, N, 3]
    diff = 2.0 * (x - y_near) * gd[..., None]
    dx = diff
    # scatter-add the opposite contribution into y
    dy = jnp.zeros_like(y)
    dy = jax.vmap(lambda acc, i, v: acc.at[i].add(-v))(dy, idx, diff)
    return dx, dy


nn_distance.defvjp(_nn_distance_fwd, _nn_distance_bwd)


def chamfer_distance_per_point(x: jnp.ndarray, y: jnp.ndarray):
    """Per-point squared NN distances both directions. -> (fwd [B, N], bwd [B, M])."""
    fwd, _ = nn_distance(x, y)
    bwd, _ = nn_distance(y, x)
    return fwd, bwd


def chamfer_distance_mean(
    x: jnp.ndarray, y: jnp.ndarray, bidirectional: bool = True
) -> jnp.ndarray:
    """Mean-reduced chamfer, matching chamferdist(point_reduction='mean').

    Returns [B]: mean_i min_j d2(x_i, y_j) (+ mean_j min_i d2(y_j, x_i) if bidirectional).
    """
    fwd, _ = nn_distance(x, y)
    out = fwd.mean(-1)
    if bidirectional:
        bwd, _ = nn_distance(y, x)
        out = out + bwd.mean(-1)
    return out


def chamfer_distance_default(x: jnp.ndarray, y: jnp.ndarray, bidirectional: bool = True):
    """Scalar chamfer with chamferdist's default reductions (point_reduction='sum',
    batch_reduction='mean') — the reduction used by the VQ-VAE training loss, which calls
    ChamferDistance()(recon, target, bidirectional=True) with defaults (reference vq_vae.py:84)."""
    fwd, _ = nn_distance(x, y)
    out = fwd.sum(-1)
    if bidirectional:
        bwd, _ = nn_distance(y, x)
        out = out + bwd.sum(-1)
    return out.mean()
