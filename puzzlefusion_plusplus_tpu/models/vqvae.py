"""VQ-VAE fragment autoencoder (flax.linen), TPU-first fixed-shape design.

Capability parity with the reference VQ-VAE stack:
  * ``PointNetSetAbstraction`` — one SSG set-abstraction stage (utils/pn2_utils.py:175-216):
    FPS -> ball query -> recentered grouping -> shared MLP (1x1 conv == Dense) + BatchNorm +
    ReLU -> max over the neighborhood. Here grouping is dense/static-shape and the MLP runs as
    [B, S, K, C] matmuls on the MXU.
  * ``PN2`` — 3-stage encoder to 25 tokens x 64 dims + 3-layer FC decoder emitting 25x40x3 point
    offsets (vqvae/model/modules/pn2.py:8-97).
  * ``VectorQuantizer`` — 1024x16 codebook, expanded-L2 nearest code, straight-through estimator,
    commitment beta, perplexity (vqvae/model/modules/quantizer.py:26-71).
  * ``VQVAE`` — encode: z_e [B,25,64] viewed as [B,100,16] for quantization; decode: offsets
    around the 25 SA3 centroids (vqvae/model/modules/vq_vae.py:23-88).

Input layout is [B, N, 3] throughout (no torch-style channel-first permutes).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.ops.fps import farthest_point_sample


def sa_stage_indices(
    xyz: jnp.ndarray, npoint: int, radius: float, nsample: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(fps_idx [B, S], group_idx [B, S, K]) for one set-abstraction stage.

    FPS and ball query depend only on pairwise distances, so these indices are invariant
    under rigid rotation of ``xyz`` — the key cache opportunity for the diffusion sampler,
    which re-encodes re-rotated copies of the same clouds every step (denoiser.py:55-77)."""
    from puzzlefusion_plusplus_tpu.ops.grouping import index_points, query_ball_point

    fps_idx = farthest_point_sample(xyz, npoint)
    new_xyz = index_points(xyz, fps_idx)
    group_idx = query_ball_point(radius, nsample, xyz, new_xyz)
    return fps_idx, group_idx


def pn2_grouping_indices(
    xyz: jnp.ndarray,
    num_point: int = 25,
    sa_npoints: Sequence[int] = (256, 128),
    sa_nsamples: Sequence[int] = (32, 64, 64),
) -> tuple:
    """All three stages' sampling/grouping indices for a cloud (rotation-invariant)."""
    from puzzlefusion_plusplus_tpu.ops.grouping import index_points

    idx1 = sa_stage_indices(xyz, sa_npoints[0], 0.2, sa_nsamples[0])
    l1 = index_points(xyz, idx1[0])
    idx2 = sa_stage_indices(l1, sa_npoints[1], 0.4, sa_nsamples[1])
    l2 = index_points(l1, idx2[0])
    idx3 = sa_stage_indices(l2, num_point, 0.8, sa_nsamples[2])
    return (idx1, idx2, idx3)


def pn2_grouping_geometry(
    xyz: jnp.ndarray,
    num_point: int = 25,
    sa_npoints: Sequence[int] = (256, 128),
    sa_nsamples: Sequence[int] = (32, 64, 64),
) -> tuple[tuple, tuple]:
    """Stage indices PLUS per-stage (new_xyz, grouped relative coords) on this cloud.

    Rotation commutes with gathering and recentering: for a rigid rotation R,
    gather(R x)[idx] - center(R x) == R (gather(x)[idx] - center(x)). So the diffusion
    sampler can cache these geometry tensors ONCE per iteration on the unrotated clouds and
    rotate them per denoise step — removing the N=1000-point one-hot gather matmuls (the
    encoder's dominant per-step cost) from the 20-step loop entirely.

    Returns (idx_stages, geom_stages): geom_stages[s] = (new_xyz [B, S, 3],
    grouped_rel [B, S, K, 3]) in this cloud's (unrotated) frame."""
    from puzzlefusion_plusplus_tpu.ops.grouping import index_points

    idx1 = sa_stage_indices(xyz, sa_npoints[0], 0.2, sa_nsamples[0])
    n1 = index_points(xyz, idx1[0])
    g1 = index_points(xyz, idx1[1]) - n1[:, :, None, :]
    idx2 = sa_stage_indices(n1, sa_npoints[1], 0.4, sa_nsamples[1])
    n2 = index_points(n1, idx2[0])
    g2 = index_points(n1, idx2[1]) - n2[:, :, None, :]
    idx3 = sa_stage_indices(n2, num_point, 0.8, sa_nsamples[2])
    n3 = index_points(n2, idx3[0])
    g3 = index_points(n2, idx3[1]) - n3[:, :, None, :]
    return (idx1, idx2, idx3), ((n1, g1), (n2, g2), (n3, g3))


class MaskedBatchNorm(nn.Module):
    """``nn.BatchNorm`` with optional per-sample weights for the batch statistics.

    The compacted slot layout (utils/masking.py) fills invalid slots with cyclic repeats of
    valid parts; the reference's BatchNorm sees only the boolean-flattened VALID parts
    (vqvae/model/fracture_ae.py:16-29). Zero-weighting the repeats reproduces that
    semantics exactly and makes train-mode statistics independent of the bucket pad
    (data/bucketing.py). Param/stat layout matches ``nn.BatchNorm`` (params: scale/bias,
    batch_stats: mean/var, f32) for checkpoint and converter compatibility; ``weights=None``
    is numerically identical to ``nn.BatchNorm``.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: object = None

    @nn.compact
    def __call__(self, x, weights: jnp.ndarray | None = None):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if weights is None:
                mean = xf.mean(red)
                var = jnp.square(xf - mean).mean(red)
            else:
                w = weights.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 1))
                elems = 1
                for s in x.shape[1:-1]:
                    elems *= s
                denom = jnp.maximum(w.sum() * elems, 1e-6)
                mean = (xf * w).sum(red) / denom
                var = (jnp.square(xf - mean) * w).sum(red) / denom
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class PointNetSetAbstraction(nn.Module):
    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    dtype: object = None  # compute dtype (bf16 for mixed precision); params stay fp32

    @nn.compact
    def __call__(self, xyz, points, train: bool = False, idx=None, geom=None, rot=None,
                 bn_mask=None):
        """xyz: [B, N, 3], points: [B, N, D] or None -> (new_xyz [B, S, 3], feats [B, S, C]).

        ``idx``: optional precomputed (fps_idx, group_idx) from ``sa_stage_indices`` —
        skips the FPS/ball-query recomputation (identical results for rotated inputs).
        ``geom``: optional (new_xyz, grouped_rel) from ``pn2_grouping_geometry`` — skips the
        xyz gathers entirely; ``xyz`` is then only consulted for feature gathers via ``idx``.
        ``rot``: optional per-cloud rotation matrices [B, 3, 3]. When given with ``geom``,
        the cached geometry is treated as UNROTATED and the rotation is FOLDED INTO the
        first Dense: conv0(g @ R^T) == g @ (R^T K_xyz), so the per-step elementwise qrot of
        the grouped [B, S, K, 3] tensors (lane-hostile trailing-3 layout, measured 1.7 ms
        per denoise step at engine batch 8) disappears — only the [B, 3, C] effective
        weights and the [B, S, 3] stage centers are rotated.
        """
        from puzzlefusion_plusplus_tpu.ops.grouping import (
            index_points,
            index_points_matmul_safe,
        )

        if idx is None:
            idx = sa_stage_indices(xyz, self.npoint, self.radius, self.nsample)
        fps_idx, group_idx = idx
        if geom is not None:
            new_xyz, grouped_xyz = geom
            if rot is not None:
                new_xyz = jnp.einsum("bsd,bed->bse", new_xyz, rot)
        else:
            new_xyz = index_points(xyz, fps_idx)
            grouped_xyz = index_points(xyz, group_idx) - new_xyz[:, :, None, :]

        conv0 = nn.Dense(self.mlp[0], name="conv0", dtype=self.dtype)
        if geom is not None and rot is not None:
            # rotation-folded first layer. conv0 is linear, so its xyz block K_xyz and bias
            # are recovered through the module itself (no param-tree surgery):
            #   conv0(cat(R^T_rows, 0_feat)) - conv0(0) == R^T K_xyz
            D = 0 if points is None else points.shape[-1]
            B = grouped_xyz.shape[0]
            rt_rows = jnp.concatenate(
                [jnp.swapaxes(rot, 1, 2), jnp.zeros((B, 3, D), rot.dtype)], axis=-1
            )  # [B, 3, 3+D]
            bias = conv0(jnp.zeros((1, 3 + D), rot.dtype))  # [1, C] == conv0 bias
            w_eff = conv0(rt_rows) - bias[None]  # [B, 3, C] == R^T K_xyz
            h = jnp.einsum("bskd,bdc->bskc", grouped_xyz, w_eff)
            if points is not None:
                feat_g = index_points_matmul_safe(points, group_idx)  # [B, S, K, D]
                zeros_xyz = jnp.zeros(feat_g.shape[:-1] + (3,), feat_g.dtype)
                h = h + conv0(jnp.concatenate([zeros_xyz, feat_g], axis=-1))
            else:
                h = h + bias.reshape((1,) * (h.ndim - 1) + (-1,))
        else:
            if points is not None:
                # feature channels go into the first Dense -> matmul-safe approx gather
                grouped = jnp.concatenate(
                    [grouped_xyz, index_points_matmul_safe(points, group_idx)], axis=-1
                )
            else:
                grouped = grouped_xyz
            h = conv0(grouped)
        h = MaskedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn0",
            dtype=self.dtype,
        )(h, bn_mask)
        h = nn.relu(h)
        for i, ch in enumerate(self.mlp[1:], start=1):
            h = nn.Dense(ch, name=f"conv{i}", dtype=self.dtype)(h)
            h = MaskedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, name=f"bn{i}",
                dtype=self.dtype,
            )(h, bn_mask)
            h = nn.relu(h)
        feats = h.max(axis=2)  # max over neighborhood K
        return new_xyz, feats


class PN2(nn.Module):
    """PointNet++ SSG encoder + FC offset decoder (reference pn2.py)."""

    num_point: int = 25  # latent tokens
    num_dim: int = 64  # latent channel
    local_decode_pts: int = 40
    sa_npoints: Sequence[int] = (256, 128)  # SA1/SA2 centroids (SA3 uses num_point)
    sa_nsamples: Sequence[int] = (32, 64, 64)  # neighborhood sizes per stage
    dtype: object = None  # compute dtype (bf16 for mixed precision); params stay fp32
    # remat is for TRAINING (halves activation memory); the frozen inference encoder
    # disables it — a remat_call in a forward-only scan is a fusion barrier for XLA
    remat: bool = True

    def setup(self):
        # remat each SA stage: the grouped [M, S, K, C] activations are the largest tensors
        # in the program (7 GB at the reference's global batch for SA2's conv2 alone) —
        # saving them for backward OOMs HBM at reference batch sizes, recomputing them is
        # nearly free (jax.checkpoint == the brief's remat-for-memory tradeoff)
        SA = (
            nn.remat(PointNetSetAbstraction, static_argnums=(3,))
            if self.remat
            else PointNetSetAbstraction
        )
        self.sa1 = SA(self.sa_npoints[0], 0.2, self.sa_nsamples[0],
                      (64, 64, 128), self.dtype)
        self.sa2 = SA(self.sa_npoints[1], 0.4, self.sa_nsamples[1],
                      (128, 128, 256), self.dtype)
        self.sa3 = SA(self.num_point, 0.8, self.sa_nsamples[2],
                      (256, 256, 512), self.dtype)
        self.conv6 = nn.Dense(self.num_dim, dtype=self.dtype)
        self.fc1 = nn.Dense(256, dtype=self.dtype)
        self.fc2 = nn.Dense(512, dtype=self.dtype)
        self.fc3 = nn.Dense(self.local_decode_pts * 3)  # offsets head stays fp32

    def grouping_indices(self, xyz):
        """Rotation-invariant sampling/grouping indices for ``encode``'s three stages."""
        return pn2_grouping_indices(xyz, self.num_point, self.sa_npoints, self.sa_nsamples)

    def encode(self, xyz, train: bool = False, cached_idx=None, cached_geom=None,
               rot=None, bn_mask=None):
        """xyz: [B, N, 3] -> (z_e [B, L, num_dim], token centers [B, L, 3]).

        ``bn_mask``: optional [B] {0,1} slot weights for train-mode BatchNorm statistics
        (MaskedBatchNorm — excludes compaction repeats, keeps stats bucket-pad-invariant).

        ``cached_idx``: optional output of ``grouping_indices`` (computed on any rigid
        rotation of ``xyz``) — removes all FPS/ball-query work from the forward.
        ``cached_geom``: optional per-stage (new_xyz, grouped_rel) from
        ``pn2_grouping_geometry`` — also removes the xyz gathers, the encoder's dominant
        cost inside the diffusion loop; ``xyz`` is then ignored. Either already in this
        call's frame, or UNROTATED with ``rot`` [B, 3, 3] supplied: the rotation is then
        folded into each stage's first Dense (see PointNetSetAbstraction)."""
        i1, i2, i3 = cached_idx if cached_idx is not None else (None, None, None)
        g1, g2, g3 = cached_geom if cached_geom is not None else (None, None, None)
        l1_xyz, l1_points = self.sa1(xyz, None, train, i1, g1, rot, bn_mask)
        l2_xyz, l2_points = self.sa2(l1_xyz, l1_points, train, i2, g2, rot, bn_mask)
        l3_xyz, l3_points = self.sa3(l2_xyz, l2_points, train, i3, g3, rot, bn_mask)
        return self.conv6(l3_points), l3_xyz

    def decode(self, global_feat):
        """[B, L, C] -> per-token point offsets [B, L, local_decode_pts, 3]."""
        B = global_feat.shape[0]
        x = nn.relu(self.fc1(global_feat))
        x = nn.relu(self.fc2(x))
        return self.fc3(x).reshape(B, self.num_point, self.local_decode_pts, 3)

    def __call__(self, xyz, train: bool = False):
        z_e, l3_xyz = self.encode(xyz, train)
        return self.decode(z_e), z_e, l3_xyz


class VectorQuantizer(nn.Module):
    n_e: int = 1024
    e_dim: int = 16
    beta: float = 0.25

    @nn.compact
    def __call__(self, z, mask: jnp.ndarray | None = None):
        """z: [B, T, e_dim] -> (embedding_loss, z_q (STE), perplexity, code indices [B, T]).

        ``mask``: optional [B] {0,1} — losses/perplexity averaged over masked samples only
        (fixed-shape replacement for the reference's valid-part-only flattening).
        """
        codebook = self.param(
            "embedding",
            lambda key: jax.random.uniform(
                key, (self.n_e, self.e_dim), minval=-1.0 / self.n_e, maxval=1.0 / self.n_e
            ),
        )
        flat = z.reshape(-1, self.e_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=1)
            - 2.0 * flat @ codebook.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(codebook, idx, axis=0).reshape(z.shape)

        sq_to_code = (jax.lax.stop_gradient(z_q) - z) ** 2
        sq_to_z = (z_q - jax.lax.stop_gradient(z)) ** 2
        if mask is None:
            loss = jnp.mean(sq_to_code) + self.beta * jnp.mean(sq_to_z)
        else:
            w = mask.astype(z.dtype).reshape(-1, 1, 1)
            denom = jnp.maximum(w.sum() * z.shape[1] * z.shape[2], 1.0)
            loss = (sq_to_code * w).sum() / denom + self.beta * (sq_to_z * w).sum() / denom
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through

        onehot = jax.nn.one_hot(idx.reshape(z.shape[:-1]), self.n_e)  # [B, T, n_e]
        if mask is None:
            e_mean = jnp.mean(onehot.reshape(-1, self.n_e), axis=0)
        else:
            w = mask.astype(z.dtype).reshape(-1, 1, 1)
            e_mean = (onehot * w).sum((0, 1)) / jnp.maximum((w * jnp.ones_like(onehot)).sum((0, 1)), 1.0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        return loss, z_q, perplexity, idx.reshape(z.shape[:-1])


class VQVAE(nn.Module):
    """Full autoencoder; also the frozen feature extractor used by the denoiser
    (denoiser/model/modules/encoder.py — same encode path, decoder simply unused)."""

    n_embeddings: int = 1024
    embedding_dim: int = 16
    num_point: int = 25
    num_dim: int = 64
    local_decode_pts: int = 40
    beta: float = 0.25
    sa_npoints: Sequence[int] = (256, 128)
    sa_nsamples: Sequence[int] = (32, 64, 64)
    dtype: object = None  # compute dtype for the PN2 stages; quantization stays fp32
    remat: bool = True  # disable for frozen inference use (see PN2.remat)

    def setup(self):
        self.pn2 = PN2(self.num_point, self.num_dim, self.local_decode_pts,
                       self.sa_npoints, self.sa_nsamples, self.dtype, self.remat)
        self.vector_quantization = VectorQuantizer(
            self.n_embeddings, self.embedding_dim, self.beta
        )

    def encode(self, part_pcs, train: bool = False, cached_idx=None, cached_geom=None,
               rot=None):
        """part_pcs: [B, N, 3] -> dict(z_q [B, L, num_dim], xyz [B, L, 3])."""
        z_e, xyz = self.pn2.encode(part_pcs, train, cached_idx, cached_geom, rot)
        z_e = z_e.astype(jnp.float32)  # code selection must not depend on compute dtype
        B, L, _ = z_e.shape
        _, z_q, _, _ = self.vector_quantization(z_e.reshape(B, 4 * L, -1))
        return {"z_q": z_q.reshape(B, L, -1), "xyz": xyz}

    def grouping_indices(self, part_pcs):
        return self.pn2.grouping_indices(part_pcs)

    def decode(self, z_q):
        return self.pn2.decode(z_q)

    def __call__(self, part_pcs, train: bool = False, mask: jnp.ndarray | None = None):
        """part_pcs: [B, N, 3] -> dict with reconstruction offsets + quantizer stats.

        ``mask``: optional [B] {0,1} sample validity for the quantizer losses and the
        train-mode BatchNorm statistics (compaction repeats carry zero weight).
        """
        z_e, xyz = self.pn2.encode(part_pcs, train, bn_mask=mask if train else None)
        z_e = z_e.astype(jnp.float32)
        B, L, _ = z_e.shape
        embedding_loss, z_q, perplexity, code_idx = self.vector_quantization(
            z_e.reshape(B, 4 * L, -1), mask
        )
        z_q = z_q.reshape(B, L, -1)
        x_hat = self.pn2.decode(z_q)
        return {
            "embedding_loss": embedding_loss,
            "pc_offset": x_hat,  # [B, L, local_decode_pts, 3]
            "perplexity": perplexity,
            "xyz": xyz,  # [B, L, 3]
            "z_q": z_q,
            "code_idx": code_idx,
        }

    def reconstruction(self, out: dict) -> jnp.ndarray:
        """Offsets + token centers -> [B, L*local_decode_pts, 3] reconstructed cloud."""
        pc = out["pc_offset"] + out["xyz"][:, :, None, :]
        B = pc.shape[0]
        return pc.reshape(B, self.num_point * self.local_decode_pts, 3)
