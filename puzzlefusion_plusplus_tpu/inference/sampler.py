"""Reverse-diffusion sampling: frozen-encoder feature extraction + 20-step DDPM loop.

The reference's hot inference path (denoiser.py:153-209 validation, auto_aggl.py:137-151):
every reverse step re-encodes the rotated part clouds through the frozen VQ-VAE and runs the
denoiser transformer. Here the whole loop is one ``lax.scan`` (SURVEY.md §7.1) so XLA pipelines
encoder + transformer + scheduler into a single compiled program; the per-step trajectory is the
scan's stacked output (the reference's ``all_pred_trans_rots`` recording).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.models.scheduler import DDPMParams, step as ddpm_step
from puzzlefusion_plusplus_tpu.utils.masking import (
    compact_parts,
    compaction_indices,
    scatter_parts,
)
from puzzlefusion_plusplus_tpu.utils.transforms import quat_normalize, quat_to_matrix


class FrozenEncoder(NamedTuple):
    """Frozen VQ-VAE encode closure (the reference's self.encoder, denoiser.py:37-77)."""

    apply: Callable  # (part_pcs [M, N, 3], cached_idx=None) -> {"z_q": ..., "xyz": ...}
    grouping: Callable  # (part_pcs [M, N, 3]) -> rotation-invariant stage indices
    num_point: int
    num_dim: int


def _make_fused_encode(model, params, batch_stats):
    """Pure fused-eval encode from folded params (ops/sa_fused_pallas.py): per-step cost is
    three fused SA kernels + one Dense + the codebook argmin — no HBM round trips for the
    grouped activations. Requires cached grouping indices (rotation-invariant)."""
    from puzzlefusion_plusplus_tpu.ops.grouping import index_points
    from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import fold_batchnorm, sa_stage_fused

    p = params["pn2"]
    bs = batch_stats["pn2"]

    def fold(sa):
        return [
            fold_batchnorm(
                p[sa][f"conv{j}"]["kernel"], p[sa][f"conv{j}"]["bias"],
                p[sa][f"bn{j}"]["scale"], p[sa][f"bn{j}"]["bias"],
                bs[sa][f"bn{j}"]["mean"], bs[sa][f"bn{j}"]["var"],
            )
            for j in range(3)
        ]

    w_sa = {sa: fold(sa) for sa in ("sa1", "sa2", "sa3")}
    conv6_k = p["conv6"]["kernel"]
    conv6_b = p["conv6"]["bias"]
    codebook = params["vector_quantization"]["embedding"]
    e_dim = codebook.shape[1]

    def encode(flat_pcs, cached_idx):
        (i1, g1), (i2, g2), (i3, g3) = cached_idx
        f1 = sa_stage_fused(flat_pcs, i1, g1, w_sa["sa1"])
        x1 = index_points(flat_pcs, i1)
        f2 = sa_stage_fused(jnp.concatenate([x1, f1], -1), i2, g2, w_sa["sa2"])
        x2 = index_points(x1, i2)
        f3 = sa_stage_fused(jnp.concatenate([x2, f2], -1), i3, g3, w_sa["sa3"])
        x3 = index_points(x2, i3)
        z_e = f3 @ conv6_k + conv6_b  # [M, L, num_dim]
        M, L, _ = z_e.shape
        z = z_e.reshape(M, -1, e_dim)
        d = (
            jnp.sum(z**2, -1, keepdims=True)
            + jnp.sum(codebook**2, -1)
            - 2.0 * jnp.einsum("mtc,ec->mte", z, codebook)
        )
        z_q = jnp.take(codebook, jnp.argmin(d, -1), axis=0)
        return {"z_q": z_q.reshape(M, L, -1), "xyz": x3}

    return encode


def _make_fused_cached_encode(model, params, batch_stats):
    """Fused-cached encode (ops/sa_fused_pallas.py::sa_stage_fused_cached): per step each
    SA stage is ONE Pallas kernel over the cached grouped geometry — no xyz gathers, the
    feature gather fused with the rotation+BN-folded conv0, conv intermediates VMEM-only."""
    from puzzlefusion_plusplus_tpu.ops.sa_fused_pallas import (
        fold_batchnorm,
        sa_stage_fused_cached,
    )

    p = params["pn2"]
    bs = batch_stats["pn2"]

    def fold(sa):
        return [
            fold_batchnorm(
                p[sa][f"conv{j}"]["kernel"], p[sa][f"conv{j}"]["bias"],
                p[sa][f"bn{j}"]["scale"], p[sa][f"bn{j}"]["bias"],
                bs[sa][f"bn{j}"]["mean"], bs[sa][f"bn{j}"]["var"],
            )
            for j in range(3)
        ]

    w = {sa: fold(sa) for sa in ("sa1", "sa2", "sa3")}
    conv6_k = p["conv6"]["kernel"]
    conv6_b = p["conv6"]["bias"]
    codebook = params["vector_quantization"]["embedding"]
    e_dim = codebook.shape[1]

    def encode(cached_idx, geom_stages, rot):
        (_, _), (_, gi2), (_, gi3) = cached_idx
        (_, g1), (n2_, g2), (n3, g3) = geom_stages

        def run(sa, g, feats, gidx):
            (k1, b1), (w2, b2), (w3, b3) = w[sa]
            # rotation folded into the xyz block of conv0: W_eff = R^T K_xyz
            w_eff = jnp.einsum("med,ec->mdc", rot, k1[:3])
            k1f = k1[3:] if feats is not None else None
            return sa_stage_fused_cached(g, w_eff, feats, gidx, k1f, b1, w2, b2, w3, b3)

        f1 = run("sa1", g1, None, None)
        f2 = run("sa2", g2, f1, gi2)
        f3 = run("sa3", g3, f2, gi3)
        z_e = f3 @ conv6_k + conv6_b  # [M, L, num_dim]
        M = z_e.shape[0]
        z = z_e.reshape(M, -1, e_dim)
        d = (
            jnp.sum(z**2, -1, keepdims=True)
            + jnp.sum(codebook**2, -1)
            - 2.0 * jnp.einsum("mtc,ec->mte", z, codebook)
        )
        z_q = jnp.take(codebook, jnp.argmin(d, -1), axis=0)
        xyz = jnp.einsum("msd,med->mse", n3, rot)  # rotated token centers
        return {"z_q": z_q.reshape(M, model.num_point, -1), "xyz": xyz}

    return encode


def make_frozen_encoder(model, params, batch_stats, fused: str = "cached") -> FrozenEncoder:
    """``fused`` selects the TPU fast path for the frozen-eval encode:
      * 'cached' (default): when cached geometry + rotation matrices are supplied (the
        diffusion sampler), run each SA stage as ONE Pallas kernel
        (sa_stage_fused_cached) — no xyz gathers, VMEM-resident conv chain.
      * 'always': the round-1 fused kernel over raw clouds + cached indices
        (sa_stage_fused). Measured SLOWER than the composable path (32.7 vs 25.5 ms/step)
        — its exact byte-split gathers pay 8 one-hot matmuls per tile; kept for reference.
      * 'never': always the composable flax path."""
    on_tpu = bool(batch_stats) and jax.default_backend() == "tpu"
    fused_encode = (
        _make_fused_encode(model, params, batch_stats)
        if fused == "always" and on_tpu else None
    )
    fused_cached = (
        _make_fused_cached_encode(model, params, batch_stats)
        if fused == "cached" and on_tpu else None
    )

    def apply(flat_pcs, cached_idx=None, cached_geom=None, rot=None):
        if fused_encode is not None and cached_idx is not None and cached_geom is None:
            return fused_encode(flat_pcs, cached_idx)
        if fused_cached is not None and cached_geom is not None and rot is not None:
            return fused_cached(cached_idx, cached_geom, rot)
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            flat_pcs,
            train=False,
            cached_idx=cached_idx,
            cached_geom=cached_geom,
            rot=rot,
            method=type(model).encode,
        )

    from puzzlefusion_plusplus_tpu.models.vqvae import pn2_grouping_geometry

    def grouping(flat_pcs):
        return pn2_grouping_geometry(
            flat_pcs, model.num_point, model.sa_npoints, model.sa_nsamples
        )

    return FrozenEncoder(apply, grouping, model.num_point, model.num_dim)


class FeatureCache(NamedTuple):
    """Per-iteration invariants of the denoise loop: compaction layout, rotation-invariant
    sampling/grouping indices, and the grouped relative GEOMETRY of the unrotated clouds
    (rotation commutes with gather-and-recenter, so per step it is rotated elementwise
    instead of re-gathered — the gathers at N=1000 are the encoder's dominant cost).
    Valid as long as part_pcs/part_valids are unchanged (i.e. between merges)."""

    order: jnp.ndarray
    src: jnp.ndarray
    slot_valid: jnp.ndarray
    idx_stages: tuple
    geom_stages: tuple  # per stage: (new_xyz [M, S, 3], grouped_rel [M, S, K, 3]) unrotated


def build_feature_cache(
    encoder: FrozenEncoder, part_pcs: jnp.ndarray, part_valids: jnp.ndarray
) -> FeatureCache:
    B, P, N, _ = part_pcs.shape
    order, src, slot_valid = compaction_indices(part_valids)
    flat = compact_parts(part_pcs, src).reshape(B * P, N, 3)
    idx_stages, geom_stages = encoder.grouping(flat)
    return FeatureCache(order, src, slot_valid, idx_stages, geom_stages)


def extract_features(
    encoder: FrozenEncoder,
    part_pcs: jnp.ndarray,  # [B, P, N, 3]
    part_valids: jnp.ndarray,  # [B, P]
    noisy_trans_and_rots: jnp.ndarray,  # [B, P, 7]
    cache: FeatureCache | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate clouds by the noisy quaternion, encode, scatter into dense [B, P, L, *]
    (reference denoiser.py:55-77, fixed-shape via compaction instead of boolean gather).

    With ``cache`` (build_feature_cache on the SAME part_pcs/part_valids), the per-step
    FPS/ball-query recomputation disappears — rotation leaves those indices unchanged —
    AND the xyz gathers collapse to elementwise rotations of the cached grouped geometry
    (gather-then-rotate == rotate-then-gather for rigid rotations), so this is numerically
    the reference semantics minus float-association jitter."""
    B, P, N, _ = part_pcs.shape
    quat = quat_normalize(noisy_trans_and_rots[..., 3:])
    if cache is None:
        # single-shot encode (training loss: one encode per step). Keep the composable
        # rotate-then-encode path here: routing through build_feature_cache + the fused
        # kernels measured OOM at the reference train batch (16.22 G vs the chip's
        # 15.75 G HBM — the cache's grouped-geometry tensors + padded copies add ~0.5 G
        # on top of the denoiser backward state), and its train-step compile ran >15 min
        # at M > 1000 parts where the composable step compiles in minutes.
        from puzzlefusion_plusplus_tpu.utils.transforms import qrot

        order, src, slot_valid = compaction_indices(part_valids)
        rotated = qrot(quat[:, :, None, :], part_pcs)
        flat = compact_parts(rotated, src).reshape(B * P, N, 3)
        out = encoder.apply(flat, None)
        z_q = out["z_q"].reshape(B, P, encoder.num_point, encoder.num_dim)
        xyz = out["xyz"].reshape(B, P, encoder.num_point, 3)
        return scatter_parts(z_q, order, slot_valid), scatter_parts(xyz, order, slot_valid)
    order, src, slot_valid, idx_stages, geom_stages = cache
    q_flat = compact_parts(quat, src).reshape(B * P, 4)  # compaction order of the cache
    # rotation folded into each stage's first Dense: only the [M, 3, 3] matrices are
    # built per step; the cached grouped tensors are consumed UNROTATED (a per-step qrot
    # of the [M, S, K, 3] tensors would tile the trailing-3 dim to 128 lanes)
    rot = quat_to_matrix(q_flat)
    # xyz is ignored by the encoder when cached geometry is supplied; pass the cheap
    # unrotated compaction only for shape plumbing — avoid gathering the full cloud
    flat = compact_parts(part_pcs, src).reshape(B * P, N, 3)
    out = encoder.apply(flat, idx_stages, geom_stages, rot)
    z_q = out["z_q"].reshape(B, P, encoder.num_point, encoder.num_dim)
    xyz = out["xyz"].reshape(B, P, encoder.num_point, 3)
    latent = scatter_parts(z_q, order, slot_valid)
    xyz = scatter_parts(xyz, order, slot_valid)
    return latent, xyz


def ddpm_sample(
    denoise_fn: Callable,  # (noisy [B,P,7], t [B]) -> pred noise [B,P,7]
    ddpm: DDPMParams,
    timesteps: jnp.ndarray,  # [S] descending inference timesteps
    init_noisy: jnp.ndarray,  # [B, P, 7]
    ref_part: jnp.ndarray,  # [B, P] bool
    reference_vals: jnp.ndarray,  # [B, P, 7] poses pinned for ref parts
    rng: jax.Array,
    num_inference_steps: int,
    noise_seq: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full reverse loop as lax.scan. Returns (final [B,P,7], trajectory [S,B,P,7]).

    ``noise_seq``: optional [S, B, P, 7] pre-drawn per-step variance noise replacing the
    internal rng draws — lets parity tests inject the exact noise a reference (torch)
    trajectory consumed (diffusers DDPMScheduler.step draws internally). ``None`` keeps the
    production rng stream byte-identical to before this parameter existed."""

    def step_fn(carry, xs):
        t, z_in = xs if noise_seq is not None else (xs, None)
        noisy, rng = carry
        pred_noise = denoise_fn(noisy, jnp.full((noisy.shape[0],), t, jnp.int32))
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, noisy.shape, noisy.dtype) if z_in is None else z_in
        noisy = ddpm_step(ddpm, pred_noise, t, noisy, z, num_inference_steps)
        noisy = jnp.where(ref_part[..., None], reference_vals, noisy)
        return (noisy, rng), noisy

    init_noisy = jnp.where(ref_part[..., None], reference_vals, init_noisy)
    xs = timesteps if noise_seq is None else (timesteps, noise_seq)
    (final, _), traj = jax.lax.scan(step_fn, (init_noisy, rng), xs)
    return final, traj
