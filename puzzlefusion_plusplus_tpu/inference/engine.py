"""Auto-agglomerative denoise-verify-merge inference engine (the reference's core capability).

Re-designs ``AutoAgglomerative.test_step`` (reference auto_aggl.py:95-319) as ONE jitted,
fixed-shape program. The reference interleaves device compute with host-side networkx graph
mutation and ragged per-edge Python loops every iteration; here the graph lives in dense arrays
(SURVEY.md §7.1):

  * networkx node attrs (pivot / valids / ref_part / init_pose)  ->  [P] int / bool arrays and
    [P, 4, 4] accumulated affines (identity == the reference's ``init_pose=None``).
  * ``nx.connected_components``  ->  min-label propagation over the accumulated [P, P]
    adjacency matrix (P iterations of a masked min, exact for any graph on P nodes).
  * per-component Python merge loops  ->  masked batched ops over all P candidate component
    labels at once (compute-and-discard for labels that don't merge).
  * ragged by-area clouds + correspondence indirection  ->  dense padded [P, A, 3] /
    [E, K] arrays prepared by the dataset (data/datasets.py _densify_matching).
  * the 20-step denoise loop  ->  ``lax.scan`` (inference/sampler.py) whose stacked output is
    the pose trajectory the renderer consumes.

Merge semantics follow the reference exactly: pivot = largest-scale member (auto_aggl.py:249),
recenter on the member centroid, accumulate per-node init_pose affines
(node_merge_utils.py:225-244), strip interpenetrating points by the index-aligned
opposite-normal test (:159-222 — including its index-aligned quirks), FPS the merged cloud back
to N points, renormalize to [-1, 1].
"""

from __future__ import annotations

import itertools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.inference.sampler import (
    FrozenEncoder,
    build_feature_cache,
    extract_features,
)
from puzzlefusion_plusplus_tpu.models.scheduler import (
    DDPMParams,
    leading_timesteps,
    step as ddpm_step,
)
from puzzlefusion_plusplus_tpu.ops.fps import farthest_point_sample
from puzzlefusion_plusplus_tpu.ops.normals import estimate_pointcloud_normals
from puzzlefusion_plusplus_tpu.utils.transforms import (
    affine_to_pose,
    pose_to_affine,
    quat_apply_raw,
    quat_normalize,
    qrot,
)

CD_BIN_EDGES = np.array([0.0, 1e-3, 5e-3, 1e-2, 5e-2, 1e-1, 100.0], np.float32)


class AgglConfig(NamedTuple):
    max_iters: int = 6
    num_inference_steps: int = 20
    threshold: float = 0.9
    scale_cutoff: float = 0.05  # "larger parts" cutoff (auto_aggl.py:181)
    intersect_threshold: float = 1e-3  # interpenetration CD cutoff (node_merge_utils.py:159)
    normals_k: int = 20
    # 'analytic' is fastest; 'lowmem' avoids the padded [*, K, 3] gather temporaries that
    # OOM HBM at engine batch >= ~32 (ops/normals.py module docstring)
    normals_method: str = "analytic"


class AgglState(NamedTuple):
    noisy: jnp.ndarray  # [P, 7]
    reference_vals: jnp.ndarray  # [P, 7] pinned poses for ref parts
    ref_part: jnp.ndarray  # [P] bool
    part_valids: jnp.ndarray  # [P] f32
    part_scale: jnp.ndarray  # [P] f32
    part_pcs: jnp.ndarray  # [P, N, 3] (mutated by merges)
    area_pts: jnp.ndarray  # [P, A, 3] (mutated by merges)
    pivot: jnp.ndarray  # [P] i32
    node_valids: jnp.ndarray  # [P] bool
    init_pose: jnp.ndarray  # [P, 4, 4]
    classified: jnp.ndarray  # [P] bool
    adj: jnp.ndarray  # [P, P] bool accumulated merge graph
    done: jnp.ndarray  # [] bool
    rng: jax.Array


def _triu_indices(P: int) -> np.ndarray:
    return np.asarray(list(itertools.combinations(range(P), 2)), np.int32)  # [P(P-1)/2, 2]


def _per_part_normal(key: jax.Array, P: int, d: int = 7) -> jnp.ndarray:
    """[P, d] standard normals drawn from per-part fold_in streams.

    A flat ``normal(key, (P, d))`` draw makes every value depend on the part PAD P, which
    would break part-count bucketing (data/bucketing.py): the same shape served at P=12 and
    P=20 would see different noise. Folding the part index into the key makes part i's draw
    independent of how many padding rows follow it, so bucketed and full-pad runs are
    trajectory-identical (tests/test_bucketing.py).
    """
    keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(P))
    return jax.vmap(lambda k: jax.random.normal(k, (d,)))(keys)


def compose_poses(noisy: jnp.ndarray, pivot: jnp.ndarray, init_pose: jnp.ndarray):
    """get_param / extract_final_pred_trans_rots (node_merge_utils.py:246-306): node i's final
    pose = affine(pose of pivot[i]) @ init_pose[i]. -> (trans [P,3], quat [P,4])."""
    trans, quat = noisy[..., :3], noisy[..., 3:]
    aff = pose_to_affine(trans[pivot], quat[pivot])  # [P, 4, 4]
    final = jnp.einsum("pij,pjk->pik", aff, init_pose)
    return affine_to_pose(final)


def connected_components(adj: jnp.ndarray) -> jnp.ndarray:
    """Min-label propagation. adj: [P, P] bool -> labels [P] i32 (min member index)."""
    P = adj.shape[0]
    a = adj | jnp.eye(P, dtype=bool)
    labels0 = jnp.arange(P, dtype=jnp.int32)

    def body(_, labels):
        neigh = jnp.where(a, labels[None, :], P)  # [P, P]
        return jnp.minimum(labels, neigh.min(axis=1))

    return jax.lax.fori_loop(0, P, body, labels0)


def edge_histograms(
    area_world: jnp.ndarray,  # [P, A, 3] current world-pose area clouds
    match_edges: jnp.ndarray,  # [E, 2] (idx2, idx1) as stored by the matching file
    match_edge_valid: jnp.ndarray,  # [E]
    corr_src: jnp.ndarray,  # [E, K] area indices into part idx1
    corr_tgt: jnp.ndarray,  # [E, K] area indices into part idx2
    corr_count: jnp.ndarray,  # [E]
    P: int,
) -> jnp.ndarray:
    """Per-edge matched-point CD histogram scattered into a [P, P, 6] grid
    (auto_aggl.py:184-201 + _make_cd_to_bins:385-389)."""
    E, K = corr_src.shape
    idx2 = match_edges[:, 0]
    idx1 = match_edges[:, 1]
    kmask = jnp.arange(K)[None, :] < corr_count[:, None]  # [E, K]

    src = area_world[idx1[:, None], corr_src]  # [E, K, 3]
    tgt = area_world[idx2[:, None], corr_tgt]
    big = jnp.float32(1e6)
    src = jnp.where(kmask[..., None], src, big)  # invalid slots pushed out of every bin
    tgt = jnp.where(kmask[..., None], tgt, -big)

    d = jnp.sum((src[:, :, None, :] - tgt[:, None, :, :]) ** 2, axis=-1)  # [E, K, K]
    per_point = d.min(axis=2) + d.min(axis=1)  # index-aligned fwd+bwd (chamferdist quirk)
    edges_arr = jnp.asarray(CD_BIN_EDGES)
    # bucketize(right=True): bin b counts edges_arr[b-1] < x <= edges_arr[b]; keep bins 1..6.
    # Direct comparisons instead of searchsorted — identical result, and searchsorted's
    # while-loop lowering costs minutes of XLA:TPU compile at this shape.
    bin_idx = (per_point[..., None] > edges_arr[None, None, :]).sum(-1)  # [E, K]
    in_bin = (bin_idx[..., None] == (1 + jnp.arange(6))[None, None, :]) & kmask[..., None]
    bins = in_bin.sum(axis=1).astype(jnp.float32)  # [E, 6]
    bins = jnp.where(match_edge_valid[:, None], bins, 0.0)

    grid = jnp.zeros((P, P, 6), jnp.float32)
    grid = grid.at[idx1, idx2].set(bins)  # last write wins, like the reference loop
    return grid


def interpenetration_keep_mask(
    transformed_pts: jnp.ndarray,  # [P, N, 3] world-pose part clouds
    normals: jnp.ndarray,  # [P, N, 3]
    pair_active: jnp.ndarray,  # [P, P] bool — pairs to test (same component, both node-valid)
    threshold: float,
) -> jnp.ndarray:
    """node_merge_utils.py:159-222: per part i, drop point n if for some active pair (i, j)
    the index-aligned bidirectional per-point CD is under threshold AND the index-aligned
    normal dot product is negative. Returns keep [P, N] bool."""
    P, N, _ = transformed_pts.shape

    if jax.default_backend() == "tpu":
        # masked Pallas kernel: inactive (i, j) grid programs skip their compute entirely,
        # so a merging iteration pays ~(active pairs)/P^2 of the all-pairs O(P^2 N^2) chain
        # (typically 1-3 pairs; VERDICT r2 #6) with fully static shapes. Inactive entries
        # hold a BIG sentinel; `remove` masks by pair_active anyway.
        from puzzlefusion_plusplus_tpu.ops.chamfer_pallas import masked_pairwise_nn

        nn_fwd = masked_pairwise_nn(transformed_pts, pair_active)  # [i, j, N]
    else:
        # per-point NN distance from part i's points to every part j, tiled over i to keep
        # the working set at [N, P, N] instead of [P, P, N, N]
        sq = jnp.sum(transformed_pts**2, axis=-1)  # [P, N]

        def one_part(pts_i):  # [N, 3] -> [P, N] dist of i's point n to nearest in each j
            d = (
                jnp.sum(pts_i**2, axis=-1)[None, :, None]
                - 2.0 * jnp.einsum("nd,jmd->jnm", pts_i, transformed_pts)
                + sq[:, None, :]
            )  # [P, N, N]
            return d.min(axis=2)  # [P, N]

        nn_fwd = jax.lax.map(one_part, transformed_pts)  # [i, j, N]
    per_point = nn_fwd + jnp.swapaxes(nn_fwd, 0, 1)  # + dist of j's point n to nearest in i

    ndot = jnp.einsum("ind,jnd->ijn", normals, normals)  # index-aligned normal dot
    remove = (per_point < threshold) & (ndot < 0) & pair_active[:, :, None]
    return ~remove.any(axis=1)  # [P, N]


def make_denoise_phase(
    denoiser_apply: Callable, encoder: FrozenEncoder, ddpm: DDPMParams, cfg: AgglConfig
):
    timesteps = jnp.asarray(
        leading_timesteps(ddpm.num_train_timesteps, cfg.num_inference_steps)
    )

    def denoise_phase(state: AgglState):
        """20-step reverse loop; returns (state, trajectory [S, P, 7] of composed poses).

        The compaction layout + FPS/ball-query indices are invariant across the 20 steps
        (rotation-invariant, and part_pcs/valids only change at merges), so they are built
        ONCE here instead of 20x inside the scan — the single biggest inference speedup."""
        cache = build_feature_cache(encoder, state.part_pcs[None], state.part_valids[None])

        def step_fn(carry, t):
            noisy, rng = carry
            latent, xyz = extract_features(
                encoder,
                state.part_pcs[None],
                state.part_valids[None],
                noisy[None],
                cache,
            )
            pred = denoiser_apply(
                noisy[None],
                jnp.full((1,), t, jnp.int32),
                latent,
                xyz,
                state.part_valids[None],
                state.part_scale[None, :, None],
                state.ref_part[None],
            )[0]
            rng, k = jax.random.split(rng)
            z = _per_part_normal(k, noisy.shape[0]).astype(noisy.dtype)
            new = ddpm_step(ddpm, pred, t, noisy, z, cfg.num_inference_steps)
            new = jnp.where(state.ref_part[:, None], state.reference_vals, new)
            new = jnp.where(state.done, noisy, new)  # freeze once done
            tr, qr = compose_poses(new, state.pivot, state.init_pose)
            return (new, rng), jnp.concatenate([tr, qr], axis=-1)

        (noisy, rng), traj = jax.lax.scan(step_fn, (state.noisy, state.rng), timesteps)
        return state._replace(noisy=noisy, rng=rng), traj

    return denoise_phase


class MergeCtx(NamedTuple):
    """Everything the heavy merge geometry + commit need from the verify pass, so the
    geometry can be gated on a BATCH-GLOBAL ``part_merges.any()`` outside vmap: a
    per-sample ``lax.cond`` under vmap lowers to ``select`` and executes BOTH branches
    for every sample (the round-1 finding) — hoisting the predicate over the batch makes
    the skip real whenever no sample in the batch merges this iteration."""

    transformed_pts: jnp.ndarray  # [P, N, 3] world-pose clouds
    labels: jnp.ndarray  # [P] component labels
    label_pivot: jnp.ndarray  # [P] largest-scale member per label
    centroid: jnp.ndarray  # [P, 3] per-label member centroid
    merging: jnp.ndarray  # [P] bool per label
    part_merges: jnp.ndarray  # [P] bool per part
    classified: jnp.ndarray  # [P] bool (post-verify, pre-merge)
    larger: jnp.ndarray  # [P] bool (scale cutoff, from the pre-verify state)
    done: jnp.ndarray  # [] bool (after the pre-merge early-stop check)


def verify_phase(
    state: AgglState,
    verifier_apply: Callable,
    matching: dict,
    num_parts: jnp.ndarray,
    cfg: AgglConfig,
    triu: jnp.ndarray,  # [Et, 2]
) -> tuple[AgglState, MergeCtx]:
    """Verifier forward + graph/bookkeeping updates (everything in the reference's verify
    and merge steps EXCEPT the merged-cloud geometry). Returns the partially-updated state
    and the MergeCtx for merge_geometry/commit_merge."""
    P, N, _ = state.part_pcs.shape
    trans, quat_raw = state.noisy[..., :3], state.noisy[..., 3:]
    quat = quat_normalize(quat_raw)

    # world-pose part clouds (auto_aggl.py:158-162)
    pts = state.part_pcs * state.part_scale[:, None, None]
    transformed_pts = qrot(quat[:, None, :], pts) + trans[:, None, :]

    # world-pose area clouds through each node's pivot — raw (unnormalized) quaternions,
    # exactly like the reference (node_merge_utils.py:16-41 applies rots without norm)
    piv_q, piv_t = quat_raw[state.pivot], trans[state.pivot]
    area_world = quat_apply_raw(piv_q[:, None, :], state.area_pts) + piv_t[:, None, :]

    ref_before = state.ref_part
    classified = state.classified | ref_before  # auto_aggl.py:178-179
    larger = (state.part_valids > 0) & (state.part_scale > cfg.scale_cutoff)

    # ---- verifier features + forward (auto_aggl.py:184-206)
    grid = edge_histograms(
        area_world, matching["match_edges"], matching["match_edge_valid"],
        matching["corr_src"], matching["corr_tgt"], matching["corr_count"], P,
    )
    feats = grid[triu[:, 0], triu[:, 1]]  # [Et, 6]
    counts = feats.sum(axis=-1, keepdims=True)
    feats = feats / jnp.where(counts == 0, 1.0, counts)
    feats = jnp.concatenate([feats, counts], axis=-1)  # [Et, 7]
    edge_valids = (triu[:, 0] < num_parts) & (triu[:, 1] < num_parts)

    logits = verifier_apply(
        feats[None], triu[None], edge_valids[None].astype(jnp.float32)
    )[0, :, 0]
    pred_edge = (jax.nn.sigmoid(logits) > cfg.threshold) & edge_valids

    # ---- reference-part promotion (auto_aggl.py:208-222): classified edges with exactly one
    # endpoint in the (pre-promotion) ref set promote the other endpoint
    a, b = triu[:, 0], triu[:, 1]
    one_ref = pred_edge & (ref_before[a] ^ ref_before[b])
    new_ref = (
        jnp.zeros(P, bool)
        .at[a].max(one_ref & ~ref_before[a])
        .at[b].max(one_ref & ~ref_before[b])
    )
    ref_part = ref_before | new_ref

    # pin every ref part at its current pose from now on (auto_aggl.py:224)
    reference_vals = state.noisy

    # ---- merge candidates (node_merge_utils.py:92-107): neither endpoint ref, neither pivot ref
    mergeable = (
        pred_edge
        & ~ref_part[a] & ~ref_part[b]
        & ~ref_part[state.pivot[a]] & ~ref_part[state.pivot[b]]
    )

    # early stop BEFORE merging (auto_aggl.py:230-231)
    done = state.done | jnp.all(classified == larger)

    adj = state.adj.at[a, b].max(mergeable & ~done).at[b, a].max(mergeable & ~done)
    labels = connected_components(adj)

    # ---- per-component merge, vectorized over all P candidate labels
    member = labels[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None]  # [label, part]
    n_valid_members = (member & state.node_valids[None, :]).sum(axis=1)
    merging = n_valid_members >= 2  # components that actually merge
    part_merges = (merging[labels]) & ~done  # [P] part belongs to a merging component

    # pivot per label: largest-scale member among CURRENT nodes (auto_aggl.py:249) —
    # absorbed slots keep their stale part_scale, so an unmasked argmax could resurrect a
    # dead node as pivot when its old scale beats the merged cloud's
    scale_masked = jnp.where(
        member & state.node_valids[None, :], state.part_scale[None, :], -jnp.inf
    )
    label_pivot = jnp.argmax(scale_masked, axis=1).astype(jnp.int32)  # [label]

    # centroid per label over member *valid-node* clouds (auto_aggl.py:250-256)
    pt_mask = (member & state.node_valids[None, :])[:, :, None]  # [label, part, 1]
    w = pt_mask.astype(jnp.float32)
    centroid = (transformed_pts[None] * w[..., None]).sum((1, 2)) / jnp.maximum(
        (w * N).sum((1, 2))[:, None], 1.0
    )  # [label, 3]

    # init_pose accumulation for ALL members (node_merge_utils.py:225-244)
    aff = pose_to_affine(trans[state.pivot], quat_raw[state.pivot])  # [P, 4, 4] node pivots
    aff = aff.at[:, :3, 3].add(-centroid[labels])  # t = trans[pivot] - centroid(component)
    new_init = jnp.einsum("pij,pjk->pik", aff, state.init_pose)
    init_pose = jnp.where(part_merges[:, None, None], new_init, state.init_pose)

    # area clouds of members move to world pose recentered on the component centroid
    new_area = area_world - centroid[labels][:, None, :]
    area_pts = jnp.where(part_merges[:, None, None], new_area, state.area_pts)

    mid = state._replace(
        reference_vals=reference_vals, ref_part=ref_part, area_pts=area_pts,
        init_pose=init_pose, adj=adj,
    )
    ctx = MergeCtx(
        transformed_pts=transformed_pts, labels=labels, label_pivot=label_pivot,
        centroid=centroid, merging=merging, part_merges=part_merges,
        classified=classified, larger=larger, done=done,
    )
    return mid, ctx


def merge_geometry(
    ctx: MergeCtx, node_valids: jnp.ndarray, cfg: AgglConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The heavy merge geometry: interpenetration filter + masked FPS resample
    (node_merge_utils.py:159-222). Returns (merged [P, N, 3], merge_scale [P]) indexed by
    component label; only labels with ``ctx.merging`` carry data."""
    P, N, _ = ctx.transformed_pts.shape
    transformed_pts, labels = ctx.transformed_pts, ctx.labels
    part_merges, merging, centroid = ctx.part_merges, ctx.merging, ctx.centroid
    member = labels[None, :] == jnp.arange(P, dtype=jnp.int32)[:, None]  # [label, part]

    # interpenetration filter (node_merge_utils.py:159-222)
    normals = estimate_pointcloud_normals(
        transformed_pts, cfg.normals_k, method=cfg.normals_method
    )
    same_comp = labels[:, None] == labels[None, :]
    pair_active = (
        same_comp
        & node_valids[:, None] & node_valids[None, :]
        & ~jnp.eye(P, dtype=bool)
        & part_merges[:, None] & part_merges[None, :]
    )
    keep = interpenetration_keep_mask(
        transformed_pts, normals, pair_active, cfg.intersect_threshold
    )  # [P, N]

    # FPS the merged cloud of every MERGING label back to N points. A merging component
    # consumes >= 2 disjoint valid nodes, so at most floor(P/2) labels merge per
    # iteration — compacting them into K = P//2 slots (merging-first argsort) halves the
    # FPS work with zero semantic change. Sampling runs on the un-recentered world
    # points (FPS is translation-invariant) with per-label masks.
    K = max(P // 2, 1)
    sel = jnp.argsort(~merging, stable=True).astype(jnp.int32)[:K]  # [K] label ids
    sel_valid = merging[sel]
    flat_pts = transformed_pts.reshape(P * N, 3)
    fps_mask = (
        member[sel][:, :, None] & node_valids[None, :, None] & keep[None]
    ).reshape(K, P * N)  # [slot, P*N]
    fps_mask = fps_mask & sel_valid[:, None]
    fps_idx = farthest_point_sample(
        jnp.broadcast_to(flat_pts[None], (K, P * N, 3)), N, mask=fps_mask
    )  # [slot, N]
    merged_k = flat_pts[fps_idx] - centroid[sel][:, None, :]  # [slot, N, 3]
    scale_k = jnp.abs(merged_k).max(axis=(1, 2))  # [slot]
    merged_k = merged_k / jnp.maximum(scale_k[:, None, None], 1e-12)
    w = sel_valid[:, None, None]
    merged_ = jnp.zeros((P, N, 3), merged_k.dtype).at[sel].set(
        jnp.where(w, merged_k, 0.0)
    )
    merge_scale_ = jnp.zeros(P).at[sel].set(jnp.where(sel_valid, scale_k, 0.0))
    return merged_, merge_scale_


def commit_merge(
    orig: AgglState,
    mid: AgglState,
    ctx: MergeCtx,
    merged: jnp.ndarray,
    merge_scale: jnp.ndarray,
) -> AgglState:
    """Commit merged clouds at each merging label's pivot part + the done-freeze
    (auto_aggl.py:276-289). ``orig`` is the pre-verify state (freeze reference)."""
    P = ctx.labels.shape[0]
    labels, label_pivot, part_merges = ctx.labels, ctx.label_pivot, ctx.part_merges

    is_new_pivot = part_merges & (label_pivot[labels] == jnp.arange(P))  # [P]
    part_pcs = jnp.where(is_new_pivot[:, None, None], merged[labels], mid.part_pcs)
    part_scale = jnp.where(is_new_pivot, merge_scale[labels], mid.part_scale)
    part_valids = jnp.where(part_merges, 0.0, mid.part_valids)
    part_valids = jnp.where(is_new_pivot, 1.0, part_valids)
    node_valids = jnp.where(part_merges, is_new_pivot, mid.node_valids)
    pivot = jnp.where(part_merges, label_pivot[labels], mid.pivot)
    classified = ctx.classified | part_merges

    done = ctx.done | jnp.all(classified == ctx.larger)

    new_state = mid._replace(
        part_valids=part_valids, part_scale=part_scale, part_pcs=part_pcs, pivot=pivot,
        node_valids=node_valids, classified=classified, done=done,
    )
    # once done, the whole verify/merge phase is a no-op (the reference broke out of the loop)
    return jax.tree.map(
        lambda o, n: n if o is n else jnp.where(orig.done, o, n), orig, new_state
    )


def verify_and_merge(
    state: AgglState,
    verifier_apply: Callable,
    matching: dict,
    num_parts: jnp.ndarray,
    cfg: AgglConfig,
    triu: jnp.ndarray,  # [Et, 2]
) -> AgglState:
    """Single-sample verify + merge (the composition the property tests transcribe).
    Batched callers should gate merge_geometry on a batch-global any() instead
    (auto_agglomerate_batch) — under vmap this per-sample cond runs both branches."""
    P, N, _ = state.part_pcs.shape
    mid, ctx = verify_phase(state, verifier_apply, matching, num_parts, cfg, triu)
    merged, merge_scale = jax.lax.cond(
        ctx.part_merges.any(),
        lambda _: merge_geometry(ctx, mid.node_valids, cfg),
        lambda _: (jnp.zeros((P, N, 3), ctx.transformed_pts.dtype), jnp.zeros(P)),
        operand=None,
    )
    return commit_merge(state, mid, ctx, merged, merge_scale)


MATCHING_KEYS = ("match_edges", "match_edge_valid", "corr_src", "corr_tgt", "corr_count")


def make_init_state(sample: dict, rng: jax.Array) -> AgglState:
    """Initial engine state for one shape (auto_aggl.py:96-132): noise all poses, pin the
    reference part to GT, identity graph state."""
    P = sample["part_valids"].shape[0]
    gt = jnp.concatenate([sample["part_trans"], sample["part_rots"]], axis=-1)
    ref0 = sample["ref_part"].astype(bool)
    rng, k = jax.random.split(rng)
    noisy0 = _per_part_normal(k, P).astype(gt.dtype)
    noisy0 = jnp.where(ref0[:, None], gt, noisy0)

    return AgglState(
        noisy=noisy0,
        reference_vals=jnp.where(ref0[:, None], gt, 0.0),
        ref_part=ref0,
        part_valids=sample["part_valids"].astype(jnp.float32),
        part_scale=sample["part_scale"][..., 0],
        part_pcs=sample["part_pcs"],
        area_pts=sample["area_pts"],
        pivot=jnp.arange(P, dtype=jnp.int32),
        node_valids=jnp.ones(P, bool),
        init_pose=jnp.broadcast_to(jnp.eye(4), (P, 4, 4)),
        classified=jnp.zeros(P, bool),
        adj=jnp.zeros((P, P), bool),
        done=jnp.asarray(False),
        rng=rng,
    )


def auto_agglomerate(
    denoiser_apply: Callable,
    verifier_apply: Callable,
    encoder: FrozenEncoder,
    ddpm: DDPMParams,
    sample: dict,  # single test-mode sample (no batch dim)
    rng: jax.Array,
    cfg: AgglConfig,
) -> dict:
    """Full denoise-verify-merge loop for one shape. Returns final poses + trajectory."""
    P = sample["part_valids"].shape[0]
    gt = jnp.concatenate([sample["part_trans"], sample["part_rots"]], axis=-1)
    state = make_init_state(sample, rng)
    matching = {k2: sample[k2] for k2 in MATCHING_KEYS}
    num_parts = jnp.asarray(sample["num_parts"], jnp.int32)
    triu = jnp.asarray(_triu_indices(P))

    denoise_phase = make_denoise_phase(denoiser_apply, encoder, ddpm, cfg)

    # fori_loop over iterations (not an unrolled Python loop) so the compiled program size is
    # independent of max_iters; the final iteration skips verify/merge (auto_aggl.py:153-154)
    S = cfg.num_inference_steps
    traj_buf = jnp.zeros((cfg.max_iters * S, P, 7), gt.dtype)

    def body(it, carry):
        state, traj_buf = carry
        state, traj = denoise_phase(state)
        traj_buf = jax.lax.dynamic_update_slice(traj_buf, traj, (it * S, 0, 0))
        state = jax.lax.cond(
            it + 1 < cfg.max_iters,
            lambda s: verify_and_merge(s, verifier_apply, matching, num_parts, cfg, triu),
            lambda s: s,
            state,
        )
        return state, traj_buf

    state, traj_buf = jax.lax.fori_loop(0, cfg.max_iters, body, (state, traj_buf))

    final_trans, final_rots = compose_poses(state.noisy, state.pivot, state.init_pose)
    return {
        "pred_trans": final_trans,
        "pred_rots": final_rots,
        "trajectory": traj_buf,  # [max_iters*S, P, 7]
        "final_state": state,
    }


def auto_agglomerate_batch(
    denoiser_apply: Callable,
    verifier_apply: Callable,
    encoder: FrozenEncoder,
    ddpm: DDPMParams,
    batch: dict,  # batched test-mode samples, leading dim B
    rngs: jax.Array,  # [B] keys
    cfg: AgglConfig,
) -> dict:
    """Batched engine: per-sample phases vmapped, but the heavy merge geometry is gated on
    a BATCH-GLOBAL ``part_merges.any()`` (a real runtime branch — a per-sample cond under
    vmap lowers to select and executes both branches for every sample), and the iteration
    loop is a ``lax.while_loop`` that exits as soon as EVERY sample is done (the reference's
    per-sample early break, auto_aggl.py:288-289, lifted to the batch).

    Outputs are identical to ``vmap(auto_agglomerate)``: frozen samples' trajectories keep
    recording the frozen pose (rows past an early exit are backfilled with the final pose),
    and per-sample rng streams only diverge after a sample is already frozen.
    """
    B, P = batch["part_valids"].shape
    N = batch["part_pcs"].shape[2]
    gt_dtype = batch["part_trans"].dtype

    state = jax.vmap(make_init_state)(
        {
            k: batch[k]
            for k in ("part_trans", "part_rots", "ref_part", "part_valids",
                      "part_scale", "part_pcs", "area_pts")
        },
        rngs,
    )
    matching = {k: batch[k] for k in MATCHING_KEYS}
    num_parts = jnp.asarray(batch["num_parts"], jnp.int32)
    triu = jnp.asarray(_triu_indices(P))

    denoise_phase = make_denoise_phase(denoiser_apply, encoder, ddpm, cfg)
    S = cfg.num_inference_steps
    traj_buf = jnp.zeros((B, cfg.max_iters * S, P, 7), gt_dtype)

    def run_verify(state):
        orig = state
        mid, ctx = jax.vmap(
            lambda s, m, n_: verify_phase(s, verifier_apply, m, n_, cfg, triu)
        )(state, matching, num_parts)
        merged, merge_scale = jax.lax.cond(
            jnp.any(ctx.part_merges),
            lambda _: jax.vmap(lambda c, nv: merge_geometry(c, nv, cfg))(
                ctx, mid.node_valids
            ),
            lambda _: (
                jnp.zeros((B, P, N, 3), ctx.transformed_pts.dtype),
                jnp.zeros((B, P)),
            ),
            operand=None,
        )
        return jax.vmap(commit_merge)(orig, mid, ctx, merged, merge_scale)

    def body(carry):
        it, state, traj_buf = carry
        state, traj = jax.vmap(denoise_phase)(state)  # traj [B, S, P, 7]
        traj_buf = jax.lax.dynamic_update_slice(traj_buf, traj, (0, it * S, 0, 0))
        state = jax.lax.cond(it + 1 < cfg.max_iters, run_verify, lambda s: s, state)
        return it + 1, state, traj_buf

    def cond_fn(carry):
        it, state, _ = carry
        return (it < cfg.max_iters) & ~jnp.all(state.done)

    it, state, traj_buf = jax.lax.while_loop(
        cond_fn, body, (jnp.asarray(0, jnp.int32), state, traj_buf)
    )

    final_trans, final_rots = jax.vmap(compose_poses)(
        state.noisy, state.pivot, state.init_pose
    )
    # rows past an early exit repeat the final frozen pose (what the fori engine recorded)
    final_pose = jnp.concatenate([final_trans, final_rots], axis=-1)  # [B, P, 7]
    recorded = jnp.arange(cfg.max_iters * S) < it * S
    traj_buf = jnp.where(recorded[None, :, None, None], traj_buf, final_pose[:, None])
    return {
        "pred_trans": final_trans,
        "pred_rots": final_rots,
        "trajectory": traj_buf,  # [B, max_iters*S, P, 7]
        "final_state": state,
        "n_iters": it,  # [] i32 — iterations until every sample froze (early exit)
    }
