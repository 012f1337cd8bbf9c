"""Unit tests for the auto-agglomerative engine's dense graph machinery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from puzzlefusion_plusplus_tpu.inference.engine import (
    _triu_indices,
    compose_poses,
    connected_components,
    edge_histograms,
    interpenetration_keep_mask,
)
from puzzlefusion_plusplus_tpu.utils.masking import (
    compact_parts,
    compaction_indices,
    scatter_parts,
)
from puzzlefusion_plusplus_tpu.utils.transforms import pose_to_affine, quat_normalize


def test_connected_components_matches_networkx():
    import networkx as nx

    rng = np.random.default_rng(0)
    for _ in range(10):
        P = 12
        adj = np.zeros((P, P), bool)
        for _e in range(8):
            i, j = rng.integers(0, P, 2)
            if i != j:
                adj[i, j] = adj[j, i] = True
        labels = np.asarray(connected_components(jnp.asarray(adj)))
        G = nx.from_numpy_array(adj)
        for comp in nx.connected_components(G):
            comp = sorted(comp)
            assert all(labels[c] == min(comp) for c in comp)


def test_compose_poses_identity_init():
    rng = np.random.default_rng(1)
    P = 5
    noisy = rng.normal(size=(P, 7)).astype(np.float32)
    noisy[:, 3:] = quat_normalize(jnp.asarray(noisy[:, 3:]))
    pivot = jnp.arange(P, dtype=jnp.int32)
    init = jnp.broadcast_to(jnp.eye(4), (P, 4, 4))
    tr, qr = compose_poses(jnp.asarray(noisy), pivot, init)
    np.testing.assert_allclose(np.asarray(tr), noisy[:, :3], atol=1e-5)
    # quaternions match up to sign
    q = np.asarray(qr)
    sign = np.sign((q * noisy[:, 3:]).sum(-1, keepdims=True))
    np.testing.assert_allclose(q * sign, noisy[:, 3:], atol=1e-5)


def test_compose_poses_pivot_indirection():
    """Node with pivot j must get j's pose composed with its own init_pose."""
    P = 3
    noisy = np.zeros((P, 7), np.float32)
    noisy[:, 3] = 1.0  # identity quats
    noisy[1, :3] = [1.0, 2.0, 3.0]
    pivot = jnp.asarray([1, 1, 2], jnp.int32)  # node 0 follows node 1's pose
    init = np.broadcast_to(np.eye(4, dtype=np.float32), (P, 4, 4)).copy()
    init[0, :3, 3] = [0.5, 0.0, 0.0]  # node 0 offset inside the super-fragment
    tr, qr = compose_poses(jnp.asarray(noisy), pivot, jnp.asarray(init))
    np.testing.assert_allclose(np.asarray(tr)[0], [1.5, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr)[1], [1.0, 2.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(tr)[2], [0.0, 0.0, 0.0], atol=1e-5)


def test_edge_histograms_bins():
    P, A = 4, 16
    area = np.zeros((P, A, 3), np.float32)
    # part 1 points at origin, part 0 points offset so squared bidirectional dists are known
    area[1, :4] = 0.0
    area[0, :4] = np.array([[0.02, 0, 0]] * 4)  # d2 = 4e-4 each direction -> 8e-4 in bin 1
    edges = jnp.asarray([[0, 1]], jnp.int32)  # (idx2=0, idx1=1): src part 1, tgt part 0
    corr_src = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    corr_tgt = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    grid = edge_histograms(
        jnp.asarray(area), edges, jnp.asarray([True]), corr_src, corr_tgt,
        jnp.asarray([4], jnp.int32), P,
    )
    bins = np.asarray(grid[1, 0])  # written at [idx1, idx2]
    assert bins[0] == 4 and bins[1:].sum() == 0  # all 4 pairs in bin (0, 1e-3]


def test_edge_histogram_invalid_corr_excluded():
    P, A = 2, 8
    area = np.zeros((P, A, 3), np.float32)
    edges = jnp.asarray([[0, 1]], jnp.int32)
    grid = edge_histograms(
        jnp.asarray(area), edges, jnp.asarray([True]),
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([0], jnp.int32), P,  # zero valid correspondences
    )
    assert np.asarray(grid).sum() == 0


def test_interpenetration_keep_mask():
    """Two overlapping flat patches with opposite normals: overlapping points removed."""
    P, N = 2, 64
    rng = np.random.default_rng(0)
    xy = rng.uniform(-1, 1, size=(N, 2)).astype(np.float32)
    pts = np.zeros((P, N, 3), np.float32)
    pts[0, :, :2] = xy
    pts[1, :, :2] = xy  # same xy, same z -> interpenetrating with opposite normal signs
    normals = np.zeros((P, N, 3), np.float32)
    normals[0, :, 2] = 1.0
    normals[1, :, 2] = -1.0
    pair_active = jnp.asarray([[False, True], [True, False]])
    keep = np.asarray(
        interpenetration_keep_mask(jnp.asarray(pts), jnp.asarray(normals), pair_active, 1e-3)
    )
    assert not keep.any()  # every point overlaps an opposite-normal point
    # same normals -> kept
    normals[1, :, 2] = 1.0
    keep2 = np.asarray(
        interpenetration_keep_mask(jnp.asarray(pts), jnp.asarray(normals), pair_active, 1e-3)
    )
    assert keep2.all()


def test_compaction_roundtrip():
    rng = np.random.default_rng(0)
    B, P = 3, 6
    valids = (rng.random((B, P)) < 0.6).astype(np.float32)
    valids[:, 0] = 1  # at least one valid each
    x = rng.normal(size=(B, P, 4)).astype(np.float32)
    order, src, slot_valid = compaction_indices(jnp.asarray(valids))
    compacted = compact_parts(jnp.asarray(x), src)
    # every slot holds a valid part's data
    for b in range(B):
        for s in range(P):
            assert valids[b, np.asarray(src)[b, s]] == 1
    back = np.asarray(scatter_parts(compacted, order, slot_valid))
    np.testing.assert_allclose(back[valids == 1], x[valids == 1], atol=1e-6)
    assert np.abs(back[valids == 0]).max() == 0


def test_triu_matches_itertools():
    t = _triu_indices(5)
    assert t.shape == (10, 2)
    assert (t[:, 0] < t[:, 1]).all()


def test_max_simultaneous_merges_at_p_half_bound():
    """P/2 disjoint components all merging in ONE iteration — the exact upper bound the
    FPS-slot compaction (engine.py merge_geometry, K = P//2) is sized for."""
    from puzzlefusion_plusplus_tpu.inference.engine import AgglConfig, AgglState, verify_and_merge

    P, N, A, K, Eg = 6, 64, 48, 8, 16
    rng = np.random.default_rng(5)
    noisy = rng.normal(size=(P, 7)).astype(np.float32)
    noisy[:, 3:] += np.array([2.0, 0, 0, 0], np.float32)
    state = AgglState(
        noisy=jnp.asarray(noisy),
        reference_vals=jnp.zeros((P, 7)),
        ref_part=jnp.zeros(P, bool),
        part_valids=jnp.ones(P, jnp.float32),
        part_scale=jnp.asarray(rng.uniform(0.1, 0.6, P).astype(np.float32)),
        part_pcs=jnp.asarray(rng.normal(size=(P, N, 3)).astype(np.float32)),
        area_pts=jnp.asarray(rng.normal(size=(P, A, 3)).astype(np.float32)),
        pivot=jnp.arange(P, dtype=jnp.int32),
        node_valids=jnp.ones(P, bool),
        init_pose=jnp.broadcast_to(jnp.eye(4), (P, 4, 4)),
        classified=jnp.zeros(P, bool),
        adj=jnp.zeros((P, P), bool),
        done=jnp.asarray(False),
        rng=jax.random.key(0),
    )
    matching = {
        "match_edges": jnp.asarray(rng.integers(0, P, size=(Eg, 2)).astype(np.int32)),
        "match_edge_valid": jnp.ones(Eg, bool),
        "corr_src": jnp.asarray(rng.integers(0, A, size=(Eg, K)).astype(np.int32)),
        "corr_tgt": jnp.asarray(rng.integers(0, A, size=(Eg, K)).astype(np.int32)),
        "corr_count": jnp.full(Eg, K, np.int32),
    }
    triu = jnp.asarray(_triu_indices(P))
    want = {(0, 1), (2, 3), (4, 5)}  # 3 = P//2 disjoint pairs

    def verifier_apply(feats, indices, valids):
        logits = [10.0 if (int(a), int(b)) in want else -10.0 for a, b in np.asarray(triu)]
        return jnp.asarray(logits, jnp.float32)[None, :, None]

    cfg = AgglConfig(max_iters=2, num_inference_steps=2)
    new = jax.jit(
        lambda s: verify_and_merge(s, verifier_apply, matching, jnp.asarray(P), cfg, triu)
    )(state)

    part_merges = np.asarray(new.classified)  # all six parts joined a merging component
    assert part_merges.all()
    node_valids = np.asarray(new.node_valids)
    assert node_valids.sum() == 3  # one surviving pivot per pair
    # each pair collapsed onto its larger-scale member, cloud re-committed and renormalized
    scale = np.asarray(state.part_scale)
    for a, b in want:
        piv = a if scale[a] >= scale[b] else b
        assert node_valids[piv]
        assert np.asarray(new.part_valids)[piv] == 1.0
        assert np.abs(np.asarray(new.part_pcs)[piv]).max() <= 1.0 + 1e-5
        assert not np.allclose(np.asarray(new.part_pcs)[piv], np.asarray(state.part_pcs)[piv])
    np.testing.assert_array_equal(
        np.asarray(new.pivot), [a if scale[a] >= scale[b] else b for a, b in
                                ((0, 1), (0, 1), (2, 3), (2, 3), (4, 5), (4, 5))]
    )
