"""Property test: the dense verify/merge phase == a networkx/Python transcription of the
reference semantics (auto_aggl.py:153-289 + node_merge_utils.py) on random states.

The simulator reuses the engine's geometry sub-ops (normals, keep-mask, FPS, histograms) —
those have their own unit tests — and re-implements the GRAPH bookkeeping the reference does
with networkx and host loops: ref-part promotion, merge-edge filtering, connected components,
pivot election, centroid recentering, init-pose accumulation, valids/classified updates. A
fake deterministic verifier isolates the machinery from model weights.
"""

import networkx as nx
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from puzzlefusion_plusplus_tpu.inference import engine as E
from puzzlefusion_plusplus_tpu.ops.fps import farthest_point_sample_xla
from puzzlefusion_plusplus_tpu.ops.normals import estimate_pointcloud_normals
from puzzlefusion_plusplus_tpu.utils.transforms import (
    pose_to_affine,
    quat_apply_raw,
    quat_normalize,
    qrot,
)

P, N, A, K, Eg = 6, 64, 48, 8, 16


def random_state(rng, seed_adj=False):
    noisy = rng.normal(size=(P, 7)).astype(np.float32)
    noisy[:, 3:] += np.array([2.0, 0, 0, 0], np.float32)  # keep quats away from zero
    ref = np.zeros(P, bool)
    ref[rng.integers(0, P - 2)] = True
    valids = np.ones(P, np.float32)
    valids[-1] = 0  # one padded part
    state = E.AgglState(
        noisy=jnp.asarray(noisy),
        reference_vals=jnp.asarray(noisy * 0.5),
        ref_part=jnp.asarray(ref),
        part_valids=jnp.asarray(valids),
        part_scale=jnp.asarray(rng.uniform(0.04, 0.6, P).astype(np.float32)),
        part_pcs=jnp.asarray(rng.normal(size=(P, N, 3)).astype(np.float32)),
        area_pts=jnp.asarray(rng.normal(size=(P, A, 3)).astype(np.float32)),
        pivot=jnp.arange(P, dtype=jnp.int32),
        node_valids=jnp.ones(P, bool),
        init_pose=jnp.broadcast_to(jnp.eye(4), (P, 4, 4)),
        classified=jnp.asarray(rng.random(P) < 0.2),
        adj=jnp.zeros((P, P), bool),
        done=jnp.asarray(False),
        rng=jax.random.key(0),
    )
    matching = {
        "match_edges": jnp.asarray(rng.integers(0, P - 1, size=(Eg, 2)).astype(np.int32)),
        "match_edge_valid": jnp.asarray(rng.random(Eg) < 0.8),
        "corr_src": jnp.asarray(rng.integers(0, A, size=(Eg, K)).astype(np.int32)),
        "corr_tgt": jnp.asarray(rng.integers(0, A, size=(Eg, K)).astype(np.int32)),
        "corr_count": jnp.asarray(rng.integers(0, K + 1, size=(Eg,)).astype(np.int32)),
    }
    return state, matching


def make_fake_verifier(rng, n_edges):
    logits = rng.normal(size=(n_edges,)).astype(np.float32) * 4.0

    def apply(feats, indices, valids):
        return jnp.asarray(logits)[None, :, None]

    return apply, logits


def simulate_reference(state, matching, logits, cfg, triu):
    """Python/networkx transcription of one verify/merge iteration."""
    s = {k: np.array(v) for k, v in state._asdict().items() if k != "rng"}
    trans = s["noisy"][:, :3]
    quat_raw = s["noisy"][:, 3:]
    quat = np.asarray(quat_normalize(jnp.asarray(quat_raw)))

    pts = s["part_pcs"] * s["part_scale"][:, None, None]
    transformed = np.asarray(qrot(jnp.asarray(quat)[:, None], jnp.asarray(pts))) + \
        trans[:, None, :]

    ref_before = s["ref_part"].copy()
    classified = s["classified"] | ref_before
    larger = (s["part_valids"] > 0) & (s["part_scale"] > cfg.scale_cutoff)

    pred = (1 / (1 + np.exp(-logits)) > cfg.threshold)
    edge_valids = (triu[:, 0] < 4) & (triu[:, 1] < 4)  # num_parts = 4 in the test
    pred = pred & edge_valids

    # promotion (auto_aggl.py:208-222)
    new_ref = []
    for e in range(len(triu)):
        if not pred[e]:
            continue
        a, b = triu[e]
        in1, in2 = ref_before[a], ref_before[b]
        if in1 and in2:
            continue
        if not in1 and not in2:
            continue
        new_ref.append(b if in1 else a)
    ref_part = ref_before.copy()
    for i in new_ref:
        ref_part[i] = True
    reference_vals = s["noisy"].copy()

    # merge candidates (node_merge_utils.py:92-107)
    merge_edges = []
    for e in range(len(triu)):
        if not pred[e]:
            continue
        a, b = triu[e]
        if ref_part[a] or ref_part[b]:
            continue
        if ref_part[s["pivot"][a]] or ref_part[s["pivot"][b]]:
            continue
        merge_edges.append((int(a), int(b)))

    done = bool((classified == larger).all())
    out = dict(
        s, ref_part=ref_part, reference_vals=reference_vals, classified=classified,
    )
    if done:
        out["done"] = True
        return out

    adj = s["adj"].copy()
    for a, b in merge_edges:
        adj[a, b] = adj[b, a] = True

    G = nx.from_numpy_array(adj)
    area_world = np.asarray(
        quat_apply_raw(jnp.asarray(quat_raw)[s["pivot"]][:, None], jnp.asarray(s["area_pts"]))
    ) + trans[s["pivot"]][:, None, :]

    normals = np.asarray(estimate_pointcloud_normals(jnp.asarray(transformed), 20))

    for comp in nx.connected_components(G):
        comp = sorted(comp)
        n_valid_members = sum(bool(s["node_valids"][c]) for c in comp)
        if n_valid_members < 2:
            continue
        pivot_new = max(comp, key=lambda c: (s["part_scale"][c], -c))
        member_valid = [c for c in comp if s["node_valids"][c]]
        merge_pcs = np.concatenate([transformed[c] for c in member_valid])
        centroid = merge_pcs.mean(0)

        for c in comp:
            aff = np.array(pose_to_affine(
                jnp.asarray(trans[s["pivot"][c]]), jnp.asarray(quat_raw[s["pivot"][c]])
            ))
            aff[:3, 3] -= centroid
            out["init_pose"][c] = aff @ out["init_pose"][c]
            out["area_pts"][c] = area_world[c] - centroid

        # interpenetration keep-mask (engine helper; pairs restricted to valid members)
        pair_active = np.zeros((P, P), bool)
        for i in member_valid:
            for j in member_valid:
                if i != j:
                    pair_active[i, j] = True
        keep = np.asarray(E.interpenetration_keep_mask(
            jnp.asarray(transformed), jnp.asarray(normals), jnp.asarray(pair_active),
            cfg.intersect_threshold,
        ))

        flat = transformed.reshape(P * N, 3)
        mask = np.zeros(P * N, bool)
        for c in member_valid:
            mask[c * N:(c + 1) * N] = keep[c]
        fps_idx = np.asarray(farthest_point_sample_xla(
            jnp.asarray(flat)[None], N, jnp.asarray(mask)[None]))[0]
        merged = flat[fps_idx] - centroid
        scale = np.abs(merged).max()
        out["part_pcs"][pivot_new] = merged / max(scale, 1e-12)
        out["part_scale"][pivot_new] = scale
        for c in comp:
            out["part_valids"][c] = 1.0 if c == pivot_new else 0.0
            out["node_valids"][c] = c == pivot_new
            out["pivot"][c] = pivot_new
            out["classified"][c] = True
    out["adj"] = adj
    out["done"] = bool((out["classified"] == larger).all())
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_verify_and_merge_matches_reference_simulator(seed):
    rng = np.random.default_rng(seed)
    state, matching = random_state(rng)
    triu = E._triu_indices(P)
    fake_verifier, logits = make_fake_verifier(rng, len(triu))
    cfg = E.AgglConfig(normals_k=20)

    new = E.verify_and_merge(
        state, fake_verifier, matching, jnp.asarray(4), cfg, jnp.asarray(triu)
    )
    sim = simulate_reference(state, matching, logits, cfg, triu)

    np.testing.assert_array_equal(np.asarray(new.ref_part), sim["ref_part"])
    np.testing.assert_array_equal(np.asarray(new.classified), sim["classified"])
    np.testing.assert_array_equal(np.asarray(new.adj), sim["adj"])
    assert bool(new.done) == sim["done"]
    if not sim["done"]:
        np.testing.assert_array_equal(np.asarray(new.part_valids), sim["part_valids"])
        np.testing.assert_array_equal(np.asarray(new.node_valids), sim["node_valids"])
        np.testing.assert_array_equal(np.asarray(new.pivot), sim["pivot"])
        np.testing.assert_allclose(np.asarray(new.part_scale), sim["part_scale"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new.init_pose), sim["init_pose"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new.part_pcs), sim["part_pcs"],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new.area_pts), sim["area_pts"],
                                   rtol=1e-4, atol=1e-4)
