"""Rigid alignment solvers: weighted Horn/Kabsch, RANSAC, pose-graph global alignment.

TPU-native replacements for the reference's native alignment stack (SURVEY.md §2.3 N6/N7):
  * ``weighted_horn``    — closed-form weighted point registration
    (Jigsaw_matching/utils/pairwise_alignment.py:11-79, Horn-87) via SVD with the standard
    det-correction (numerically equivalent to the quaternion eigen formulation on clean data).
  * ``ransac_transform`` — replaces open3d's correspondence-based RANSAC
    (utils/estimate_transform.py:8-76): a fixed number of vmapped 3-point hypotheses, inlier
    counting, then a final Horn refit on the best hypothesis's inliers.
  * ``spanning_tree_alignment`` / ``chordal_rotation_averaging`` — pose-graph global
    alignment. The reference uses gtsam Shonan averaging with an MST fallback
    (utils/global_alignment/). Shonan's sequential C++ optimizer doesn't map to TPU; the
    chordal relaxation (least-squares over stacked rotation blocks + SO(3) projection,
    Martinec-Pajdla) plus a linear translation solve recovers the same global poses on
    well-connected graphs, and the MST path is an exact port. Both run host-side (offline
    data-generation path) in numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def weighted_horn(
    src: jnp.ndarray, tgt: jnp.ndarray, weights: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares rigid transform: R @ src + t ~= tgt under per-point weights.

    src/tgt: [..., N, 3], weights: [..., N] -> (R [..., 3, 3], t [..., 3]).
    """
    w = weights[..., None]
    wsum = jnp.maximum(w.sum(-2, keepdims=True), 1e-12)
    mu_s = (src * w).sum(-2, keepdims=True) / wsum
    mu_t = (tgt * w).sum(-2, keepdims=True) / wsum
    xs = src - mu_s
    xt = tgt - mu_t
    cov = jnp.einsum("...ni,...nj->...ij", xs * w, xt)  # [..., 3, 3]
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    # R = V diag(1, 1, det) U^T  (maps src -> tgt)
    r = jnp.einsum("...ij,...j,...kj->...ik", jnp.swapaxes(vt, -1, -2), d, u)
    t = mu_t[..., 0, :] - jnp.einsum("...ij,...j->...i", r, mu_s[..., 0, :])
    return r, t


def transform_error(r, t, src, tgt):
    return jnp.linalg.norm(jnp.einsum("...ij,...nj->...ni", r, src) + t[..., None, :] - tgt,
                           axis=-1)


def ransac_transform(
    src: jnp.ndarray,  # [N, 3] matched source points
    tgt: jnp.ndarray,  # [N, 3] matched target points
    valid: jnp.ndarray,  # [N] bool
    rng: jax.Array,
    num_hypotheses: int = 128,
    inlier_threshold: float = 0.02,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Correspondence RANSAC: vmapped 3-point Horn hypotheses -> best inlier set -> refit."""
    N = src.shape[0]
    n_valid = jnp.maximum(valid.sum(), 1)

    def hypothesis(key):
        idx = jax.random.randint(key, (3,), 0, n_valid)
        # valid points are assumed compacted to the front (callers use compact layouts)
        r, t = weighted_horn(src[idx], tgt[idx], jnp.ones(3))
        err = transform_error(r, t, src, tgt)
        inliers = (err < inlier_threshold) & valid
        return inliers.sum(), r, t

    keys = jax.random.split(rng, num_hypotheses)
    counts, rs, ts = jax.vmap(hypothesis)(keys)
    best = jnp.argmax(counts)
    err = transform_error(rs[best], ts[best], src, tgt)
    inliers = ((err < inlier_threshold) & valid).astype(jnp.float32)
    # refit on inliers (fall back to all valid points when too few inliers)
    w = jnp.where(inliers.sum() >= 3, inliers, valid.astype(jnp.float32))
    return weighted_horn(src, tgt, w)


# ---------------------------------------------------------------- pose graph (host, numpy)


def spanning_tree_alignment(
    n_nodes: int, edges: np.ndarray, transformations: np.ndarray, uncertainty: np.ndarray
) -> np.ndarray:
    """Min-uncertainty spanning tree accumulation (port of the reference MST fallback,
    utils/global_alignment/spanning_tree_alignment.py:6-22). edges[i] = (dst, src):
    ``transformations[i]`` maps piece src into piece dst's frame."""
    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(n_nodes))
    for i, (a, b) in enumerate(edges):
        w = float(uncertainty[i])
        if G.has_edge(int(a), int(b)):
            if G[int(a)][int(b)]["weight"] <= w:
                continue
        G.add_edge(int(a), int(b), weight=w, idx=i)
    T = nx.minimum_spanning_tree(G)
    out = np.repeat(np.eye(4)[None], n_nodes, axis=0)
    visited = {0}
    for parent, child in nx.bfs_edges(T, 0):
        i = T[parent][child]["idx"]
        a, b = int(edges[i][0]), int(edges[i][1])
        t = transformations[i]
        if child == b:  # edge maps child(src=b) into parent(dst=a)
            out[child] = out[parent] @ t
        else:  # traversal goes dst -> src direction
            out[child] = out[parent] @ np.linalg.inv(t)
        visited.add(child)
    return out


def chordal_rotation_averaging(
    n_nodes: int, edges: np.ndarray, rel_rots: np.ndarray, weights: np.ndarray
) -> np.ndarray:
    """Least-squares rotation averaging (chordal relaxation): minimize
    sum_w ||R_dst @ R_rel - R_src... solving the linear system over stacked 3x3 blocks with
    node 0 fixed to identity, then projecting each block to SO(3). Replaces Shonan for the
    offline global-alignment path (utils/global_alignment/shonan_averaging.py:58-103)."""
    # Unknowns: R_i (i = 1..n-1), each 9 entries; R_0 = I.
    # Constraint per edge (dst=a, src=b): R_a @ R_rel_ab = R_b  (T_ab maps b into a's frame:
    # global pose of b = global pose of a composed with the relative transform).
    rows = []
    rhs = []
    dim = 9 * (n_nodes - 1)

    def block_index(i):
        return 9 * (i - 1)

    for e, (a, b) in enumerate(edges):
        a, b = int(a), int(b)
        w = 1.0 / max(float(weights[e]), 1e-6)
        Rr = rel_rots[e]
        # R_a @ Rr - R_b = 0, row-wise: for each row r of R_a (3 unknown rows x 3 entries)
        for r in range(3):
            for c in range(3):
                row = np.zeros(dim)
                target = 0.0
                # (R_a @ Rr)[r, c] = sum_k R_a[r, k] Rr[k, c]
                if a == 0:
                    target -= Rr[r, c]  # R_0 = I -> contributes Rr[r, c]
                else:
                    for k in range(3):
                        row[block_index(a) + 3 * r + k] += Rr[k, c]
                if b == 0:
                    target += float(r == c)
                else:
                    row[block_index(b) + 3 * r + c] -= 1.0
                # equation: (unknown terms) = target, where target collects the constant
                # contributions of fixed R_0 = I moved to the right-hand side
                rows.append(w * row)
                rhs.append(w * target)
    if not rows:
        return np.repeat(np.eye(3)[None], n_nodes, axis=0)
    A = np.stack(rows)
    bvec = np.asarray(rhs)
    sol, *_ = np.linalg.lstsq(A, bvec, rcond=None)
    rots = [np.eye(3)]
    for i in range(1, n_nodes):
        M = sol[9 * (i - 1) : 9 * i].reshape(3, 3)
        u, _, vt = np.linalg.svd(M)
        d = np.diag([1.0, 1.0, np.linalg.det(u @ vt)])
        rots.append(u @ d @ vt)
    return np.stack(rots)


def global_alignment(
    n_nodes: int,
    edges: np.ndarray,
    transformations: np.ndarray,
    uncertainty: np.ndarray,
    method: str = "mst",
) -> np.ndarray:
    """Global poses [n, 4, 4] from relative edge transforms (reference
    utils/global_alignment/__init__.py:9-49 dispatch: shonan with MST fallback)."""
    if len(edges) == 0:
        return np.repeat(np.eye(4)[None], n_nodes, axis=0)
    if method == "chordal":
        rots = chordal_rotation_averaging(
            n_nodes, edges, transformations[:, :3, :3], uncertainty
        )
        # translations: R_a t_rel + t_a = t_b is nonlinear in unknown t; solve linearly:
        # pose_b = pose_a @ T_ab => t_b = R_a @ t_ab + t_a
        A = np.zeros((3 * len(edges), 3 * (n_nodes - 1)))
        rhs = np.zeros(3 * len(edges))
        for e, (a, b) in enumerate(edges):
            a, b = int(a), int(b)
            w = 1.0 / max(float(uncertainty[e]), 1e-6)
            contrib = rots[a] @ transformations[e, :3, 3]
            if b != 0:
                A[3 * e : 3 * e + 3, 3 * (b - 1) : 3 * b] -= w * np.eye(3)
            if a != 0:
                A[3 * e : 3 * e + 3, 3 * (a - 1) : 3 * a] += w * np.eye(3)
            rhs[3 * e : 3 * e + 3] = -w * contrib
        sol, *_ = np.linalg.lstsq(A, rhs, rcond=None)
        out = np.repeat(np.eye(4)[None], n_nodes, axis=0)
        for i in range(n_nodes):
            out[i, :3, :3] = rots[i]
            if i > 0:
                out[i, :3, 3] = sol[3 * (i - 1) : 3 * i]
        return out
    return spanning_tree_alignment(n_nodes, edges, transformations, uncertainty)
