"""Piece-aware flat-layout ops for the matching subsystem (pure JAX, fixed-shape).

The reference keeps all pieces of a fracture concatenated in one flat [B, N_sum, 3] cloud with
per-piece counts ``n_pcs`` and builds block masks with host loops over prefix sums
(Jigsaw_matching/model/jigsaw/joint_seg_align_model.py ``diagonal_square_mask``:495-513,
pointnet2_dynamic_utils.py ``square_distance_with_piece``:8-35). Here the single source of
truth is a dense per-point ``piece_id`` [B, N_sum] (padded points get id P), from which every
mask is one broadcast comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def piece_ids(n_pcs: jnp.ndarray, n_sum: int) -> jnp.ndarray:
    """n_pcs: [B, P] -> piece id per flat point [B, N_sum]; padded tail gets id P."""
    cumsum = jnp.cumsum(n_pcs, axis=-1)  # [B, P]
    pos = jnp.arange(n_sum)[None, :, None]  # [1, N_sum, 1]
    return (pos >= cumsum[:, None, :]).sum(-1).astype(jnp.int32)  # [B, N_sum]


def same_piece_mask(pid: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, N, N] bool, True where two points belong to the same piece."""
    return pid[:, :, None] == pid[:, None, :]


def valid_point_mask(pid: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """[B, N] -> [B, N] bool, True for points of valid (non-padded) pieces."""
    return pid < n_valid[:, None]


def diagonal_square_mask(pid: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
    """True where an [i, j] entry is CROSS-piece between two valid points (the reference's
    pos_msk region); same-piece blocks and padded rows/cols are False."""
    valid = valid_point_mask(pid, n_valid)
    return (
        ~same_piece_mask(pid) & valid[:, :, None] & valid[:, None, :]
    )


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    d = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
    d = d + jnp.sum(src**2, axis=-1)[..., :, None]
    d = d + jnp.sum(dst**2, axis=-1)[..., None, :]
    return d


def pca_canonicalize(
    pts: jnp.ndarray,  # [B, N, 3] flat piece clouds
    pid: jnp.ndarray,  # [B, N] piece ids
    valid: jnp.ndarray,  # [B, N] bool
    max_parts: int,
) -> jnp.ndarray:
    """Rotate every piece into its sign-disambiguated PCA frame — SO(3)-invariant
    coordinates for the matcher encoders (no reference analogue: the reference feeds raw
    rotated clouds and buys rotation robustness with its 250-epoch schedule,
    jigsaw_4x4_128_512_250e_cosine_everyday.yaml:13; the round-4 bottleneck decomposition
    showed the learned affinities are the held-out mat_f1 bottleneck precisely because of
    the per-draw SO(3) augmentation — VALIDATION.md "Matcher bottleneck decomposition").

    Per piece: covariance eigenbasis (principal axis first); the first two axis signs are
    fixed by third-moment (skewness) positivity and the third by right-handedness
    (r3 = r1 x r2). Rotating a piece by any Q maps cov -> Q cov Q^T and the eigenbasis to
    Q E up to per-column signs, which the skew disambiguates — so the output is invariant
    wherever the piece has distinct eigenvalues and nonzero skew (fracture fragments are
    irregular; near-symmetric pieces degrade gracefully to an arbitrary-but-valid frame).
    Padded points map to 0.
    """
    dt = pts.dtype
    w = jax.nn.one_hot(pid, max_parts, dtype=dt) * valid[..., None].astype(dt)  # [B,N,P]
    cnt = jnp.maximum(w.sum(1), 1.0)  # [B, P]
    mean = jnp.einsum("bnp,bnc->bpc", w, pts) / cnt[..., None]
    cent = (pts - jnp.einsum("bnp,bpc->bnc", w, mean)) * valid[..., None].astype(dt)
    cov = jnp.einsum("bnp,bnc,bnd->bpcd", w, cent, cent) / cnt[..., None, None]
    _, evecs = jnp.linalg.eigh(cov)  # ascending eigenvalues
    e = evecs[..., ::-1]  # principal axis first; columns e[..., :, k]  [B, P, 3, 3]
    proj = jnp.einsum("bnc,bncd->bnd", cent, jnp.einsum("bnp,bpcd->bncd", w, e))
    skew = jnp.einsum("bnp,bnd->bpd", w, proj**3)  # [B, P, 3] per-axis third moments
    s = jnp.where(skew >= 0, 1.0, -1.0).astype(dt)
    r1 = e[..., :, 0] * s[..., 0][..., None]
    r2 = e[..., :, 1] * s[..., 1][..., None]
    r3 = jnp.cross(r1, r2)  # right-handed by construction
    basis = jnp.stack([r1, r2, r3], axis=-1)  # [B, P, 3, 3]
    return jnp.einsum("bnc,bncd->bnd", cent, jnp.einsum("bnp,bpcd->bncd", w, basis))


def knn_piece_aware(
    xyz: jnp.ndarray, pid: jnp.ndarray, k: int, cross_piece: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """kNN restricted to the SAME piece (or across pieces if ``cross_piece``).

    xyz: [B, N, 3], pid: [B, N] -> (sqdist [B, N, k], idx [B, N, k]).
    The reference does this via torch_geometric knn with batch vectors
    (pointnet2_dynamic_utils.py:123-131, attention_layer.py:128-156).
    """
    d = square_distance(xyz, xyz)
    same = same_piece_mask(pid)
    allowed = ~same if cross_piece else same
    d = jnp.where(allowed, d, jnp.float32(1e10))
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx.astype(jnp.int32)


def fracture_point_labels(
    gt_pcs: jnp.ndarray, pid: jnp.ndarray, n_valid: jnp.ndarray, thresholds: jnp.ndarray
) -> jnp.ndarray:
    """GT fracture-point labels: min distance to another valid piece < threshold
    (reference compute_label, joint_seg_align_model.py:465-484).

    gt_pcs: [B, N, 3], thresholds: [B, N] -> labels [B, N] {0, 1}.
    """
    d = jnp.sqrt(jnp.maximum(square_distance(gt_pcs, gt_pcs), 0.0))
    cross = diagonal_square_mask(pid, n_valid)
    d = jnp.where(cross, d, jnp.float32(1e6))
    dmin = d.min(axis=-1)
    labels = (dmin < thresholds) & valid_point_mask(pid, n_valid)
    return labels.astype(jnp.int32)


def compact_critical(
    labels: jnp.ndarray, *arrays: jnp.ndarray
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, ...]]:
    """Sort critical (label==1) points to the front, preserving order (stable).

    Returns (crit_valid [B, N] bool over compacted slots, compacted arrays).
    The reference materializes a ragged [B, N_] buffer (``_get_critical_feats_BNF...``);
    fixed-shape equivalent: a stable permutation + slot mask.
    """
    order = jnp.argsort(1 - labels, axis=-1, stable=True).astype(jnp.int32)  # [B, N]
    n_crit = labels.sum(axis=-1, keepdims=True)
    slot_valid = jnp.arange(labels.shape[-1])[None, :] < n_crit
    gathered = tuple(
        jnp.take_along_axis(a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1)
        for a in arrays
    )
    return slot_valid, gathered, order


def critical_counts_per_piece(labels: jnp.ndarray, pid: jnp.ndarray, P: int) -> jnp.ndarray:
    """n_critical_pcs [B, P]: number of critical points per piece."""
    onehot = jax.nn.one_hot(pid, P + 1, dtype=labels.dtype)[..., :P]  # [B, N, P]
    return (labels[..., None] * onehot).sum(axis=1)
