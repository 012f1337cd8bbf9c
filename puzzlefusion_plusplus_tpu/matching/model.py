"""Joint segmentation + alignment matching model (the Jigsaw net, flax.linen).

Parity with JointSegmentationAlignmentModel (Jigsaw_matching/model/jigsaw/
joint_seg_align_model.py:16-278):
  encoder (piece-aware PointNet++ MSG / DGCNN) -> PointTransformer self-attention +
  cross-attention -> binary fracture-point classifier (BN-ReLU-1x1conv) -> critical-point
  compaction -> affinity extractor (BN-ReLU-1x1conv to aff_feat_dim) -> primal/dual halves
  L2-normalized -> AffinityDual bilinear score -> cross-piece diagonal-square mask ->
  log-space Sinkhorn (Hungarian at eval).

Fixed-shape design: ragged critical-point buffers [B, N_] become a stable front-compaction of
the full [B, N_sum] cloud with a slot mask (matching/ops.compact_critical); every reference
host loop over prefix sums is a mask computed from per-point piece ids.

Losses (:280-426 + utils/loss.py): BCE fracture classification; permutation loss = masked BCE
between the Sinkhorn matrix and the nearest-critical-point GT permutation; rigid loss =
per-pair weighted-Horn alignment residual (epoch-staged weights, model_config.py:27-31).
"""

from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.matching import ops as mops
from puzzlefusion_plusplus_tpu.matching.alignment import weighted_horn
from puzzlefusion_plusplus_tpu.matching.encoder import DGCNN, PointNet2MSGPointwise
from puzzlefusion_plusplus_tpu.matching.layers import (
    BatchNormPoints,
    CrossAttentionLayer,
    PointTransformerLayer,
)
from puzzlefusion_plusplus_tpu.matching.sinkhorn import hungarian, sinkhorn_log


class AffinityDual(nn.Module):
    """Primal-dual bilinear affinity (affinity_layer.py:27-53): score = Xp @ A @ Yd^T over the
    primal half of X and the dual half of Y; A initialized near identity."""

    dim: int

    @nn.compact
    def __call__(self, x, y):
        hd = self.dim // 2
        A = self.param(
            "A",
            lambda key: jax.random.uniform(
                key, (hd, hd), minval=-1.0 / jnp.sqrt(hd), maxval=1.0 / jnp.sqrt(hd)
            )
            + jnp.eye(hd),
        )
        return jnp.einsum("bnd,de,bme->bnm", x[..., :hd], A, y[..., hd:])


class JigsawModel(nn.Module):
    pc_feat_dim: int = 128
    aff_feat_dim: int = 512
    encoder_type: Literal["pointnet2", "dgcnn"] = "pointnet2"
    tf_num_heads: int = 8
    tf_num_samples: int = 16
    sinkhorn_iters: int = 20
    sinkhorn_tau: float = 0.05
    sa_npoints: tuple = (1024, 256, 64, 16)
    # fracture-point classification formulation (joint_seg_align_model.py:74-89): 'binary'
    # emits one sigmoid logit per point; 'multi' emits num_classes log-softmax logits with
    # argmax prediction and NLL training loss (:170-175, :303-304)
    cls_method: Literal["binary", "multi"] = "binary"
    num_classes: int = 2
    # SO(3)-invariant encoder inputs via per-piece sign-disambiguated PCA frames
    # (matching/ops.py::pca_canonicalize). Default False = exact reference behavior (raw
    # rotated clouds); True removes the rotation-robustness burden the r4 bottleneck
    # decomposition identified as the held-out mat_f1 bottleneck (VALIDATION.md).
    canonicalize_inputs: bool = False
    max_num_part: int = 20

    @nn.compact
    def __call__(
        self,
        part_pcs: jnp.ndarray,  # [B, N_sum, 3] flat piece clouds (augmented frame)
        pid: jnp.ndarray,  # [B, N_sum] piece ids (P for padding)
        n_valid: jnp.ndarray,  # [B]
        critical_label: jnp.ndarray,  # [B, N_sum] {0,1} (GT in training, pred at test)
        train: bool = False,
        compute_matching: bool = True,
        use_pred_labels: bool = False,
    ) -> dict:
        B, N, _ = part_pcs.shape
        valid = mops.valid_point_mask(pid, n_valid)

        # geometry fed to the ENCODERS only; losses/alignment keep the original frames
        enc_pcs = (
            mops.pca_canonicalize(part_pcs, pid, valid, self.max_num_part)
            if self.canonicalize_inputs else part_pcs
        )
        if self.encoder_type == "pointnet2":
            feats = PointNet2MSGPointwise(
                self.pc_feat_dim, self.sa_npoints, name="encoder"
            )(enc_pcs, pid, valid, train)
        else:
            feats = DGCNN(self.pc_feat_dim, name="encoder")(enc_pcs, pid, valid, train)

        feats = PointTransformerLayer(
            self.pc_feat_dim, self.pc_feat_dim, self.tf_num_heads, self.tf_num_samples,
            name="tf_self1",
        )(enc_pcs, feats, pid, train)
        attn_mask = valid[:, None, :] & valid[:, :, None]
        feats = CrossAttentionLayer(
            self.pc_feat_dim, self.tf_num_heads, name="tf_cross1"
        )(feats, attn_mask)

        # fracture-point classifier: BN -> ReLU -> 1x1 conv (stats over valid points only)
        h = BatchNormPoints(name="cls_bn")(feats, train, weights=valid.astype(jnp.float32))
        if self.cls_method == "binary":
            cls_logits = nn.Dense(1, name="cls_head")(nn.relu(h))[..., 0]  # [B, N]
            cls_pred = (jax.nn.sigmoid(cls_logits) > 0.5) & valid
        else:  # multi-class softmax formulation
            cls_logits = jax.nn.log_softmax(
                nn.Dense(self.num_classes, name="cls_head")(nn.relu(h)), axis=-1
            )  # [B, N, K] log-probs (reference applies log_softmax in forward, :173)
            cls_pred = (jnp.argmax(cls_logits, axis=-1) > 0) & valid

        out = {"cls_logits": cls_logits, "cls_pred": cls_pred.astype(jnp.int32),
               "part_feats": feats}
        if not compute_matching:
            return out

        labels = jnp.where(use_pred_labels, cls_pred.astype(jnp.int32), critical_label)
        labels = labels * valid.astype(jnp.int32)
        slot_valid, (crit_feats, crit_pid), order = mops.compact_critical(
            labels, feats, pid[..., None].astype(jnp.float32)
        )
        crit_pid = jnp.where(slot_valid, crit_pid[..., 0].astype(jnp.int32), n_valid[:, None])

        # affinity extractor: BN -> ReLU -> 1x1 conv to aff_feat_dim, halves L2-normalized.
        # compact_critical permutes NON-critical points to the tail slots — the reference
        # runs this BN on the ragged critical-only buffer, so train-mode statistics must
        # zero-weight the tail (slot_valid), not average 80-90% non-critical features in
        a = BatchNormPoints(name="aff_bn")(
            crit_feats, train, weights=slot_valid.astype(jnp.float32)
        )
        a = nn.Dense(self.aff_feat_dim, name="aff_head")(nn.relu(a))
        hd = self.aff_feat_dim // 2
        a = jnp.concatenate(
            [
                a[..., :hd] / jnp.clip(jnp.linalg.norm(a[..., :hd], axis=-1, keepdims=True),
                                       1e-12),
                a[..., hd:] / jnp.clip(jnp.linalg.norm(a[..., hd:], axis=-1, keepdims=True),
                                       1e-12),
            ],
            axis=-1,
        )
        s = AffinityDual(self.aff_feat_dim, name="affinity_layer")(a, a)

        # cross-piece mask over compacted critical slots (diagonal_square_mask semantics)
        cross = (
            (crit_pid[:, :, None] != crit_pid[:, None, :])
            & slot_valid[:, :, None] & slot_valid[:, None, :]
        )
        s = jnp.where(cross, s, -1e6)

        n_crit = labels.sum(-1)
        ds_mat = sinkhorn_log(s, n_crit, n_crit, self.sinkhorn_iters, self.sinkhorn_tau)
        out.update(
            {
                "ds_mat": ds_mat,
                "s_mask": cross,
                "crit_slot_valid": slot_valid,
                "crit_pid": crit_pid,
                "crit_order": order,
                "n_critical_sum": n_crit,
            }
        )
        return out


# ------------------------------------------------------------------ losses


def gt_permutation(
    gt_pcs_crit: jnp.ndarray,  # [B, Nc, 3] GT-pose positions of compacted critical points
    cross_mask: jnp.ndarray,  # [B, Nc, Nc] valid cross-piece entries
) -> jnp.ndarray:
    """Nearest cross-piece critical point -> one-hot GT 'permutation'
    (joint_seg_align_model.py:329-363)."""
    d = mops.square_distance(gt_pcs_crit, gt_pcs_crit)
    d = jnp.where(cross_mask, d, 1e6)
    nn_idx = jnp.argmin(d, axis=-1)
    perm = jax.nn.one_hot(nn_idx, d.shape[-1], dtype=jnp.float32)
    return perm * cross_mask.astype(jnp.float32)


def permutation_loss(ds_mat, gt_perm, n_rows):
    """Masked BCE between doubly-stochastic prediction and GT permutation
    (utils/loss.py:26-56: sum over the full valid square — incl. same-piece zero entries,
    matching the reference — / sum of row counts)."""
    p = jnp.clip(ds_mat, 1e-7, 1.0 - 1e-7)
    bce = -(gt_perm * jnp.log(p) + (1.0 - gt_perm) * jnp.log(1.0 - p))
    # the reference sums BCE over the full [n_r, n_r] valid square, incl. same-piece zeros
    row_valid = jnp.arange(ds_mat.shape[1])[None, :] < n_rows[:, None]
    sq = row_valid[:, :, None] & row_valid[:, None, :]
    return (bce * sq).sum() / jnp.maximum(n_rows.sum(), 1.0)


def rigid_loss_pairs(
    ds_mat: jnp.ndarray,  # [B, Nc, Nc]
    crit_pts: jnp.ndarray,  # [B, Nc, 3] critical points in the part (local) frame
    crit_pid: jnp.ndarray,  # [B, Nc]
    slot_valid: jnp.ndarray,  # [B, Nc]
    max_parts: int,
) -> jnp.ndarray:
    """Per-piece-pair weighted-Horn alignment residual (utils/loss.py:59-142), vectorized over
    all (i, j) piece pairs with masks instead of host loops. For pair (i, j): align src piece
    i's critical points onto piece j's using the match sub-matrix as soft correspondences, and
    penalize the weighted residual between aligned src and mat-projected tgt."""
    B, Nc, _ = crit_pts.shape
    ii, jj = jnp.triu_indices(max_parts, k=1)

    def per_batch(b_mat, b_pts, b_pid, b_slot):
        # Factored pair quantities — NEVER materialize the per-pair [Nc, Nc] match matrix
        # (vmapping that over C(P,2) pairs is [190, 5000, 5000] ≈ 19 GB at reference scale).
        # For pair (i, j), m = b_mat⊙(src_i⊗tgt_j) + (b_mat⊙(tgt_j⊗src_i))^T reduces to,
        # with A = b_mat + b_mat^T and O the slot-masked piece one-hot:
        #   row sums   w_row    = src_i ⊙ (A @ tgt_j)          = O[:, i] ⊙ WW[:, j]
        #   m @ pts    tgt_soft = src_i[:, None] ⊙ (A @ (tgt_j[:, None] * pts)) = O[:,i]⊙Z[:,j]
        #   m.sum()    mat_s    = src_i @ A @ tgt_j            = G[i, j]
        # so every pair shares the same three [Nc, ·] products below.
        O = jax.nn.one_hot(b_pid, max_parts, dtype=b_mat.dtype) * b_slot[
            :, None
        ].astype(b_mat.dtype)  # [Nc, P]
        A = b_mat + b_mat.T
        WW = A @ O  # [Nc, P]
        Z = (A @ (O[:, :, None] * b_pts[:, None, :]).reshape(Nc, -1)).reshape(
            Nc, max_parts, 3
        )  # [Nc, P, 3]
        G = O.T @ WW  # [P, P]

        def pair_loss(i, j):
            src_m = O[:, i]
            w_row = src_m * WW[:, j]  # weight per src point
            tgt_soft = src_m[:, None] * Z[:, j, :]  # [Nc, 3] (scaled by row weights)
            denom = jnp.maximum(w_row[:, None], 1e-9)
            # the reference solves the alignment on the DETACHED match matrix
            # (loss.py:92-116); gradients flow only through the residual's mat terms
            r, t = weighted_horn(
                b_pts,
                jax.lax.stop_gradient(tgt_soft / denom),
                jax.lax.stop_gradient(w_row),
            )
            r, t = jax.lax.stop_gradient(r), jax.lax.stop_gradient(t)
            aligned = (b_pts @ r.T + t) * w_row[:, None]
            resid = ((aligned - tgt_soft) ** 2).sum()
            n_pts = jnp.maximum(src_m.sum(), 1.0)
            mat_s = G[i, j]
            return resid * mat_s, n_pts * (mat_s > 0)

        losses, counts = jax.vmap(pair_loss)(ii, jj)
        return losses.sum(), counts.sum()

    losses, counts = jax.vmap(per_batch)(ds_mat, crit_pts, crit_pid, slot_valid)
    return losses.sum() / jnp.maximum(counts.sum(), 1.0)


def matching_f1(perm_pred, gt_perm, cross_mask):
    tp = (perm_pred * gt_perm * cross_mask).sum()
    fp = (perm_pred * (1 - gt_perm) * cross_mask).sum()
    fn = ((1 - perm_pred) * gt_perm * cross_mask).sum()
    eps = 1e-7
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    return {
        "mat_precision": precision,
        "mat_recall": recall,
        "mat_f1": 2 * precision * recall / (precision + recall + eps),
    }


def hungarian_perm(ds_mat, n_crit):
    return hungarian(ds_mat, n_crit, n_crit)
