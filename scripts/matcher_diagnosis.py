"""Matcher bottleneck decomposition (VERDICT r3 weak #2 / r3-next #6: "publish the
diagnosis — cls recall vs Sinkhorn vs alignment stage").

Held-out mat_f1 sits far below the oracle ceiling (r3: 0.03-0.04 vs 0.63 at 64 train
shapes). This script pins WHICH stage loses it by evaluating ONE trained checkpoint under
four score/selection regimes on the SAME batches, val and train splits:

  regime                       | score matrix       | critical points | discretization
  A production (pred cls)      | learned affinities | predicted       | Hungarian
  B val monitor (gt cls)       | learned affinities | GT labels       | Hungarian
  C oracle scores + Sinkhorn   | -||gt_i - gt_j||^2 | GT labels       | Sinkhorn+Hungarian
  D oracle scores direct       | -||gt_i - gt_j||^2 | GT labels       | Hungarian

Reading the deltas:
  B - A        = cost of the fracture-point classifier (selection quality)
  C, D - B     = cost of the learned affinity features (the head's generalization)
  D vs 1.0     = the metric's own assignment-vs-row-NN gap (gt_perm is row-wise nearest
                 neighbour, not a permutation — matching/oracle.py's ceiling analysis)
  train B - val B = overfitting vs not-learning (same checkpoint, disjoint shapes)

Reference context: the vendored Jigsaw evaluates exactly regime A through eval.sh
(matching_base_model.py:274-454); its val monitor during training is regime B
(train_matching.py:41-49 logs val/mat_f1 with GT labels in forward).

Usage:
  CKPT=/tmp/pfpp_m6/out/ckpt DATA=/tmp/pfpp_m6 NUM_POINTS=1000 MAX_PARTS=6 \
  PC_FEAT=64 AFF_FEAT=128 SA_NPOINTS=256,128,64,16 \
    python scripts/matcher_diagnosis.py          # CPU-safe (forces jax_platforms=cpu)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from evidence import write_summary  # noqa: E402 (scripts/ is sys.path[0] when run directly)
from puzzlefusion_plusplus_tpu.data.loader import Loader
from puzzlefusion_plusplus_tpu.matching import ops as mops
from puzzlefusion_plusplus_tpu.matching.dataset import AllPieceMatchingDataset
from puzzlefusion_plusplus_tpu.matching.model import gt_permutation
from puzzlefusion_plusplus_tpu.matching.sinkhorn import _hungarian_host, sinkhorn_log
from puzzlefusion_plusplus_tpu.matching.train import make_model, numeric_batch
from puzzlefusion_plusplus_tpu.training.state import best_checkpoint, load_checkpoint

CKPT = os.environ.get("CKPT", "/tmp/pfpp_m6/out/ckpt")
DATA = os.environ.get("DATA", "/tmp/pfpp_m6")
NUM_POINTS = int(os.environ.get("NUM_POINTS", "1000"))
MAX_PARTS = int(os.environ.get("MAX_PARTS", "6"))
BATCH = int(os.environ.get("BATCH", "4"))
N_SHAPES = int(os.environ.get("N_SHAPES", "16"))  # per split
PC_FEAT = int(os.environ.get("PC_FEAT", "64"))
AFF_FEAT = int(os.environ.get("AFF_FEAT", "128"))
SA_NPOINTS = tuple(int(x) for x in os.environ.get("SA_NPOINTS", "256,128,64,16").split(","))
OUT_TAG = os.environ.get("OUT_TAG", os.path.basename(DATA.rstrip("/")))


@functools.partial(jax.jit, static_argnames=("model",))
def _diag_device(params, batch_stats, batch, model):
    """One forward per label regime; returns per-regime (ds_mat, n_crit, gt_perm, cross)
    plus the GT-compacted pairwise GT-pose distances for the oracle regimes."""
    pid = batch["piece_id"]
    n_valid = batch["part_valids"].sum(-1).astype(jnp.int32)
    labels = mops.fracture_point_labels(
        batch["gt_pcs"], pid, n_valid, batch["critical_label_thresholds"]
    )
    variables = {"params": params, "batch_stats": batch_stats}

    def run(use_pred):
        out = model.apply(
            variables, batch["part_pcs"], pid, n_valid, labels,
            train=False, compute_matching=True, use_pred_labels=use_pred,
        )
        gt_crit = jnp.take_along_axis(batch["gt_pcs"], out["crit_order"][..., None], axis=1)
        gt_crit = jnp.where(out["crit_slot_valid"][..., None], gt_crit, 1e3)
        cross = out["s_mask"]
        gtp = gt_permutation(gt_crit, cross)
        return out, gt_crit, gtp, cross

    out_gt, gt_crit, gtp_gt, cross_gt = run(False)
    out_pr, _, gtp_pr, cross_pr = run(True)

    # oracle scores over the GT-compacted slots: peaky -d2 at an automatic temperature
    # (the batch's mean cross-piece NN distance), then the model's own Sinkhorn settings
    d2 = mops.square_distance(gt_crit, gt_crit)
    d2m = jnp.where(cross_gt, d2, 1e6)
    nn_d2 = jnp.min(d2m, axis=-1)  # [B, Nc]
    row_valid = nn_d2 < 1e5
    scale = jnp.sum(jnp.where(row_valid, nn_d2, 0.0), axis=(-1,)) / jnp.maximum(
        row_valid.sum(-1), 1
    )  # [B] mean cross NN d2
    s_oracle = jnp.where(cross_gt, -d2 / jnp.maximum(scale, 1e-12)[:, None, None], -1e6)
    n_crit_gt = out_gt["n_critical_sum"]
    ds_oracle = sinkhorn_log(s_oracle, n_crit_gt, n_crit_gt,
                             model.sinkhorn_iters, model.sinkhorn_tau)

    # cls-stage quality (what regime A pays for): masked precision/recall of cls_pred
    valid = mops.valid_point_mask(pid, n_valid).astype(jnp.float32)
    pred = out_pr["cls_pred"].astype(jnp.float32)
    gt = labels.astype(jnp.float32)
    tp = (valid * pred * gt).sum()
    cls = {"cls_tp": tp, "cls_fp": (valid * pred * (1 - gt)).sum(),
           "cls_fn": (valid * (1 - pred) * gt).sum()}

    return {
        "A": (out_pr["ds_mat"], out_pr["n_critical_sum"], gtp_pr, cross_pr),
        "B": (out_gt["ds_mat"], n_crit_gt, gtp_gt, cross_gt),
        "C": (ds_oracle, n_crit_gt, gtp_gt, cross_gt),
        "D": (s_oracle, n_crit_gt, gtp_gt, cross_gt),  # Hungarian maximizes: -d2 works raw
    }, cls


def _split_stats(data_dir: str, model, params, batch_stats) -> dict:
    ds = AllPieceMatchingDataset(data_dir, num_points=NUM_POINTS, max_num_part=MAX_PARTS)
    loader = Loader(ds, BATCH, shuffle=False, drop_last=False, seed=0)
    agg = {k: np.zeros(3) for k in "ABCD"}  # tp, fp, fn
    cls_agg = np.zeros(3)
    seen = 0
    for batch in loader:
        if seen >= N_SHAPES:
            break
        regimes, cls = jax.device_get(
            _diag_device(params, batch_stats, numeric_batch(batch), model)
        )
        cls_agg += np.array([cls["cls_tp"], cls["cls_fp"], cls["cls_fn"]])
        for name, (ds_mat, n_crit, gtp, cross) in regimes.items():
            perm = _hungarian_host(np.asarray(ds_mat), np.asarray(n_crit),
                                   np.asarray(n_crit))
            gtp, cross = np.asarray(gtp), np.asarray(cross)
            agg[name] += np.array([
                float((perm * gtp * cross).sum()),
                float((perm * (1 - gtp) * cross).sum()),
                float(((1 - perm) * gtp * cross).sum()),
            ])
        seen += int(batch["part_pcs"].shape[0])

    def f1(v):
        eps = 1e-7
        p, r = v[0] / (v[0] + v[1] + eps), v[0] / (v[0] + v[2] + eps)
        return {"precision": round(p, 4), "recall": round(r, 4),
                "f1": round(2 * p * r / (p + r + eps), 4)}

    out = {name: f1(v) for name, v in agg.items()}
    out["cls"] = f1(cls_agg)
    out["n_shapes"] = seen
    return out


def main() -> dict:
    t0 = time.time()
    model = make_model(pc_feat_dim=PC_FEAT, aff_feat_dim=AFF_FEAT, sa_npoints=SA_NPOINTS,
                       canonicalize=os.environ.get("CANONICALIZE", "0") == "1")
    best = best_checkpoint(CKPT)
    assert best is not None, f"no checkpoint under {CKPT}"
    restored = load_checkpoint(best)
    params, batch_stats = restored["params"], restored.get("batch_stats", {})
    print(f"[{time.time()-t0:.0f}s] loaded {best}", flush=True)

    result = {"ckpt": best, "num_points": NUM_POINTS, "max_parts": MAX_PARTS,
              "regimes": {
                  "A": "pred-cls selection + learned affinities (production, eval.sh)",
                  "B": "GT-cls selection + learned affinities (val monitor)",
                  "C": "GT-cls + oracle -d2 scores through Sinkhorn+Hungarian",
                  "D": "GT-cls + oracle -d2 scores, Hungarian direct",
              }}
    for split, sub in (("val", "pc_data/val"), ("train", "pc_data/train")):
        result[split] = _split_stats(os.path.join(DATA, sub), model, params, batch_stats)
        print(f"[{time.time()-t0:.0f}s] {split}: "
              f"{json.dumps({k: v for k, v in result[split].items()})}", flush=True)

    ev_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "evidence", OUT_TAG, "matcher")
    os.makedirs(ev_dir, exist_ok=True)
    write_summary(ev_dir, "bottleneck_decomposition", result)
    print(f"wrote {ev_dir}/bottleneck_decomposition.summary.json", flush=True)
    return result


if __name__ == "__main__":
    main()
