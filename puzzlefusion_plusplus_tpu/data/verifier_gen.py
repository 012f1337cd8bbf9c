"""Verifier training-data generation from a trained denoiser.

The reference distributes the verifier dataset as a download (docs/data_preparation.md) —
there is no in-repo generator. The data is, by construction (verifier/dataset/dataset.py
docstring: "matching points distance ... transformed parameters"), per-edge CD-histogram
features of denoiser-produced poses with correct/incorrect alignment labels. This module
regenerates it: for each training shape,

  1. run the full 20-step reverse diffusion from the trained denoiser (inference/sampler.py),
  2. pose the matching-data area clouds at the denoised poses and compute the per-edge
     matched-correspondence CD histograms exactly like the agglomeration engine
     (inference/engine.edge_histograms),
  3. label an edge positive when BOTH endpoint parts are individually well-posed (per-part
     bidirectional chamfer to GT below the part-accuracy threshold, evaluator.py:113-114) —
     pairs of correctly denoised parts are aligned, mixed/incorrect pairs are not.

Outputs the verifier .npz schema (cls_gt, edge_features [E, 6], edge_indices [E, 2]).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.data.datasets import DenoiserDataset
from puzzlefusion_plusplus_tpu.data.loader import Loader
from puzzlefusion_plusplus_tpu.inference.engine import _triu_indices, edge_histograms
from puzzlefusion_plusplus_tpu.ops.chamfer import chamfer_distance_mean
from puzzlefusion_plusplus_tpu.utils.transforms import quat_apply_raw, transform_pc


def generate_verifier_data(
    sample_fn,  # jitted (params, batch, rng) -> (final [B, P, 7], traj) from training/denoiser
    params,
    pc_data_dir: str,
    matching_data_path: str,
    out_dir: str,
    max_num_part: int = 20,
    part_acc_threshold: float = 0.01,
    max_samples: int | None = None,
    seed: int = 0,
    rounds: int = 1,
) -> int:
    """Write one verifier .npz per (shape, round). Returns files written."""
    os.makedirs(out_dir, exist_ok=True)
    ds = DenoiserDataset(
        pc_data_dir, mode="test", matching_data_path=matching_data_path,
        max_num_part=max_num_part,
    )
    loader = Loader(ds, 1, shuffle=False, drop_last=False, seed=seed)
    triu = _triu_indices(max_num_part)
    rng = jax.random.key(seed)

    @jax.jit
    def edge_feats(area_pts, n_area, final, matching):
        quat = final[:, 3:]
        trans = final[:, :3]
        area_world = quat_apply_raw(quat[:, None, :], area_pts) + trans[:, None, :]
        grid = edge_histograms(
            area_world, matching["match_edges"], matching["match_edge_valid"],
            matching["corr_src"], matching["corr_tgt"], matching["corr_count"],
            max_num_part,
        )
        return grid[triu[:, 0], triu[:, 1]]

    written = 0
    for bi, batch in enumerate(loader):
        if max_samples is not None and bi >= max_samples:
            break
        numeric = {
            k: jnp.asarray(v) for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }
        for r in range(rounds):
            rng, k = jax.random.split(rng)
            final, _ = sample_fn(params, numeric, k)
            final0 = final[0]

            # per-part correctness: bidirectional CD(posed, GT-posed) < threshold
            pts = numeric["part_pcs"][0] * numeric["part_scale"][0][..., None]
            posed = transform_pc(final0[:, :3], final0[:, 3:], pts)
            gt_posed = transform_pc(
                numeric["part_trans"][0], numeric["part_rots"][0], pts
            )
            cd = chamfer_distance_mean(posed, gt_posed, bidirectional=True)
            correct = (np.asarray(cd) < part_acc_threshold) & (
                np.asarray(numeric["part_valids"][0]) > 0
            )

            matching = {
                k2: numeric[k2][0]
                for k2 in ("match_edges", "match_edge_valid", "corr_src", "corr_tgt",
                           "corr_count")
            }
            feats = np.asarray(
                edge_feats(numeric["area_pts"][0], numeric["n_area"][0], final0, matching)
            )  # [190, 6]

            num_parts = int(batch["num_parts"][0])
            keep = (triu[:, 0] < num_parts) & (triu[:, 1] < num_parts)
            edge_idx = triu[keep]
            cls_gt = (correct[edge_idx[:, 0]] & correct[edge_idx[:, 1]]).astype(np.int64)
            np.savez(
                os.path.join(out_dir, f"{int(batch['data_id'][0]):05d}_{r}.npz"),
                cls_gt=cls_gt,
                edge_features=feats[keep].astype(np.float32),
                edge_indices=edge_idx.astype(np.int64),
            )
            written += 1
    return written
