"""Structural floors for the engine's held-out part_acc (diagnosis of the 0.22 plateau,
VERDICT r3 weak #1).

part_acc counts REF parts too — they are pinned to GT by construction (engine and
reference alike, auto_aggl.py:96-132), so a denoiser that learned nothing still scores
the ref fraction plus whatever luck identity/random poses buy on small parts. This
script measures those floors on a val split with the exact production metric
(utils/metrics.py::calc_part_acc):

  * ref_floor      — ref parts at GT, every other part at the identity pose
  * random_floor   — ref parts at GT, others at a diffusion-init random pose (seeded)

Read an at-scale engine number AGAINST these floors: learning happened only above them.

Usage: python scripts/part_acc_floor.py [VAL_DIR] [N_SHAPES]   (CPU-safe)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main(val_dir: str, n_shapes: int | None = None, seed: int = 0) -> dict:
    from puzzlefusion_plusplus_tpu.data.datasets import DenoiserDataset
    from puzzlefusion_plusplus_tpu.data.loader import Loader
    from puzzlefusion_plusplus_tpu.utils.metrics import calc_part_acc

    # test mode = the engine's eval distribution (SINGLE ref part; train mode's multi-ref
    # curriculum would inflate the floor); falls back to train mode without matching data
    match_dir = os.path.join(os.path.dirname(os.path.dirname(val_dir)), "matching_data")
    if os.path.isdir(match_dir):
        ds = DenoiserDataset(val_dir, mode="test", matching_data_path=match_dir)
    else:
        ds = DenoiserDataset(val_dir, mode="train")
    n = len(ds) if n_shapes is None else min(n_shapes, len(ds))
    loader = Loader(ds, batch_size=min(8, n), shuffle=False, drop_last=False, seed=0)
    rng = np.random.default_rng(seed)
    accs = {"ref_floor": [], "random_floor": []}
    ref_frac = []
    seen = 0
    for batch in loader:
        if seen >= n:
            break
        pts = jnp.asarray(batch["part_pcs"]) * jnp.asarray(batch["part_scale"])[..., None]
        gt = np.concatenate(  # [B, P, 7] trans ++ quat (w,x,y,z), the training target
            [np.asarray(batch["part_trans"], np.float32),
             np.asarray(batch["part_rots"], np.float32)], axis=-1)
        valids = np.asarray(batch["part_valids"], np.float32)
        ref = np.asarray(batch["ref_part"], bool)
        B, P = gt.shape[:2]

        identity = np.zeros_like(gt)
        identity[..., 3] = 1.0
        pred_ref = np.where(ref[..., None], gt, identity)

        noise = rng.normal(size=gt.shape).astype(np.float32)  # diffusion init (x_T)
        q = noise[..., 3:]
        noise[..., 3:] = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
        pred_rand = np.where(ref[..., None], gt, noise)

        for name, pred in (("ref_floor", pred_ref), ("random_floor", pred_rand)):
            acc, _, _ = calc_part_acc(
                pts, jnp.asarray(pred[..., :3]), jnp.asarray(gt[..., :3]),
                jnp.asarray(pred[..., 3:]), jnp.asarray(gt[..., 3:]),
                jnp.asarray(valids),
            )
            accs[name].extend(np.asarray(acc).tolist())
        ref_frac.extend((ref.sum(-1) / valids.sum(-1)).tolist())
        seen += B

    out = {
        "val_dir": val_dir, "n_shapes": seen,
        "ref_part_fraction_mean": round(float(np.mean(ref_frac)), 4),
        **{k: round(float(np.mean(v[:n])), 4) for k, v in accs.items()},
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    val_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pfpp_gen_4096/pc_data/val"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else None
    main(val_dir, n)
