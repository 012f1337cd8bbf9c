"""Full-pipeline inference entry (the reference's test.py + AutoAgglomerative test loop).

Loads the three orbax checkpoints ({encoder, denoiser, verifier} — the schema replacing the
reference's key-prefix state_dict splits, test.py:24-38), runs the jitted auto-agglomerative
engine per test shape, computes part-acc / shape-CD / RMSE metrics, and writes the renderer
artifact contract unchanged (auto_aggl.py:322-357): per-sample ``predict_{acc}.npy`` pose
trajectory, ``gt.npy``, ``init_pose.npy``, ``mesh_file_path.txt``.

TPU throughput: samples are vmapped/sharded into device batches (the reference is locked to
batch size 1 on one GPU, docs/test.md:8); assemblies/sec scales with chips.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.data import DenoiserDataset, Loader
from puzzlefusion_plusplus_tpu.data.bucketing import part_bucket, slice_batch_parts
from puzzlefusion_plusplus_tpu.inference.engine import AgglConfig, auto_agglomerate_batch
from puzzlefusion_plusplus_tpu.models.scheduler import DDPMParams
from puzzlefusion_plusplus_tpu.training.denoiser import (
    load_frozen_encoder,
    make_model as make_denoiser_model,
)
from puzzlefusion_plusplus_tpu.training.state import jitted_init, load_model_params
from puzzlefusion_plusplus_tpu.training.verifier import make_model as make_verifier_model
from puzzlefusion_plusplus_tpu.utils.config import Config, config_from_argv
from puzzlefusion_plusplus_tpu.utils.metrics import (
    calc_part_acc,
    calc_shape_cd,
    rot_metrics,
    trans_metrics,
)

SAMPLE_KEYS = (
    "part_pcs", "part_trans", "part_rots", "part_scale", "part_valids", "ref_part",
    "num_parts", "area_pts", "n_area", "match_edges", "match_edge_valid",
    "corr_src", "corr_tgt", "corr_count",
)


def build_engine_fn(cfg: Config):
    """Returns the jitted batched engine fn (a closure over the loaded model weights)."""
    denoiser = make_denoiser_model(cfg)
    verifier = make_verifier_model(cfg)
    encoder = load_frozen_encoder(cfg)
    ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
    acfg = AgglConfig(
        max_iters=cfg.verifier.max_iters,
        num_inference_steps=cfg.denoiser.num_inference_steps,
        threshold=cfg.verifier.threshold,
        # large engine batches hit HBM limits on the padded normals gathers; switch to the
        # layout-safe variant (ops/normals.py) past the measured cliff
        normals_method="lowmem" if cfg.inference.batch_size >= 16 else "analytic",
    )

    if cfg.denoiser.ckpt_path:
        den_params, _ = load_model_params(cfg.denoiser.ckpt_path)
    else:
        den_params = _init_denoiser_params(cfg, denoiser)
    if cfg.verifier.ckpt_path:
        ver_params, _ = load_model_params(cfg.verifier.ckpt_path)
    else:
        ver_params = _init_verifier_params(cfg, verifier)

    # The ~250 MB of transformer weights MUST flow in as jit ARGUMENTS, not closure
    # captures: closed-over arrays lower to HLO constants, which bloated the compiled
    # engine executable to 735 MB (a 527 MB HLO text) and cost ~300 s of XLA processing
    # per process start even with a warm persistent cache (measured round 2).
    @jax.jit
    def engine_batch(params, batch, rngs):
        dp, vp = params["denoiser"], params["verifier"]

        def denoiser_apply(noisy, t, latent, xyz, valids, scale, ref):
            return denoiser.apply(
                {"params": dp}, noisy, t, latent, xyz, valids, scale, ref, train=False
            )

        def verifier_apply(feats, indices, valids):
            return verifier.apply({"params": vp}, feats, indices, valids, train=False)

        out = auto_agglomerate_batch(
            denoiser_apply, verifier_apply, encoder, ddpm, batch, rngs, acfg
        )
        pts = batch["part_pcs"] * batch["part_scale"][..., None]  # original local clouds
        gt_trans, gt_rots = batch["part_trans"], batch["part_rots"]
        valids = batch["part_valids"]
        acc, acc_per_part, _ = calc_part_acc(
            pts, out["pred_trans"], gt_trans, out["pred_rots"], gt_rots, valids
        )
        shape_cd = calc_shape_cd(
            pts, out["pred_trans"], gt_trans, out["pred_rots"], gt_rots, valids
        )
        rmse_r = rot_metrics(out["pred_rots"], gt_rots, valids, "rmse")
        rmse_t = trans_metrics(out["pred_trans"], gt_trans, valids, "rmse")
        # ref parts are pinned to GT, so part_acc has a ~0.25 structural floor on a
        # 2-20-part mix (scripts/part_acc_floor.py); nonref excludes the give-away parts
        nonref = (valids == 1) & ~batch["ref_part"].astype(bool)
        # all-ref shapes score 1.0, matching training/denoiser.py::eval_metrics — the
        # training-time eval_part_acc_nonref curve and this engine metric must agree
        acc_nonref = jnp.where(
            nonref.sum(-1) > 0,
            (acc_per_part & nonref).sum(-1) / nonref.sum(-1).clip(1),
            1.0,
        )
        # merge telemetry: how much agglomeration actually executed — a run whose engine
        # outcome is insensitive to matching-data quality (r5 model-vs-GT comparison)
        # needs this to say whether merges fired at all
        adj = out["final_state"].adj
        return {
            "part_acc": acc, "part_acc_nonref": acc_nonref, "shape_cd": shape_cd,
            "rmse_r": rmse_r, "rmse_t": rmse_t,
            "acc_per_part": acc_per_part,  # [B, P] bool (valid slots meaningful)
            "trajectory": out["trajectory"],
            "n_merged_pairs": adj.sum((-1, -2)) // 2,  # [B] i32
            "n_iters": jnp.broadcast_to(out["n_iters"], acc.shape),  # [B]
        }

    param_bundle = {"denoiser": den_params, "verifier": ver_params}

    def engine(batch, rngs):
        return engine_batch(param_bundle, batch, rngs)

    # exposed for AOT executable serialization (bench.py): the raw jitted fn + weights let
    # a caller lower/compile once and serialize the executable next to the HLO cache
    engine.jitted = engine_batch
    engine.params = param_bundle
    return engine


def _init_denoiser_params(cfg, model):
    P, L = cfg.data.max_num_part, cfg.denoiser.num_point
    v = jitted_init(
        model, jax.random.key(0),
        jnp.zeros((1, P, 7)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, P, L, cfg.denoiser.num_dim)), jnp.zeros((1, P, L, 3)),
        jnp.ones((1, P)), jnp.ones((1, P, 1)), jnp.zeros((1, P), bool), train=False,
    )
    return v["params"]


def _init_verifier_params(cfg, model):
    E = cfg.data.max_num_part * (cfg.data.max_num_part - 1) // 2
    v = jitted_init(
        model, jax.random.key(0),
        jnp.zeros((1, E, cfg.verifier.num_features)), jnp.zeros((1, E, 2), jnp.int32),
        jnp.ones((1, E)), train=False,
    )
    return v["params"]


def save_inference_artifacts(out_dir: str, batch: dict, results: dict) -> None:
    """Per-sample renderer artifacts, reference contract (auto_aggl.py:322-357)."""
    B = results["part_acc"].shape[0]
    traj = np.asarray(results["trajectory"])  # [B, T, P, 7]
    for i in range(B):
        data_id = int(batch["data_id"][i])
        save_dir = os.path.join(out_dir, str(data_id))
        os.makedirs(save_dir, exist_ok=True)
        mask = np.asarray(batch["part_valids"][i]) == 1
        acc = float(results["part_acc"][i])
        np.save(os.path.join(save_dir, f"predict_{acc}.npy"), traj[i][:, mask])
        gt = np.concatenate(
            [np.asarray(batch["part_trans"][i]), np.asarray(batch["part_rots"][i])], -1
        )[mask]
        np.save(os.path.join(save_dir, "gt.npy"), gt)
        init_pose = np.concatenate(
            [np.asarray(batch["init_pose_t"][i]), np.asarray(batch["init_pose_r"][i])], -1
        )
        np.save(os.path.join(save_dir, "init_pose.npy"), init_pose)
        mesh_path = batch["mesh_file_path"][i]
        with open(os.path.join(save_dir, "mesh_file_path.txt"), "w") as f:
            f.write(str(mesh_path))


def save_breakdown_records(out_dir: str, batch: dict, results: dict, n_real: int) -> None:
    """One JSONL record per shape with per-part correctness, the ref mask, and part
    scales — the offline failure-analysis feed (scripts/engine_breakdown.py aggregates
    by part count and part size; no reference analogue — its evaluator only exposes the
    batch means, evaluator.py:84-117)."""
    import json as _json

    os.makedirs(out_dir, exist_ok=True)
    valids = np.asarray(batch["part_valids"])[:n_real]
    ref = np.asarray(batch["ref_part"])[:n_real].astype(bool)
    per_part = np.asarray(results["acc_per_part"]).astype(bool)
    scales = np.asarray(batch["part_scale"])[:n_real].reshape(n_real, -1)
    with open(os.path.join(out_dir, "breakdown.jsonl"), "a") as fh:
        for i in range(n_real):
            m = valids[i] == 1
            fh.write(_json.dumps({
                "data_id": int(np.asarray(batch["data_id"])[i]),
                "num_parts": int(m.sum()),
                "part_acc": float(results["part_acc"][i]),
                "part_acc_nonref": float(results["part_acc_nonref"][i]),
                "acc_per_part": per_part[i][m].astype(int).tolist(),
                "ref_part": ref[i][m].astype(int).tolist(),
                "part_scale": [round(float(s), 5) for s in scales[i][m]],
                "n_merged_pairs": int(np.asarray(results["n_merged_pairs"])[i]),
                "n_iters": int(np.asarray(results["n_iters"])[i]),
            }) + "\n")


def run_inference(cfg: Config, max_batches: int | None = None) -> dict:
    from puzzlefusion_plusplus_tpu.parallel import (
        data_parallel_mesh,
        pad_batch_to_devices,
        shard_batch,
    )

    engine = build_engine_fn(cfg)
    # data-parallel inference over every available chip (the reference is locked to one GPU
    # at batch 1, docs/test.md:8): the batch dim is sharded over the mesh and XLA partitions
    # the vmapped engine SPMD — assemblies/sec scales with chips
    mesh = data_parallel_mesh(cfg.trainer.num_devices)
    n_dev = mesh.devices.size
    ds = DenoiserDataset(
        cfg.data.data_val_dir, mode="test", matching_data_path=cfg.data.matching_data_path,
        max_num_part=cfg.data.max_num_part, overfit=cfg.data.overfit,
    )
    # part-count bucketing (data/bucketing.py): serve part-count-sorted batches, each sliced
    # to the smallest bucket pad that fits it — one XLA specialization per distinct pad,
    # large savings on every under-filled batch, bitwise-safe (padding-invariant engine)
    bucket_mult = cfg.inference.part_bucket_multiple
    order = (
        np.argsort(ds.num_parts_list(), kind="stable") if bucket_mult and len(ds) else None
    )
    loader = Loader(ds, cfg.inference.batch_size, shuffle=False, drop_last=False,
                    seed=cfg.trainer.seed, order=order)
    out_dir = os.path.join(
        cfg.trainer.output_dir, cfg.trainer.experiment_name, "inference",
        cfg.inference.inference_dir,
    )
    rng = jax.random.key(cfg.trainer.seed)
    metrics: dict[str, list] = {"part_acc": [], "part_acc_nonref": [], "shape_cd": [],
                                "rmse_r": [], "rmse_t": []}
    for bi, batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        if bucket_mult:
            P_b = part_bucket(
                int(np.max(batch["num_parts"])), bucket_mult, cap=cfg.data.max_num_part
            )
            batch = slice_batch_parts(batch, P_b)
        sample = {k: np.asarray(batch[k]) for k in SAMPLE_KEYS}
        n_real = sample["part_pcs"].shape[0]
        if n_dev > 1:
            sample, _ = pad_batch_to_devices(sample, n_dev)
        sample = shard_batch({k: jnp.asarray(v) for k, v in sample.items()}, mesh)
        rng, k = jax.random.split(rng)
        rngs = jax.random.split(k, sample["part_pcs"].shape[0])
        results = jax.device_get(engine(sample, rngs))
        results = {k2: np.asarray(v)[:n_real] for k2, v in results.items()}
        for name in metrics:
            metrics[name].extend(np.asarray(results[name]).tolist())
        if cfg.inference.save_trajectories:
            save_inference_artifacts(out_dir, batch, results)
        if cfg.inference.save_breakdown:
            save_breakdown_records(out_dir, batch, results, n_real)
    agg = {f"eval/{k}": float(np.mean(v)) for k, v in metrics.items() if v}
    agg["num_samples"] = len(metrics["part_acc"])
    return agg


def main(argv=None):
    cfg = config_from_argv(argv if argv is not None else sys.argv[1:])
    agg = run_inference(cfg)
    print(agg)


if __name__ == "__main__":
    main()
