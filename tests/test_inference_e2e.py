"""End-to-end inference engine test: full denoise-verify-merge on synthetic data (small
shapes, random weights) — checks shapes, finiteness, artifact contract, and determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from puzzlefusion_plusplus_tpu.data import generate_dataset
from puzzlefusion_plusplus_tpu.data.datasets import DenoiserDataset
from puzzlefusion_plusplus_tpu.data.loader import Loader
from puzzlefusion_plusplus_tpu.inference.run import (
    SAMPLE_KEYS,
    build_engine_fn,
    save_inference_artifacts,
)
from puzzlefusion_plusplus_tpu.utils.config import Config


@pytest.fixture(scope="module")
def small_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    generate_dataset(root, num_shapes=2, seed=1, split="val", min_parts=3, max_parts=4,
                     n_points=96)
    cfg = Config()
    cfg.data.max_num_part = 5
    cfg.data.num_pc_points = 96
    cfg.denoiser.embed_dim = 32
    cfg.denoiser.num_layers = 1
    cfg.denoiser.num_heads = 2
    cfg.verifier.embed_dim = 32
    cfg.verifier.num_layers = 1
    cfg.verifier.num_heads = 2
    cfg.verifier.max_iters = 2

    import puzzlefusion_plusplus_tpu.training.denoiser as tden
    from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE

    orig = tden.make_ae_model
    tden.make_ae_model = lambda cfg: VQVAE(
        n_embeddings=32, embedding_dim=16, num_point=25, num_dim=64,
        sa_npoints=(24, 12), sa_nsamples=(8, 8, 8),
    )
    ds = DenoiserDataset(
        root + "/pc_data/val", mode="test", matching_data_path=root + "/matching_data",
        max_num_part=5, max_corr=32, max_edges_dense=24,
    )
    batch = next(iter(Loader(ds, 2, shuffle=False, drop_last=False)))
    engine = build_engine_fn(cfg)
    yield cfg, engine, batch, root
    tden.make_ae_model = orig


def test_engine_end_to_end(small_setup):
    cfg, engine, batch, root = small_setup
    sample = {k: jnp.asarray(batch[k]) for k in SAMPLE_KEYS}
    rngs = jax.random.split(jax.random.key(0), 2)
    res = jax.device_get(engine(sample, rngs))
    S = cfg.verifier.max_iters * cfg.denoiser.num_inference_steps
    assert res["trajectory"].shape == (2, S, 5, 7)
    assert np.isfinite(res["trajectory"]).all()
    for k in ("part_acc", "part_acc_nonref", "shape_cd", "rmse_r", "rmse_t"):
        assert np.isfinite(res[k]).all(), k
    assert ((res["part_acc"] >= 0) & (res["part_acc"] <= 1)).all()

    # determinism: same rngs -> identical result
    res2 = jax.device_get(engine(sample, rngs))
    np.testing.assert_array_equal(res["trajectory"], res2["trajectory"])

    # artifact contract (auto_aggl.py:322-357)
    import os

    out_dir = root + "/artifacts"
    save_inference_artifacts(out_dir, batch, res)
    for i in range(2):
        d = os.path.join(out_dir, str(int(batch["data_id"][i])))
        names = sorted(os.listdir(d))
        assert any(n.startswith("predict_") for n in names)
        assert {"gt.npy", "init_pose.npy", "mesh_file_path.txt"} <= set(names)
        traj = np.load(os.path.join(d, [n for n in names if n.startswith("predict_")][0]))
        n_valid = int(batch["part_valids"][i].sum())
        assert traj.shape == (S, n_valid, 7)

    # per-part breakdown records + analyzer (inference/run.py::save_breakdown_records,
    # scripts/engine_breakdown.py) must agree with the engine's own aggregate metrics
    import json
    import sys

    from puzzlefusion_plusplus_tpu.inference.run import save_breakdown_records

    save_breakdown_records(out_dir, batch, res, n_real=2)
    recs = [json.loads(l) for l in open(os.path.join(out_dir, "breakdown.jsonl"))]
    assert len(recs) == 2
    for i, r in enumerate(recs):
        n_valid = int(batch["part_valids"][i].sum())
        assert r["num_parts"] == n_valid
        assert len(r["acc_per_part"]) == len(r["ref_part"]) == len(r["part_scale"]) == n_valid
        assert abs(np.mean(r["acc_per_part"]) - r["part_acc"]) < 1e-6
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from engine_breakdown import analyze

    agg = analyze(recs)
    assert agg["n_shapes"] == 2
    assert agg["acc_ref_parts"] == 1.0  # pinned to GT by construction
    assert 0.0 <= agg["acc_all_parts"] <= 1.0
    assert agg["n_parts_total"] == sum(r["num_parts"] for r in recs)


def test_batched_engine_matches_vmapped_single(small_setup):
    """auto_agglomerate_batch (batch-global merge gating + early-exit while_loop) must
    reproduce vmap(auto_agglomerate) exactly — same phases, same rng streams; only the
    control flow around the merge geometry differs."""
    cfg, _, batch, _ = small_setup
    from puzzlefusion_plusplus_tpu.inference import run as R
    from puzzlefusion_plusplus_tpu.inference.engine import (
        AgglConfig,
        auto_agglomerate,
        auto_agglomerate_batch,
    )
    from puzzlefusion_plusplus_tpu.models.scheduler import DDPMParams
    from puzzlefusion_plusplus_tpu.training.denoiser import (
        load_frozen_encoder,
        make_model as mk_den,
    )
    from puzzlefusion_plusplus_tpu.training.verifier import make_model as mk_ver

    den, ver, enc = mk_den(cfg), mk_ver(cfg), load_frozen_encoder(cfg)
    dp = R._init_denoiser_params(cfg, den)
    vp = R._init_verifier_params(cfg, ver)
    ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
    # low threshold so the random-weight verifier classifies edges and merges actually fire
    acfg = AgglConfig(max_iters=3, threshold=0.2)

    def dapply(noisy, t, latent, xyz, valids, scale, ref):
        return den.apply(
            {"params": dp}, noisy, t, latent, xyz, valids, scale, ref, train=False
        )

    def vapply(feats, indices, valids):
        return ver.apply({"params": vp}, feats, indices, valids, train=False)

    sample = {k: jnp.asarray(batch[k]) for k in R.SAMPLE_KEYS}
    rngs = jax.random.split(jax.random.key(3), 2)

    single = jax.jit(
        jax.vmap(lambda s, r: auto_agglomerate(dapply, vapply, enc, ddpm, s, r, acfg))
    )(sample, rngs)
    batched = jax.jit(
        lambda b, r: auto_agglomerate_batch(dapply, vapply, enc, ddpm, b, r, acfg)
    )(sample, rngs)

    merged_any = bool(np.asarray(batched["final_state"].classified).any())
    for k in ("pred_trans", "pred_rots", "trajectory"):
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(batched[k]), atol=1e-5,
            err_msg=f"{k} (merges fired: {merged_any})",
        )
    np.testing.assert_array_equal(
        np.asarray(single["final_state"].pivot), np.asarray(batched["final_state"].pivot)
    )
    np.testing.assert_array_equal(
        np.asarray(single["final_state"].part_valids),
        np.asarray(batched["final_state"].part_valids),
    )
