"""Part-count bucketing (data/bucketing.py): a batch served at a smaller part pad must
reproduce the full-pad engine run on its valid parts — the padding-invariance property that
makes bucketed serving safe. Relies on the per-part fold_in rng streams in
inference/engine.py::_per_part_normal.

Tolerance note (measured, .smoke/bucket_debug.py): single forwards are pad-invariant to
float-epsilon (~5e-7 — only the matmul reduction GROUPING over the token axis changes), but
the 20-step DDPM recurrence multiplies by 1/sqrt(abar) (up to ~180 at t~999), so with
RANDOM denoiser weights (expansive map) the epsilon grows ~30x per step and saturates at
O(1) late in the trajectory while every DISCRETE outcome (part_acc, merge decisions) stays
identical. The tight trajectory asserts therefore run either on early steps or with damped
(contractive) weights; full-trajectory asserts are discrete/statistical."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.helpers import jit_init

from puzzlefusion_plusplus_tpu.data import generate_dataset
from puzzlefusion_plusplus_tpu.data.bucketing import (
    EDGE_KEYS,
    edge_budget,
    part_bucket,
    slice_batch_parts,
)
from puzzlefusion_plusplus_tpu.data.datasets import DenoiserDataset
from puzzlefusion_plusplus_tpu.data.loader import Loader
from puzzlefusion_plusplus_tpu.inference.run import SAMPLE_KEYS, build_engine_fn
from puzzlefusion_plusplus_tpu.utils.config import Config


def test_part_bucket_rounding():
    assert part_bucket(3) == 4
    assert part_bucket(4) == 4
    assert part_bucket(5) == 8
    assert part_bucket(12) == 12
    assert part_bucket(13) == 16
    assert part_bucket(20) == 20
    assert part_bucket(2, multiple=4) == 4
    assert part_bucket(5, cap=5) == 5  # cap below the multiple roundup wins
    with pytest.raises(ValueError):
        part_bucket(21)


def _small_cfg():
    cfg = Config()
    cfg.data.max_num_part = 8
    cfg.data.num_pc_points = 96
    cfg.denoiser.embed_dim = 32
    cfg.denoiser.num_layers = 1
    cfg.denoiser.num_heads = 2
    cfg.verifier.embed_dim = 32
    cfg.verifier.num_layers = 1
    cfg.verifier.num_heads = 2
    cfg.verifier.max_iters = 2
    return cfg


@pytest.fixture(scope="module")
def bucket_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucket"))
    generate_dataset(root, num_shapes=2, seed=5, split="val", min_parts=3, max_parts=4,
                     n_points=96)
    cfg = _small_cfg()

    import puzzlefusion_plusplus_tpu.training.denoiser as tden
    from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE

    orig = tden.make_ae_model
    tden.make_ae_model = lambda cfg: VQVAE(
        n_embeddings=32, embedding_dim=16, num_point=25, num_dim=64,
        sa_npoints=(24, 12), sa_nsamples=(8, 8, 8),
    )
    ds = DenoiserDataset(
        root + "/pc_data/val", mode="test", matching_data_path=root + "/matching_data",
        max_num_part=8, max_corr=32, max_edges_dense=24,
    )
    batch = next(iter(Loader(ds, 2, shuffle=False, drop_last=False)))
    engine = build_engine_fn(cfg)
    yield cfg, engine, batch
    tden.make_ae_model = orig


def test_slice_preserves_valid_content(bucket_setup):
    _, _, batch = bucket_setup
    P_b = part_bucket(int(np.max(batch["num_parts"])))
    sliced = slice_batch_parts(batch, P_b)
    assert sliced["part_pcs"].shape[1] == P_b
    # every valid part and every valid edge survives the slice
    np.testing.assert_array_equal(
        batch["part_valids"][:, :P_b], sliced["part_valids"]
    )
    assert batch["part_valids"][:, P_b:].sum() == 0
    E_b = edge_budget(P_b)
    np.testing.assert_array_equal(
        batch["match_edge_valid"][:, :E_b], sliced["match_edge_valid"]
    )
    assert not batch["match_edge_valid"][:, E_b:].any()
    for k in EDGE_KEYS:
        assert sliced[k].shape[1] == E_b, k


def test_slice_rejects_undersized_bucket(bucket_setup):
    _, _, batch = bucket_setup
    with pytest.raises(ValueError):
        slice_batch_parts(batch, int(np.max(batch["num_parts"])) - 1)


def test_single_forward_pad_invariance(bucket_setup):
    """Frozen-encoder features and denoiser forward for VALID parts are pad-invariant to
    float epsilon — the actual masking property (no recurrence amplification here)."""
    cfg, _, batch = bucket_setup
    from puzzlefusion_plusplus_tpu.inference import run as R
    from puzzlefusion_plusplus_tpu.inference.sampler import (
        build_feature_cache,
        extract_features,
    )
    from puzzlefusion_plusplus_tpu.training.denoiser import (
        load_frozen_encoder,
        make_model as mk_den,
    )

    den, enc = mk_den(cfg), load_frozen_encoder(cfg)
    dp = R._init_denoiser_params(cfg, den)
    P_b = part_bucket(int(np.max(batch["num_parts"])))
    sliced = slice_batch_parts(batch, P_b)

    B, P_full = batch["part_valids"].shape
    noisy_full = jax.vmap(lambda k: jax.random.normal(k, (P_full, 7)))(
        jax.random.split(jax.random.key(0), B)
    )

    @jax.jit
    def fwd(b):
        pcs = jnp.asarray(b["part_pcs"])
        valids = jnp.asarray(b["part_valids"], jnp.float32)
        noisy = noisy_full[:, : pcs.shape[1]]  # same per-part noise at every pad
        cache = build_feature_cache(enc, pcs, valids)
        latent, xyz = extract_features(enc, pcs, valids, noisy, cache)
        out = den.apply(
            {"params": dp}, noisy, jnp.zeros((pcs.shape[0],), jnp.int32), latent, xyz,
            valids, jnp.asarray(b["part_scale"]), jnp.asarray(b["ref_part"], bool),
            train=False,
        )
        return latent, xyz, out

    keys = ("part_pcs", "part_valids", "part_scale", "ref_part")
    lat_f, xyz_f, out_f = jax.device_get(fwd({k: jnp.asarray(batch[k]) for k in keys}))
    lat_b, xyz_b, out_b = jax.device_get(fwd({k: jnp.asarray(sliced[k]) for k in keys}))
    valid = np.asarray(batch["part_valids"][:, :P_b]) > 0
    np.testing.assert_allclose(
        np.asarray(lat_f)[:, :P_b][valid], np.asarray(lat_b)[valid], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(xyz_f)[:, :P_b][valid], np.asarray(xyz_b)[valid], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_f)[:, :P_b][valid], np.asarray(out_b)[valid], atol=1e-4
    )


def test_loader_bucketed_batches(bucket_setup):
    """bucket_key batching: no batch mixes buckets, every sample is served once per epoch,
    and batch order is shuffled across buckets."""
    _, _, _ = bucket_setup
    import numpy as np

    class _DS:
        def __init__(self, counts):
            self.counts = counts

        def __len__(self):
            return len(self.counts)

        def get(self, i, rng):
            return {"i": np.int64(i), "c": np.int64(self.counts[i])}

    counts = [3, 7, 4, 8, 3, 6, 4, 7, 3, 5]
    key = [part_bucket(c) for c in counts]
    ds = _DS(counts)
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=False, seed=1,
                    bucket_key=key)
    seen = []
    for b in loader:
        ks = {part_bucket(int(c)) for c in b["c"]}
        assert len(ks) == 1, "batch mixes part-count buckets"
        seen.extend(int(i) for i in b["i"])
    assert sorted(seen) == list(range(10))
    assert len(loader) == len([*iter(Loader(ds, 2, shuffle=False, drop_last=False,
                                            bucket_key=key))])
    # drop_last drops per-bucket remainders only
    n_full = sum(
        np.bincount(key)[k] // 2 for k in np.unique(key)
    )
    assert len(Loader(ds, 2, shuffle=True, drop_last=True, bucket_key=key)) == n_full


def test_bucketed_denoiser_training_runs(bucket_setup, tmp_path):
    """Denoiser training with data.part_bucket_multiple: homogeneous bucket batches are
    sliced to their pad and the jitted train step re-specializes per pad — loss finite."""
    cfg, _, _ = bucket_setup
    import dataclasses

    from puzzlefusion_plusplus_tpu.data import generate_dataset as gen
    from puzzlefusion_plusplus_tpu.training import denoiser as tden

    root = str(tmp_path / "bktrain")
    gen(root, num_shapes=4, seed=9, split="train", min_parts=3, max_parts=6, n_points=96)
    cfg2 = dataclasses.replace(cfg)
    cfg2.data = dataclasses.replace(cfg.data)
    cfg2.denoiser = dataclasses.replace(cfg.denoiser)
    cfg2.trainer = dataclasses.replace(cfg.trainer)
    cfg2.data.data_dir = root + "/pc_data/train"
    cfg2.data.data_val_dir = root + "/pc_data/train"
    cfg2.data.batch_size = 2
    cfg2.data.val_batch_size = 2
    cfg2.data.part_bucket_multiple = 4
    cfg2.denoiser.epochs = 1
    cfg2.trainer.num_devices = 1  # batches of 2 don't divide the 8-device test mesh
    cfg2.trainer.output_dir = str(tmp_path / "out")
    state = tden.train(cfg2, max_steps=2)
    import os

    log = os.path.join(str(tmp_path / "out"), cfg2.trainer.experiment_name, "denoiser",
                       "metrics.jsonl")
    assert os.path.exists(log)
    import json

    rows = [json.loads(l) for l in open(log)]
    assert rows and all(np.isfinite(r["mse_loss"]) for r in rows if "mse_loss" in r)


def test_bucketed_vqvae_loss_pad_invariant(bucket_setup, tmp_path):
    """VQ-VAE loss is computed over slot-masked compacted parts, so slicing a batch to its
    bucket pad must leave the loss unchanged (compute drops from B*P_full to B*P_b slots)."""
    from puzzlefusion_plusplus_tpu.data.datasets import VQVAEDataset
    from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE
    from puzzlefusion_plusplus_tpu.training import vqvae as tvq

    root = str(tmp_path / "vq")
    # max_parts=4 guarantees bucket pad 4 < the dataset pad 8 whatever the rng draws
    generate_dataset(root, num_shapes=3, seed=21, split="train", min_parts=3, max_parts=4,
                     n_points=96)
    ds = VQVAEDataset(root + "/pc_data/train", max_num_part=8)
    np.testing.assert_array_equal(ds.num_parts_list(),
                                  [int(s["num_parts"]) for s in ds.data_list])
    batch = next(iter(Loader(ds, 3, shuffle=False, drop_last=False)))
    model = VQVAE(n_embeddings=32, embedding_dim=16, num_point=24, num_dim=64,
                  local_decode_pts=4, sa_npoints=(24, 12), sa_nsamples=(8, 8, 8))
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "data_id"}
    flat, _ = tvq._flatten_compact(jb)
    variables = jit_init(model, jax.random.key(0), flat, train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    P_b = part_bucket(int(np.max(batch["num_parts"])))
    assert P_b < batch["part_pcs"].shape[1]
    sliced = slice_batch_parts(batch, P_b)
    jb_s = {k: jnp.asarray(v) for k, v in sliced.items() if k != "data_id"}
    jloss = jax.jit(tvq.loss_fn, static_argnums=(2,), static_argnames=("train",))
    loss_f, (m_f, _) = jloss(params, stats, model, jb, train=False)
    loss_b, (m_b, _) = jloss(params, stats, model, jb_s, train=False)
    np.testing.assert_allclose(float(loss_f), float(loss_b), rtol=1e-5)
    np.testing.assert_allclose(float(m_f["cd_loss"]), float(m_b["cd_loss"]), rtol=1e-5)

    # train mode: MaskedBatchNorm zero-weights the compaction repeats, so the train-mode
    # loss AND the updated batch statistics are bucket-pad-invariant too (the repeats'
    # count varies with the pad; unweighted BN stats would differ between pads)
    loss_tf, (_, stats_f) = jloss(params, stats, model, jb, train=True)
    loss_tb, (_, stats_b) = jloss(params, stats, model, jb_s, train=True)
    np.testing.assert_allclose(float(loss_tf), float(loss_tb), rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        stats_f, stats_b,
    )


def test_bucketed_vqvae_training_runs(bucket_setup, tmp_path):
    """VQ-VAE training with data.part_bucket_multiple: bucket-homogeneous batches sliced to
    their pad, jitted step re-specializes per pad — loss finite."""
    cfg, _, _ = bucket_setup
    import dataclasses
    import json
    import os

    from puzzlefusion_plusplus_tpu.training import vqvae as tvq

    root = str(tmp_path / "vqtrain")
    generate_dataset(root, num_shapes=4, seed=22, split="train", min_parts=3, max_parts=6,
                     n_points=96)
    cfg2 = dataclasses.replace(cfg)
    cfg2.data = dataclasses.replace(cfg.data)
    cfg2.ae = dataclasses.replace(cfg.ae)
    cfg2.trainer = dataclasses.replace(cfg.trainer)
    cfg2.data.data_dir = root + "/pc_data/train"
    cfg2.data.data_val_dir = root + "/pc_data/train"
    cfg2.data.batch_size = 2
    cfg2.data.val_batch_size = 2
    cfg2.data.part_bucket_multiple = 4
    cfg2.ae.epochs = 1
    cfg2.trainer.num_devices = 1
    cfg2.trainer.output_dir = str(tmp_path / "vqout")
    from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE

    orig = tvq.make_model
    tvq.make_model = lambda c: VQVAE(n_embeddings=32, embedding_dim=16, num_point=24,
                                     num_dim=64, local_decode_pts=4,
                                     sa_npoints=(24, 12), sa_nsamples=(8, 8, 8))
    try:
        tvq.train(cfg2, max_steps=2)
    finally:
        tvq.make_model = orig
    log = os.path.join(str(tmp_path / "vqout"), cfg2.trainer.experiment_name, "vqvae",
                       "metrics.jsonl")
    rows = [json.loads(l) for l in open(log)]
    assert rows and all(np.isfinite(r["total_loss"]) for r in rows if "total_loss" in r)


def _run(engine, batch, rngs):
    sample = {k: jnp.asarray(batch[k]) for k in SAMPLE_KEYS}
    return jax.device_get(engine(sample, rngs))


def test_bucketed_engine_matches_full_pad(bucket_setup):
    """Full engine at the bucket pad: early trajectory steps match tightly, discrete
    part_acc matches exactly, continuous metrics to a few percent (see module tolerance
    note — random weights make the 20-step recurrence expansive)."""
    cfg, engine, batch = bucket_setup
    rngs = jax.random.split(jax.random.key(11), 2)
    full = _run(engine, batch, rngs)

    P_b = part_bucket(int(np.max(batch["num_parts"])))
    assert P_b < batch["part_pcs"].shape[1]
    sliced = slice_batch_parts(batch, P_b)
    bucketed = _run(engine, sliced, rngs)

    S = cfg.verifier.max_iters * cfg.denoiser.num_inference_steps
    assert bucketed["trajectory"].shape == (2, S, P_b, 7)
    valid = np.asarray(batch["part_valids"][:, :P_b]) > 0  # [B, P_b]
    ft = np.asarray(full["trajectory"])[:, :, :P_b]
    bt = np.asarray(bucketed["trajectory"])
    for s in range(2):
        np.testing.assert_allclose(
            ft[s][:2][:, valid[s]], bt[s][:2][:, valid[s]], atol=1e-3,
            err_msg="early trajectory steps",
        )
    np.testing.assert_array_equal(full["part_acc"], bucketed["part_acc"])
    # random (expansive) weights: late-trajectory epsilon saturates at O(1), so continuous
    # metrics only agree statistically — the tight full-trajectory guarantee is the damped-
    # weights merge test below
    for k in ("shape_cd", "rmse_r", "rmse_t"):
        np.testing.assert_allclose(full[k], bucketed[k], rtol=0.5, err_msg=k)


def test_bucketed_engine_matches_full_pad_with_merges(bucket_setup):
    """Same property with damped (contractive) denoiser weights — no chaos amplification —
    and the verifier threshold dropped so merges actually fire: trajectories stay tight AND
    the discrete graph decisions (merged parts, pivots) are pad-invariant."""
    cfg, _, batch = bucket_setup
    from puzzlefusion_plusplus_tpu.inference import run as R
    from puzzlefusion_plusplus_tpu.inference.engine import (
        AgglConfig,
        auto_agglomerate_batch,
    )
    from puzzlefusion_plusplus_tpu.models.scheduler import DDPMParams
    from puzzlefusion_plusplus_tpu.training.denoiser import (
        load_frozen_encoder,
        make_model as mk_den,
    )
    from puzzlefusion_plusplus_tpu.training.verifier import make_model as mk_ver

    den, ver, enc = mk_den(cfg), mk_ver(cfg), load_frozen_encoder(cfg)
    dp = jax.tree.map(lambda x: 0.05 * x, R._init_denoiser_params(cfg, den))
    vp = jax.tree.map(lambda x: 0.05 * x, R._init_verifier_params(cfg, ver))
    ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
    # threshold under the damped verifier's ~0.5 sigmoid -> every valid edge classifies
    acfg = AgglConfig(max_iters=3, threshold=0.2)

    def dapply(noisy, t, latent, xyz, valids, scale, ref):
        return den.apply(
            {"params": dp}, noisy, t, latent, xyz, valids, scale, ref, train=False
        )

    def vapply(feats, indices, valids):
        return ver.apply({"params": vp}, feats, indices, valids, train=False)

    rngs = jax.random.split(jax.random.key(7), 2)

    def run_at(b):
        sample = {k: jnp.asarray(b[k]) for k in R.SAMPLE_KEYS}
        return jax.device_get(
            jax.jit(lambda bb, r: auto_agglomerate_batch(dapply, vapply, enc, ddpm, bb, r,
                                                         acfg))(sample, rngs)
        )

    full = run_at(batch)
    P_b = part_bucket(int(np.max(batch["num_parts"])))
    bucketed = run_at(slice_batch_parts(batch, P_b))

    assert bool(np.asarray(full["final_state"].classified).any()), "merges never fired"
    np.testing.assert_array_equal(
        np.asarray(full["final_state"].pivot)[:, :P_b],
        np.asarray(bucketed["final_state"].pivot),
    )
    np.testing.assert_array_equal(
        np.asarray(full["final_state"].part_valids)[:, :P_b],
        np.asarray(bucketed["final_state"].part_valids),
    )
    valid = np.asarray(batch["part_valids"][:, :P_b]) > 0
    np.testing.assert_allclose(
        np.asarray(full["pred_trans"])[:, :P_b][valid],
        np.asarray(bucketed["pred_trans"])[valid],
        atol=1e-3,
    )
