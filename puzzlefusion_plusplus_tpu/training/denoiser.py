"""Stage-2 denoiser training (the reference's train_denoiser.py + Denoiser module).

Semantics (denoiser/model/denoiser.py):
  * forward (:80-116): sample t ~ U[0, 1000) per shape, add piecewise-DDPM noise to the GT
    7-DoF poses, pin reference parts to GT, extract frozen-VQVAE features of the rotated
    clouds, predict epsilon.
  * loss (:118-126): MSE(pred, noise) masked to valid non-reference parts.
  * validation (:153-209): full 20-step reverse loop (inference/sampler.py lax.scan) followed
    by part-acc / shape-CD / rotation+translation RMSE metrics.
  * optimizer (:228-236): AdamW lr 2e-4 betas (0.95, 0.999) wd 1e-6.

The frozen encoder comes from a stage-1 orbax checkpoint (the reference's 'ae.' key-remap
load, train_denoiser.py:30-35).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.data import DenoiserDataset, Loader, prefetch_batches
from puzzlefusion_plusplus_tpu.data.bucketing import part_bucket, slice_batch_parts
from puzzlefusion_plusplus_tpu.inference.sampler import (
    FrozenEncoder,
    build_feature_cache,
    ddpm_sample,
    extract_features,
    make_frozen_encoder,
)
from puzzlefusion_plusplus_tpu.models.denoiser import DenoiserTransformer
from puzzlefusion_plusplus_tpu.models.scheduler import (
    DDPMParams,
    add_noise,
    leading_timesteps,
)
from puzzlefusion_plusplus_tpu.parallel import (
    data_parallel_mesh,
    pad_batch_to_devices,
    replicate,
    shard_batch,
)
from puzzlefusion_plusplus_tpu.training.state import (
    maybe_restore,
    MetricsLogger,
    TopKCheckpointer,
    TrainState,
    adamw_reference,
    create_state,
    jitted_init,
    load_model_params,
    save_checkpoint,
)
from puzzlefusion_plusplus_tpu.training.vqvae import make_model as make_ae_model
from puzzlefusion_plusplus_tpu.utils.config import Config, config_from_argv
from puzzlefusion_plusplus_tpu.utils.metrics import (
    calc_part_acc,
    calc_shape_cd,
    rot_metrics,
    trans_metrics,
)


def make_model(cfg: Config) -> DenoiserTransformer:
    return DenoiserTransformer(
        embed_dim=cfg.denoiser.embed_dim,
        num_layers=cfg.denoiser.num_layers,
        num_heads=cfg.denoiser.num_heads,
        num_dim=cfg.denoiser.num_dim,
        num_point=cfg.denoiser.num_point,
        max_parts=cfg.data.max_num_part,
        multires=cfg.denoiser.multires,
        dropout=cfg.denoiser.dropout,
        pe_dropout=cfg.denoiser.pe_dropout,
        # reference table size is 6*embed_dim (3072 at width 512, always > the 1000 train
        # timesteps); small test widths would undershoot the timestep range, and flax Embed's
        # fill-mode gather turns an out-of-range timestep into NaN — keep every timestep
        # in range while preserving exact row-count parity at the production width
        num_ada_embeds=max(6 * cfg.denoiser.embed_dim, cfg.denoiser.ddpm_train_steps),
        dtype=jnp.bfloat16 if cfg.trainer.precision == "bf16" else None,
    )


def loss_fn(params, model, encoder: FrozenEncoder, ddpm: DDPMParams, batch, rng, train,
            timestep_set=None, encode_cached=False):
    """``timestep_set``: optional [S] array of allowed training timesteps (the
    train_on_inference_timesteps option); None = t ~ U[0, num_train_timesteps).

    ``encode_cached``: route the frozen-encoder forward through the geometry-cache +
    rotation-folding path the inference engine uses (build_feature_cache: grouped relative
    coordinates gathered ONCE on the unrotated clouds, per-part rotation folded into each SA
    stage's first Dense; on TPU each stage then runs as one fused Pallas kernel,
    ops/sa_fused_pallas.py). Identical semantics to rotate-then-encode — rotation commutes
    with FPS/ball-query/gather-recenter — minus float-association jitter. Viable at training
    batch sizes thanks to part-count bucketing (the r2 attempt at the global P=20 pad OOMed,
    see VALIDATION.md); cfg.denoiser.train_encode_cached gates it."""
    gt = jnp.concatenate([batch["part_trans"], batch["part_rots"]], axis=-1)  # [B, P, 7]
    ref = batch["ref_part"].astype(bool)
    B = gt.shape[0]
    t_rng, n_rng, d_rng = jax.random.split(rng, 3)
    if timestep_set is None:
        timesteps = jax.random.randint(t_rng, (B,), 0, ddpm.num_train_timesteps)
    else:
        timesteps = timestep_set[
            jax.random.randint(t_rng, (B,), 0, timestep_set.shape[0])
        ]
    noise = jax.random.normal(n_rng, gt.shape, gt.dtype)
    noisy = add_noise(ddpm, gt, noise, timesteps)
    noisy = jnp.where(ref[..., None], gt, noisy)

    cache = (
        build_feature_cache(encoder, batch["part_pcs"], batch["part_valids"])
        if encode_cached else None
    )
    latent, xyz = extract_features(
        encoder, batch["part_pcs"], batch["part_valids"], noisy, cache
    )
    # the encoder is FROZEN (reference train_denoiser.py:30-35 requires_grad=False): without
    # stop_gradient JAX still materializes the whole encoder backward for zero trainable grads
    latent = jax.lax.stop_gradient(latent)
    xyz = jax.lax.stop_gradient(xyz)
    pred = model.apply(
        {"params": params},
        noisy, timesteps, latent, xyz,
        batch["part_valids"], batch["part_scale"], ref,
        train=train,
        rngs={"dropout": d_rng} if train else {},
    )
    mask = (batch["part_valids"] > 0) & ~ref  # valid, non-reference (denoiser.py:118-126)
    w = mask[..., None].astype(pred.dtype)
    # F.mse_loss over the selected [M, 7] elements == weighted sum / (M * 7)
    mse = ((pred - noise) ** 2 * w).sum() / jnp.maximum(w.sum() * 7.0, 1.0)
    return mse, {"mse_loss": mse}


@functools.partial(
    jax.jit,
    static_argnames=("model", "encoder", "tx", "encode_cached"),
    donate_argnames=("state",),
)
def train_step(state: TrainState, batch, rng, model, encoder, ddpm, tx, timestep_set=None,
               encode_cached=False):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, model, encoder, ddpm, batch, rng, True,
                                  timestep_set, encode_cached)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return TrainState(new_params, state.batch_stats, new_opt, state.step + 1), metrics


def make_sample_fn(model, encoder: FrozenEncoder, ddpm: DDPMParams, num_inference_steps):
    """Jitted full validation sampler: noise -> 20-step reverse loop -> metrics inputs."""
    timesteps = jnp.asarray(leading_timesteps(ddpm.num_train_timesteps, num_inference_steps))

    @jax.jit
    def sample(params, batch, rng):
        gt = jnp.concatenate([batch["part_trans"], batch["part_rots"]], axis=-1)
        ref = batch["ref_part"].astype(bool)
        reference_vals = jnp.where(ref[..., None], gt, 0.0)
        rng, k = jax.random.split(rng)
        init = jax.random.normal(k, gt.shape, gt.dtype)
        # grouping indices are rotation-invariant: build once, reuse across all 20 steps
        cache = build_feature_cache(encoder, batch["part_pcs"], batch["part_valids"])

        def denoise_fn(noisy, t):
            latent, xyz = extract_features(
                encoder, batch["part_pcs"], batch["part_valids"], noisy, cache
            )
            return model.apply(
                {"params": params}, noisy, t, latent, xyz,
                batch["part_valids"], batch["part_scale"], ref, train=False,
            )

        final, traj = ddpm_sample(
            denoise_fn, ddpm, timesteps, init, ref, reference_vals, rng,
            num_inference_steps,
        )
        return final, traj

    return sample


@jax.jit
def eval_metrics(final, batch):
    pts = batch["part_pcs"] * batch["part_scale"][..., None]  # [B, P, N, 3] world units
    pred_trans, pred_rots = final[..., :3], final[..., 3:]
    gt_trans, gt_rots = batch["part_trans"], batch["part_rots"]
    valids = batch["part_valids"]
    acc, acc_per_part, _ = calc_part_acc(
        pts, pred_trans, gt_trans, pred_rots, gt_rots, valids)
    shape_cd = calc_shape_cd(pts, pred_trans, gt_trans, pred_rots, gt_rots, valids)
    rmse_r = rot_metrics(pred_rots, gt_rots, valids, "rmse")
    rmse_t = trans_metrics(pred_trans, gt_trans, valids, "rmse")
    # part_acc counts ref parts, which are PINNED to GT (auto_aggl.py:96-132 semantics):
    # the structural floor on a 2-20-part mix is ~0.25 with purely random non-ref poses
    # (scripts/part_acc_floor.py). part_acc_nonref measures actual learning.
    nonref = (valids == 1) & ~batch["ref_part"].astype(bool)
    acc_nonref = jnp.where(
        nonref.sum(-1) > 0, (acc_per_part & nonref).sum(-1) / nonref.sum(-1).clip(1), 1.0
    )
    return {"part_acc": acc, "part_acc_nonref": acc_nonref, "shape_cd": shape_cd,
            "rmse_r": rmse_r, "rmse_t": rmse_t}


def numeric_batch(batch: dict) -> dict:
    return {
        k: v for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype != object and k != "graph"
    }


def load_frozen_encoder(cfg: Config) -> FrozenEncoder:
    ae = make_ae_model(cfg)
    if getattr(ae, "remat", False):
        # frozen, forward-only: remat would only act as a fusion barrier inside the scan
        ae = ae.clone(remat=False)
    if cfg.trainer.precision == "bf16":
        # frozen inference-only encoder: run the PN2 stages in bf16 (params stay fp32,
        # code selection stays fp32 — models/vqvae.py encode)
        ae = ae.clone(dtype=jnp.bfloat16)
    if cfg.denoiser.encoder_ckpt_path:
        params, batch_stats = load_model_params(cfg.denoiser.encoder_ckpt_path)
    else:  # untrained encoder (smoke/test runs)
        flat = jnp.zeros((1, cfg.data.num_pc_points, 3))
        variables = jitted_init(ae, jax.random.key(0), flat, train=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
    return make_frozen_encoder(ae, params, batch_stats)


def train(cfg: Config, max_steps: int | None = None) -> TrainState:
    model = make_model(cfg)
    encoder = load_frozen_encoder(cfg)
    ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
    mesh = data_parallel_mesh(cfg.trainer.num_devices)
    n_dev = mesh.devices.size

    train_ds = DenoiserDataset(
        cfg.data.data_dir, mode="train", max_num_part=cfg.data.max_num_part,
        multiple_ref_parts=cfg.denoiser.multiple_ref_parts, overfit=cfg.data.overfit,
    )
    val_ds = DenoiserDataset(
        cfg.data.data_val_dir, mode="val", max_num_part=cfg.data.max_num_part,
        multiple_ref_parts=cfg.denoiser.multiple_ref_parts, overfit=cfg.data.overfit,
    )
    # part-count bucketed batching (data/bucketing.py): batches never mix buckets, each is
    # sliced to its bucket pad below — big step-time savings when most shapes have far
    # fewer than max_num_part parts. Loss masking makes training pad-invariant.
    bucket_mult = cfg.data.part_bucket_multiple

    def _bucket_key(ds):
        if not bucket_mult:
            return None
        return [part_bucket(int(c), bucket_mult, cap=cfg.data.max_num_part)
                for c in ds.num_parts_list()]

    def _slice(batch):
        if not bucket_mult:
            return batch
        P_b = part_bucket(int(np.max(batch["num_parts"])), bucket_mult,
                          cap=cfg.data.max_num_part)
        return slice_batch_parts(batch, P_b)

    train_loader = Loader(train_ds, cfg.data.batch_size, seed=cfg.trainer.seed,
                          bucket_key=_bucket_key(train_ds))
    val_loader = Loader(val_ds, cfg.data.val_batch_size, shuffle=False, drop_last=False,
                        seed=cfg.trainer.seed, bucket_key=_bucket_key(val_ds))

    tx = adamw_reference(cfg.denoiser.lr, cfg.denoiser.b1, cfg.denoiser.b2,
                         cfg.denoiser.weight_decay)
    rng = jax.random.key(cfg.trainer.seed)
    rng, init_rng = jax.random.split(rng)
    P, L = cfg.data.max_num_part, cfg.denoiser.num_point
    variables = jitted_init(
        model, init_rng,
        jnp.zeros((1, P, 7)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, P, L, cfg.denoiser.num_dim)), jnp.zeros((1, P, L, 3)),
        jnp.ones((1, P)), jnp.ones((1, P, 1)), jnp.zeros((1, P), bool),
        train=False,
    )
    state = replicate(create_state(variables, tx), mesh)
    sample_fn = make_sample_fn(model, encoder, ddpm, cfg.denoiser.num_inference_steps)
    timestep_set = (
        jnp.asarray(leading_timesteps(cfg.denoiser.ddpm_train_steps,
                                      cfg.denoiser.num_inference_steps))
        if cfg.denoiser.train_on_inference_timesteps else None
    )

    out_dir = f"{cfg.trainer.output_dir}/{cfg.trainer.experiment_name}/denoiser"
    logger = MetricsLogger(out_dir)
    # top-k retention on the monitored metric (reference ModelCheckpoint: top-3 on
    # eval/part_acc + save_last, config/denoiser/global_config.yaml:42-50)
    topk = TopKCheckpointer(f"{out_dir}/ckpt", monitor="eval_part_acc", mode="max",
                            top_k=cfg.trainer.ckpt_top_k,
                            smooth_k=cfg.trainer.ckpt_smooth_k)
    state = maybe_restore(state, f"{out_dir}/ckpt", cfg.denoiser.ckpt_path)
    # resume the step counter from the restored state: a fresh counter would regenerate the
    # same step_N checkpoint names and corrupt top-k retention (overwrite + metric rebind)
    step = int(state.step)
    # skip epochs already completed by the restored run (approximate under bucketing, where
    # the per-epoch batch count varies slightly with the permutation)
    start_epoch = min(step // max(len(train_loader), 1), cfg.denoiser.epochs)
    for epoch in range(start_epoch, cfg.denoiser.epochs):
        for batch in prefetch_batches(train_loader):
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(
                state, shard_batch(numeric_batch(_slice(batch)), mesh), step_rng,
                model, encoder, ddpm, tx, timestep_set,
                cfg.denoiser.train_encode_cached,
            )
            if step % cfg.trainer.log_every == 0:
                logger.log(step, epoch=epoch, **jax.device_get(metrics))
            step += 1
            if max_steps is not None and step >= max_steps:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
                return state
        if (epoch + 1) % cfg.denoiser.val_every == 0 or epoch + 1 == cfg.denoiser.epochs:
            accs = []
            for batch in val_loader:
                padded, _ = pad_batch_to_devices(numeric_batch(_slice(batch)), n_dev)
                sharded = shard_batch(padded, mesh)
                rng, k = jax.random.split(rng)
                final, _ = sample_fn(state.params, sharded, k)
                m = jax.device_get(eval_metrics(final, sharded))
                accs.append({k2: float(np.mean(v)) for k2, v in m.items()})
            if accs:
                agg = {k2: float(np.mean([a[k2] for a in accs])) for k2 in accs[0]}
                logger.log(step, epoch=epoch, **{f"eval_{k2}": v for k2, v in agg.items()})
                topk.save(state, step, agg["part_acc"])
            else:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
    return state


def main(argv=None):
    cfg = config_from_argv(argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
