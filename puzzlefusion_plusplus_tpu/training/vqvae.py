"""Stage-1 VQ-VAE training (the reference's train_vqvae.py + FractureAE, TPU data-parallel).

Loss semantics match FractureAE + VQVAE.loss (vqvae/model/fracture_ae.py:43-60,
vq_vae.py:75-88): bidirectional chamfer between the 1000-point reconstruction and the input
part cloud with chamferdist default reductions (per-part point sum, mean over parts), plus the
quantizer embedding loss — here masked over compacted valid part slots instead of boolean
flattening (utils/masking.py).

Parallelism: batches sharded over the ``data`` mesh axis, params replicated; the jitted step's
gradient mean IS the DDP all-reduce (parallel/mesh.py docstring).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.data import Loader, VQVAEDataset, prefetch_batches
from puzzlefusion_plusplus_tpu.data.bucketing import part_bucket, slice_batch_parts
from puzzlefusion_plusplus_tpu.models.vqvae import VQVAE
from puzzlefusion_plusplus_tpu.ops.chamfer import nn_distance
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
    adamw_multistep,
    create_state,
    jitted_init,
    save_checkpoint,
)
from puzzlefusion_plusplus_tpu.utils.config import Config, config_from_argv
from puzzlefusion_plusplus_tpu.utils.masking import compact_parts, compaction_indices


def make_model(cfg: Config) -> VQVAE:
    return VQVAE(
        n_embeddings=cfg.ae.n_embeddings,
        embedding_dim=cfg.ae.embedding_dim,
        num_point=cfg.ae.num_point,
        num_dim=cfg.ae.num_dim,
        local_decode_pts=cfg.ae.local_decode_pts,
        beta=cfg.ae.beta,
    )


def _flatten_compact(batch: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, P, N, 3] -> compacted [B*P, N, 3] + slot mask [B*P] (fixed-shape fracture_ae:16-29)."""
    pcs, valids = batch["part_pcs"], batch["part_valids"]
    B, P, N, _ = pcs.shape
    _, src, slot_valid = compaction_indices(valids)
    flat = compact_parts(pcs, src).reshape(B * P, N, 3)
    return flat, slot_valid.reshape(B * P)


def loss_fn(params, batch_stats, model: VQVAE, batch: dict, train: bool):
    flat, slot_mask = _flatten_compact(batch)
    variables = {"params": params, "batch_stats": batch_stats}
    out, mutated = model.apply(
        variables,
        flat,
        train=train,
        mask=slot_mask.astype(jnp.float32),
        mutable=["batch_stats"] if train else [],
    )
    recon = model.reconstruction(out)  # [B*P, 1000, 3]
    fwd, _ = nn_distance(recon, flat)
    bwd, _ = nn_distance(flat, recon)
    per_part_cd = fwd.sum(-1) + bwd.sum(-1)  # chamferdist default point_reduction='sum'
    w = slot_mask.astype(per_part_cd.dtype)
    cd_loss = (per_part_cd * w).sum() / jnp.maximum(w.sum(), 1.0)
    total = cd_loss + out["embedding_loss"]
    metrics = {
        "cd_loss": cd_loss,
        "embedding_loss": out["embedding_loss"],
        "perplexity": out["perplexity"],
        "total_loss": total,
    }
    return total, (metrics, mutated.get("batch_stats", batch_stats) if train else batch_stats)


@functools.partial(jax.jit, static_argnames=("model", "tx"), donate_argnames=("state",))
def train_step(state: TrainState, batch: dict, model: VQVAE, tx) -> tuple[TrainState, dict]:
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (metrics, new_stats)), grads = grad_fn(
        state.params, state.batch_stats, model, batch, True
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("model",))
def eval_step(state: TrainState, batch: dict, model: VQVAE) -> dict:
    _, (metrics, _) = loss_fn(state.params, state.batch_stats, model, batch, False)
    return metrics


def numeric_batch(batch: dict) -> dict:
    return {
        k: v for k, v in batch.items()
        if isinstance(v, np.ndarray) and v.dtype != object
    }


def train(cfg: Config, max_steps: int | None = None) -> TrainState:
    model = make_model(cfg)
    mesh = data_parallel_mesh(cfg.trainer.num_devices)
    n_dev = mesh.devices.size

    train_ds = VQVAEDataset(cfg.data.data_dir, cfg.data.max_num_part,
                            cfg.data.min_num_part, cfg.data.overfit)
    val_ds = VQVAEDataset(cfg.data.data_val_dir, cfg.data.max_num_part,
                          cfg.data.min_num_part, cfg.data.overfit)
    # part-count bucketed batching (data/bucketing.py): VQ-VAE compute is proportional to the
    # compacted slot count B*P whatever the validity mask says, so slicing a batch to its
    # bucket pad cuts encoder+chamfer work directly. Slot masking keeps the loss AND the
    # train-mode BatchNorm statistics pad-invariant (MaskedBatchNorm zero-weights the
    # compaction repeats, models/vqvae.py).
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

    steps_per_epoch = max(len(train_loader), 1)
    milestones = tuple(int(m) * steps_per_epoch for m in cfg.ae.lr_milestones)
    tx = adamw_multistep(cfg.ae.lr, milestones, cfg.ae.lr_gamma, cfg.ae.weight_decay)

    rng = jax.random.key(cfg.trainer.seed)
    sample = numeric_batch(next(iter(train_loader)))
    flat, _ = _flatten_compact({k: jnp.asarray(v) for k, v in sample.items()})
    variables = jitted_init(model, rng, flat, train=False)
    state = replicate(create_state(variables, tx), mesh)

    out_dir = f"{cfg.trainer.output_dir}/{cfg.trainer.experiment_name}/vqvae"
    logger = MetricsLogger(out_dir)
    # top-k on val cd_loss, mode=min (reference monitors val_loss/cd_loss,
    # config/ae/global_config.yaml:42-50)
    topk = TopKCheckpointer(f"{out_dir}/ckpt", monitor="val_cd_loss", mode="min",
                            top_k=cfg.trainer.ckpt_top_k)
    state = maybe_restore(state, f"{out_dir}/ckpt", cfg.ae.ckpt_path)
    # resume step from the restored state (keeps step_N checkpoint names collision-free)
    step = int(state.step)
    start_epoch = min(step // max(len(train_loader), 1), cfg.ae.epochs)
    for epoch in range(start_epoch, cfg.ae.epochs):
        for batch in prefetch_batches(train_loader):
            state, metrics = train_step(state, shard_batch(_slice(numeric_batch(batch)), mesh),
                                        model, tx)
            if step % cfg.trainer.log_every == 0:
                logger.log(step, epoch=epoch, **jax.device_get(metrics))
            step += 1
            if max_steps is not None and step >= max_steps:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
                return state
        if (epoch + 1) % cfg.trainer.ckpt_every_epochs == 0 or epoch + 1 == cfg.ae.epochs:
            vals = []
            for batch in val_loader:
                padded, n_real = pad_batch_to_devices(_slice(numeric_batch(batch)), n_dev)
                m = eval_step(state, shard_batch(padded, mesh), model)
                vals.append(float(m["cd_loss"]))
            if vals:
                val_cd = float(np.mean(vals))
                logger.log(step, epoch=epoch, val_cd_loss=val_cd)
                topk.save(state, step, val_cd)
            else:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
    return state


def main(argv=None):
    cfg = config_from_argv(argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
