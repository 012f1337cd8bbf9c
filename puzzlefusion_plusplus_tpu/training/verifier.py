"""Stage-3 verifier training (the reference's train_verifier.py + Verifier module).

Loss (verifier/model/verifier.py:20-47): BCE-with-logits over valid edges with class weight 0.2
on negatives; accuracy/precision/recall/F1 tracked (torchmetrics equivalents in pure jax).
Optimizer: AdamW lr 2e-4 betas (0.95, 0.999) wd 1e-6, no scheduler (:103-110).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.data import Loader, VerifierDataset, prefetch_batches
from puzzlefusion_plusplus_tpu.models.verifier import VerifierTransformer
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
    save_checkpoint,
)
from puzzlefusion_plusplus_tpu.utils.config import Config, config_from_argv


def make_model(cfg: Config) -> VerifierTransformer:
    return VerifierTransformer(
        embed_dim=cfg.verifier.embed_dim,
        num_layers=cfg.verifier.num_layers,
        num_heads=cfg.verifier.num_heads,
        max_nodes=cfg.verifier.max_nodes,
        num_features=cfg.verifier.num_features,
    )


def binary_cls_metrics(pred: jnp.ndarray, gt: jnp.ndarray, w: jnp.ndarray) -> dict:
    """Masked accuracy / precision / recall / F1 (torchmetrics 'binary' semantics)."""
    tp = (w * pred * gt).sum()
    fp = (w * pred * (1 - gt)).sum()
    fn = (w * (1 - pred) * gt).sum()
    tn = (w * (1 - pred) * (1 - gt)).sum()
    eps = 1e-9
    precision = tp / jnp.maximum(tp + fp, eps)
    recall = tp / jnp.maximum(tp + fn, eps)
    return {
        "cls_acc": (tp + tn) / jnp.maximum(w.sum(), eps),
        "cls_precision": precision,
        "cls_recall": recall,
        "cls_f1_score": 2 * precision * recall / jnp.maximum(precision + recall, eps),
    }


def loss_fn(params, model, batch, negative_weight: float, train: bool, rng=None):
    logits = model.apply(
        {"params": params},
        batch["edge_features"], batch["edge_indices"], batch["edge_valids"],
        train=train,
        rngs={"dropout": rng} if train else {},
    ).squeeze(-1)  # [B, E]
    gt = batch["cls_gt"]
    valid = batch["edge_valids"]
    # weighted BCE-with-logits, weight `negative_weight` on negatives (verifier.py:27)
    per_edge = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    cls_w = jnp.where(gt == 0, negative_weight, 1.0) * valid
    cls_loss = (per_edge * cls_w).sum() / jnp.maximum(valid.sum(), 1.0)
    pred = (jax.nn.sigmoid(logits) > 0.5).astype(gt.dtype)
    metrics = {"cls_loss": cls_loss, **binary_cls_metrics(pred, gt, valid)}
    return cls_loss, metrics


@functools.partial(jax.jit, static_argnames=("model", "tx", "negative_weight"),
                   donate_argnames=("state",))
def train_step(state: TrainState, batch, rng, model, tx, negative_weight):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, model, batch, negative_weight, True, rng)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return TrainState(new_params, state.batch_stats, new_opt, state.step + 1), metrics


@functools.partial(jax.jit, static_argnames=("model", "negative_weight"))
def eval_step(state: TrainState, batch, model, negative_weight):
    _, metrics = loss_fn(state.params, model, batch, negative_weight, False)
    return metrics


def numeric_batch(batch: dict) -> dict:
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}


def train(cfg: Config, max_steps: int | None = None) -> TrainState:
    model = make_model(cfg)
    mesh = data_parallel_mesh(cfg.trainer.num_devices)
    n_dev = mesh.devices.size

    train_ds = VerifierDataset(cfg.data.verifier_data_path, "train", cfg.data.overfit)
    val_ds = VerifierDataset(cfg.data.verifier_data_path, "val", cfg.data.overfit)
    train_loader = Loader(train_ds, cfg.data.batch_size, seed=cfg.trainer.seed)
    val_loader = Loader(val_ds, cfg.data.val_batch_size, shuffle=False, drop_last=False,
                        seed=cfg.trainer.seed)

    tx = adamw_reference(cfg.verifier.lr, cfg.verifier.b1, cfg.verifier.b2,
                         cfg.verifier.weight_decay)
    rng = jax.random.key(cfg.trainer.seed)
    rng, init_rng = jax.random.split(rng)
    E = train_ds.max_edges
    variables = jitted_init(
        model, init_rng,
        jnp.zeros((1, E, cfg.verifier.num_features)),
        jnp.zeros((1, E, 2), jnp.int32),
        jnp.ones((1, E)),
        train=False,
    )
    state = replicate(create_state(variables, tx), mesh)

    out_dir = f"{cfg.trainer.output_dir}/{cfg.trainer.experiment_name}/verifier"
    logger = MetricsLogger(out_dir)
    # top-k on val cls_acc (reference monitors val/cls_acc,
    # config/verifier/global_config.yaml:41-49)
    topk = TopKCheckpointer(f"{out_dir}/ckpt", monitor="val_cls_acc", mode="max",
                            top_k=cfg.trainer.ckpt_top_k)
    state = maybe_restore(state, f"{out_dir}/ckpt", cfg.verifier.ckpt_path)
    # resume step from the restored state (keeps step_N checkpoint names collision-free)
    step = int(state.step)
    start_epoch = min(step // max(len(train_loader), 1), cfg.verifier.epochs)
    for epoch in range(start_epoch, cfg.verifier.epochs):
        for batch in prefetch_batches(train_loader):
            rng, k = jax.random.split(rng)
            state, metrics = train_step(
                state, shard_batch(numeric_batch(batch), mesh), k, model, tx,
                cfg.verifier.negative_weight,
            )
            if step % cfg.trainer.log_every == 0:
                logger.log(step, epoch=epoch, **jax.device_get(metrics))
            step += 1
            if max_steps is not None and step >= max_steps:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
                return state
        if (epoch + 1) % cfg.trainer.ckpt_every_epochs == 0 or epoch + 1 == cfg.verifier.epochs:
            vals = []
            for batch in val_loader:
                padded, _ = pad_batch_to_devices(numeric_batch(batch), n_dev)
                m = eval_step(state, shard_batch(padded, mesh), model,
                              cfg.verifier.negative_weight)
                vals.append({k2: float(v) for k2, v in jax.device_get(m).items()})
            if vals:
                agg = {f"val_{k2}": float(np.mean([v[k2] for v in vals])) for k2 in vals[0]}
                logger.log(step, epoch=epoch, **agg)
                topk.save(state, step, agg["val_cls_acc"])
            else:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
    return state


def main(argv=None):
    cfg = config_from_argv(argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
