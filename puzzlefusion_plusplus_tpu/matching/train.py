"""Matching-model training (the reference's Jigsaw_matching/train_matching.py).

Loss staging matches model_config.py:27-31 + training_epoch_end (joint_seg_align_model.py:
453-463): classification loss always on; the permutation loss joins at ``mat_epoch``; the
rigid loss at ``rig_epoch``. Optimizer: cosine-annealed lr 1e-3
(experiments/jigsaw_4x4_128_512_250e_cosine_everyday.yaml:13-20).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax

from puzzlefusion_plusplus_tpu.data.loader import Loader, prefetch_batches
from puzzlefusion_plusplus_tpu.matching import ops as mops
from puzzlefusion_plusplus_tpu.matching.dataset import AllPieceMatchingDataset
from puzzlefusion_plusplus_tpu.matching.model import (
    JigsawModel,
    gt_permutation,
    permutation_loss,
    rigid_loss_pairs,
)
from puzzlefusion_plusplus_tpu.matching.sinkhorn import _hungarian_host
from puzzlefusion_plusplus_tpu.parallel import (
    data_parallel_mesh,
    replicate,
    shard_batch,
)
from puzzlefusion_plusplus_tpu.training.state import (
    MetricsLogger,
    TopKCheckpointer,
    TrainState,
    create_state,
    jitted_init,
    maybe_restore,
    save_checkpoint,
)
from puzzlefusion_plusplus_tpu.training.verifier import binary_cls_metrics


def make_model(pc_feat_dim=128, aff_feat_dim=512, encoder="pointnet2",
               sa_npoints=(1024, 256, 64, 16), cls_method="binary",
               num_classes=2, canonicalize=False, max_num_part=20) -> JigsawModel:
    return JigsawModel(pc_feat_dim=pc_feat_dim, aff_feat_dim=aff_feat_dim,
                       encoder_type=encoder, sa_npoints=sa_npoints,
                       cls_method=cls_method, num_classes=num_classes,
                       canonicalize_inputs=canonicalize, max_num_part=max_num_part)


def loss_fn(params, batch_stats, model, batch, w_mat, w_rig, train, rng,
            cls_pos_weight: float = 1.0):
    pid = batch["piece_id"]
    n_valid = batch["part_valids"].sum(-1).astype(jnp.int32)
    labels = mops.fracture_point_labels(
        batch["gt_pcs"], pid, n_valid, batch["critical_label_thresholds"]
    )
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["part_pcs"], pid, n_valid, labels,
        train=train, compute_matching=True,
        mutable=["batch_stats"] if train else [],
    )
    valid = mops.valid_point_mask(pid, n_valid)
    w = valid.astype(jnp.float32)
    logits = out["cls_logits"]
    gt = labels.astype(jnp.float32)
    if model.cls_method == "binary":
        bce = jnp.maximum(logits, 0) - logits * gt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        # cls_pos_weight > 1 up-weights fracture-point positives (~18% of points); the
        # reference's plain BCE (joint_seg_align_model.py:301) is the 1.0 default — its
        # all-negative base-rate minimum takes O(100) epochs to escape at these ratios
        wc = w * jnp.where(gt > 0, jnp.float32(cls_pos_weight), 1.0)
        cls_loss = (bce * wc).sum() / jnp.maximum(wc.sum(), 1.0)
    else:  # NLL over log-softmax logits (joint_seg_align_model.py:303-304)
        nll = -jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
        cls_loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    metrics = {"cls_loss": cls_loss}
    metrics.update(binary_cls_metrics(out["cls_pred"].astype(jnp.float32), gt, w))

    # matching losses over compacted critical slots
    slot_valid = out["crit_slot_valid"]
    order = out["crit_order"]
    gt_crit = jnp.take_along_axis(batch["gt_pcs"], order[..., None], axis=1)
    pts_crit = jnp.take_along_axis(batch["part_pcs"], order[..., None], axis=1)
    cross = out["s_mask"]
    gt_perm = gt_permutation(
        jnp.where(slot_valid[..., None], gt_crit, 1e3), cross
    )
    mat_loss = permutation_loss(out["ds_mat"], gt_perm, out["n_critical_sum"])
    metrics["mat_loss"] = mat_loss
    # STATIC gate: w_rig is a Python float (static jit arg) — a traced jnp.where would
    # execute the rigid loss (forward AND backward) from epoch 0, long before rig_epoch
    if w_rig > 0:
        rig_loss = rigid_loss_pairs(out["ds_mat"], pts_crit, out["crit_pid"], slot_valid,
                                    batch["part_valids"].shape[-1])
    else:
        rig_loss = jnp.zeros(())
    metrics["rig_loss"] = rig_loss
    total = cls_loss + w_mat * mat_loss + w_rig * rig_loss
    metrics["loss"] = total
    new_stats = mutated.get("batch_stats", batch_stats) if train else batch_stats
    return total, (metrics, new_stats, out, gt_perm, cross)


@functools.partial(
    jax.jit,
    # one specialization per loss stage
    static_argnames=("model", "tx", "w_mat", "w_rig", "cls_pos_weight"),
    donate_argnames=("state",),
)
def train_step(state: TrainState, batch, w_mat, w_rig, rng, model, tx,
               cls_pos_weight: float = 1.0):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (metrics, new_stats, *_)), grads = grad_fn(
        state.params, state.batch_stats, model, batch, w_mat, w_rig, True, rng,
        cls_pos_weight,
    )
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics


def numeric_batch(batch):
    return {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}


@functools.partial(jax.jit, static_argnames=("model",))
def _eval_device(params, batch_stats, batch, rng, model):
    _, (metrics, _, out, gt_perm, cross) = loss_fn(
        params, batch_stats, model, batch, 1.0, 0.0, False, rng
    )
    return metrics, out["ds_mat"], out["n_critical_sum"], gt_perm, cross


def eval_step(params, batch_stats, batch, rng, model):
    """Validation metrics incl. Hungarian-discretized matching F1 (the reference's
    val/mat_f1 monitor, Jigsaw_matching/train_matching.py:41-49).

    The Hungarian discretization + F1 run host-side in numpy on the fetched ds_mat —
    the assignment is a host computation either way (scipy), and keeping it out of the
    jitted program avoids a ``pure_callback`` round trip through the remote-device
    transport (same bytes move: the scores must reach the host for scipy regardless).
    """
    metrics, ds_mat, n_crit, gt_perm, cross = jax.device_get(
        _eval_device(params, batch_stats, batch, rng, model)
    )
    perm = _hungarian_host(np.asarray(ds_mat), np.asarray(n_crit), np.asarray(n_crit))
    gt_perm, cross = np.asarray(gt_perm), np.asarray(cross)
    tp = float((perm * gt_perm * cross).sum())
    fp = float((perm * (1.0 - gt_perm) * cross).sum())
    fn = float(((1.0 - perm) * gt_perm * cross).sum())
    eps = 1e-7
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    metrics.update(
        mat_precision=precision,
        mat_recall=recall,
        mat_f1=2 * precision * recall / (precision + recall + eps),
    )
    return metrics


def train_matching(
    data_dir: str,
    out_dir: str = "output/matching",
    epochs: int = 250,
    batch_size: int = 1,
    num_points: int = 5000,
    lr: float = 1e-3,
    mat_epoch: int = 10,
    rig_epoch: int = 200,
    seed: int = 123,
    max_steps: int | None = None,
    model: JigsawModel | None = None,
    max_num_part: int = 20,
    val_data_dir: str | None = None,
    val_every: int = 50,
    top_k: int = 10,
    cls_pos_weight: float = 1.0,
    num_devices: int = 1,
) -> TrainState:
    """``num_devices``: data-parallel device count (the reference Jigsaw's DDP default,
    utils/config.py:104); -1 = all local devices. batch_size must divide by it."""
    model = model or make_model()
    mesh = data_parallel_mesh(num_devices)
    ds = AllPieceMatchingDataset(data_dir, num_points=num_points, max_num_part=max_num_part)
    loader = Loader(ds, batch_size, seed=seed)
    val_loader = None
    if val_data_dir is not None:
        val_loader = Loader(
            AllPieceMatchingDataset(val_data_dir, num_points=num_points,
                                    max_num_part=max_num_part),
            batch_size, shuffle=False, drop_last=False, seed=seed,
        )
    steps_per_epoch = max(len(loader), 1)
    schedule = optax.cosine_decay_schedule(lr, epochs * steps_per_epoch)
    tx = optax.adam(schedule)

    rng = jax.random.key(seed)
    sample = numeric_batch(next(iter(loader)))
    n_valid0 = jnp.asarray(sample["part_valids"]).sum(-1).astype(jnp.int32)
    variables = jitted_init(
        model, rng,
        jnp.asarray(sample["part_pcs"]), jnp.asarray(sample["piece_id"]), n_valid0,
        jnp.zeros(sample["piece_id"].shape, jnp.int32),
        train=False, compute_matching=True,
    )
    state = replicate(create_state(variables, tx), mesh)
    logger = MetricsLogger(out_dir)
    # top-k retention on val mat_f1 + auto-resume (reference ModelCheckpoint top-10 on
    # val/mat_f1 + resume rule, Jigsaw_matching/train_matching.py:41-49, 77-101)
    topk = TopKCheckpointer(f"{out_dir}/ckpt", monitor="mat_f1", mode="max", top_k=top_k)
    state = maybe_restore(state, f"{out_dir}/ckpt")
    step = int(state.step)
    start_epoch = min(step // max(len(loader), 1), epochs)
    for epoch in range(start_epoch, epochs):
        w_mat = 1.0 if epoch >= mat_epoch else 0.0
        w_rig = 1.0 if epoch >= rig_epoch else 0.0
        for batch in prefetch_batches(loader):
            rng, k = jax.random.split(rng)
            state, metrics = train_step(
                state, shard_batch(numeric_batch(batch), mesh),
                w_mat, w_rig, k, model, tx, cls_pos_weight,
            )
            if step % 20 == 0:
                logger.log(step, epoch=epoch, **jax.device_get(metrics))
            step += 1
            if max_steps is not None and step >= max_steps:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
                return state
        if (epoch + 1) % val_every == 0 or epoch + 1 == epochs:
            if val_loader is not None:
                accs = []
                for vb in val_loader:
                    rng, k = jax.random.split(rng)
                    # val batches replicate (not shard): ragged final batches need no
                    # divisibility and metrics stay exact; redundancy only costs at val
                    m = jax.device_get(eval_step(
                        state.params, state.batch_stats,
                        replicate(numeric_batch(vb), mesh),
                        k, model,
                    ))
                    accs.append({k2: float(np.mean(v)) for k2, v in m.items()})
                agg = {k2: float(np.mean([a[k2] for a in accs])) for k2 in accs[0]}
                logger.log(step, epoch=epoch, **{f"val_{k2}": v for k2, v in agg.items()})
                topk.save(state, step, agg["mat_f1"])
            else:
                save_checkpoint(f"{out_dir}/ckpt", state, step)
    return state


def main(argv=None):
    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]) if "=" in a)
    train_matching(
        args.get("data_dir", "pc_data/everyday/train"),
        out_dir=args.get("out_dir", "output/matching"),
        epochs=int(args.get("epochs", 250)),
        batch_size=int(args.get("batch_size", 1)),
        num_points=int(args.get("num_points", 5000)),
        lr=float(args.get("lr", 1e-3)),
        mat_epoch=int(args.get("mat_epoch", 10)),
        rig_epoch=int(args.get("rig_epoch", 200)),
        max_num_part=int(args.get("max_num_part", 20)),
        val_data_dir=args.get("val_data_dir") or None,
        val_every=int(args.get("val_every", 50)),
        max_steps=int(args["max_steps"]) if "max_steps" in args else None,
        cls_pos_weight=float(args.get("cls_pos_weight", 1.0)),
        num_devices=int(args.get("num_devices", 1)),
    )


if __name__ == "__main__":
    main()
