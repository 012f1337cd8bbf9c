"""Train state, optimizers, checkpointing, metric logging.

TPU-native equivalents of the reference's Lightning plumbing:
  * optimizers — optax AdamW with the reference hyperparameters (fracture_ae.py:82 AdamW 5e-4 +
    MultiStepLR; denoiser.py:228-236 / verifier.py:103-110 AdamW 2e-4 betas (0.95, 0.999),
    weight decay 1e-6).
  * checkpointing — orbax with named sub-trees per model ({encoder, denoiser, verifier}), the
    schema-first replacement for the reference's key-prefix state_dict surgery
    (train_denoiser.py:30-35, test.py:24-38 — SURVEY.md §5.4).
  * logging — JSONL metrics stream (stand-in for WandbLogger, §5.5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any  # {} for models without BatchNorm
    opt_state: Any
    step: jnp.ndarray


def jitted_init(model, rng, *args, **kwargs):
    """``model.init`` under jit: one compiled program, params born on device.

    Eager (op-by-op) flax init through the axon TPU tunnel costs ~1 s per op — a
    production-size transformer init measured 270+ s, dwarfing the actual XLA compile of
    the program that uses the params (CLAUDE.md gotcha: jit everything, including inits)."""
    return jax.jit(lambda k: model.init(k, *args, **kwargs))(rng)


def adamw_reference(lr: float, b1: float = 0.95, b2: float = 0.999,
                    weight_decay: float = 1e-6) -> optax.GradientTransformation:
    """The denoiser/verifier optimizer (denoiser.py:228-236)."""
    return optax.adamw(lr, b1=b1, b2=b2, eps=1e-8, weight_decay=weight_decay)


def adamw_multistep(base_lr: float, milestones_steps: tuple[int, ...], gamma: float = 0.5,
                    weight_decay: float = 1e-6) -> optax.GradientTransformation:
    """The VQ-VAE optimizer: AdamW + MultiStepLR decay at step boundaries."""
    schedule = optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones_steps}
    )
    return optax.adamw(schedule, eps=1e-8, weight_decay=weight_decay)


def cosine_warmup_restarts_schedule(
    base_lr: float, first_cycle_steps: int, cycle_mult: float = 1.0,
    warmup_steps: int = 0, min_lr: float = 0.0, gamma: float = 1.0,
    num_cycles: int = 8,
) -> optax.Schedule:
    """CosineAnnealingWarmupRestarts (Jigsaw_matching/utils/lr.py:26 semantics): repeated
    warmup -> cosine-decay cycles, cycle length x ``cycle_mult``, peak lr x ``gamma``."""
    schedules, boundaries = [], []
    steps, peak, total = first_cycle_steps, base_lr, 0
    for _ in range(num_cycles):
        schedules.append(
            optax.warmup_cosine_decay_schedule(
                init_value=min_lr, peak_value=peak, warmup_steps=warmup_steps,
                decay_steps=max(steps, warmup_steps + 1), end_value=min_lr,
            )
        )
        total += steps
        boundaries.append(total)
        steps = int(steps * cycle_mult)
        peak *= gamma
    return optax.join_schedules(schedules, boundaries[:-1])


def create_state(variables: dict, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------- checkpointing


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int | None = None) -> str:
    """Write {params, batch_stats, step} (+ opt_state) with orbax. Returns the path."""
    path = os.path.abspath(
        os.path.join(ckpt_dir, f"step_{int(step if step is not None else state.step)}")
    )
    prune_incomplete_checkpoints(ckpt_dir)  # clear interrupted-save leftovers first
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(state.step),
        },
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def resolve_checkpoint_path(path: str) -> str:
    """Accepts a concrete step_N dir, a ckpt dir, or '<ckpt_dir>/{best,latest}' aliases.
    A plain ckpt dir resolves to the BEST checkpoint by the monitored metric when a topk.json
    index exists (the reference loads Lightning's best-ckpt for stage handoffs and inference),
    else to the mtime-latest step."""
    path = os.path.abspath(path)
    base = os.path.basename(path)
    if base == "latest":
        resolved = latest_checkpoint(os.path.dirname(path))
        return resolved if resolved else os.path.dirname(path)
    if base == "best":
        resolved = best_checkpoint(os.path.dirname(path))
        return resolved if resolved else os.path.dirname(path)
    if os.path.isdir(path) and not base.startswith("step_"):
        resolved = best_checkpoint(path)
        if resolved is not None:
            return resolved
    return path


def load_checkpoint(path: str) -> dict:
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(resolve_checkpoint_path(path))
    # orbax restores numpy arrays; convert to jax arrays so restored params compose with
    # traced indexing (e.g. codebook[idx] under jit) exactly like freshly-initialized ones
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, restored
    )


def load_model_params(path: str) -> tuple[Any, Any]:
    """Restore just (params, batch_stats) for frozen/eval use."""
    restored = load_checkpoint(path)
    return restored["params"], restored.get("batch_stats", {})


def maybe_restore(state: TrainState, ckpt_dir: str, explicit_path: str = "") -> TrainState:
    """Auto-resume: restore from an explicit path or the mtime-latest checkpoint in
    ``ckpt_dir`` (the reference's resume rule, train_matching.py:77-101). Returns the
    state unchanged when nothing exists.

    Restores against the live state's pytree structure so optax NamedTuple states come back
    as NamedTuples, not the plain dicts a structure-free orbax restore would produce."""
    path = explicit_path or latest_checkpoint(ckpt_dir)
    if not path:
        return state
    # resume means mtime-LATEST, even when the dir has a top-k index (best_checkpoint is for
    # stage handoffs / inference, not for continuing an interrupted run)
    if os.path.isdir(path) and not os.path.basename(path).startswith("step_"):
        path = latest_checkpoint(path) or path
    target = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
    }
    ckptr = ocp.StandardCheckpointer()
    try:
        restored = ckptr.restore(resolve_checkpoint_path(path), target)
    except Exception as e:  # noqa: BLE001 — any unrestorable ckpt must not crash-loop
        # A checkpoint can still be damaged in ways the tmp-dir filter can't see (e.g. a
        # kill between orbax's finalize-rename and metadata flush). Fall back to the
        # next-newest complete checkpoint rather than crash-looping the supervisor.
        if explicit_path:
            raise
        print(f"resume: {path} unrestorable ({e}); trying older checkpoints", flush=True)
        cands = sorted(
            (
                os.path.join(ckpt_dir, d)
                for d in os.listdir(ckpt_dir)
                if d.startswith("step_")
                and _is_complete_checkpoint(os.path.join(ckpt_dir, d))
            ),
            key=os.path.getmtime,
            reverse=True,
        )
        restored = None
        for cand in cands:
            if os.path.abspath(cand) == os.path.abspath(path):
                continue
            try:
                restored = ckptr.restore(resolve_checkpoint_path(cand), target)
                path = cand
                break
            except Exception as e2:  # noqa: BLE001
                print(f"resume: {cand} unrestorable ({e2})", flush=True)
        if restored is None:
            print("resume: no restorable checkpoint; starting fresh", flush=True)
            return state
    restored = jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, restored
    )
    print(f"resuming from {path} (step {restored['step']})", flush=True)
    return TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32),
    )


def _is_complete_checkpoint(path: str) -> bool:
    """True iff ``path`` is a finished orbax checkpoint directory.

    An OOM/SIGKILL mid-save (the axon tunnel's documented failure mode, CLAUDE.md) leaves a
    ``step_N.orbax-checkpoint-tmp`` directory behind; orbax's restore raises
    ``ValueError: Found incomplete checkpoint`` on it. Auto-resume must never select one —
    the r4 evidence queue crash-looped for hours on exactly this artifact."""
    if not os.path.isdir(path):
        return False
    if path.rstrip(os.sep).endswith(".orbax-checkpoint-tmp"):
        return False
    return True


def prune_incomplete_checkpoints(ckpt_dir: str) -> list[str]:
    """Delete leftover ``*.orbax-checkpoint-tmp`` dirs (interrupted saves). Returns victims."""
    import shutil

    victims = []
    if not os.path.isdir(ckpt_dir):
        return victims
    for d in os.listdir(ckpt_dir):
        full = os.path.join(ckpt_dir, d)
        if d.endswith(".orbax-checkpoint-tmp") and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
            victims.append(full)
    return victims


def latest_checkpoint(ckpt_dir: str) -> str | None:
    """mtime-latest COMPLETE step_* dir (the reference's auto-resume rule,
    train_matching.py:77-101); incomplete ``*.orbax-checkpoint-tmp`` saves are skipped."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        os.path.join(ckpt_dir, d)
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and _is_complete_checkpoint(os.path.join(ckpt_dir, d))
    ]
    return max(cands, key=os.path.getmtime) if cands else None


class TopKCheckpointer:
    """Lightning ModelCheckpoint semantics: keep the top-k checkpoints by a monitored metric
    plus always the latest (save_last), pruning the rest (reference
    config/denoiser/global_config.yaml:42-50 — top-3 on eval/part_acc; AE monitors
    val_loss/cd_loss with mode=min; verifier val/cls_acc; Jigsaw top-10 on val/mat_f1,
    train_matching.py:41-49).

    The monitored values persist in ``<ckpt_dir>/topk.json`` so retention and
    ``best_checkpoint`` survive restarts.

    ``smooth_k > 1`` ranks each checkpoint on the trailing mean of the last k raw evals
    instead of the single raw value: adjacent 32-shape part_acc evals swing by ±0.05
    (evidence/gen4096/denoiser/metrics.inflight.jsonl — 0.309 at step 14632 then 0.226 at
    14880), so raw ranking hands stage handoffs a lucky outlier. Raw values are kept in
    the index under "raw" for audit."""

    def __init__(self, ckpt_dir: str, monitor: str, mode: str = "max", top_k: int = 3,
                 smooth_k: int = 1):
        assert mode in ("max", "min")
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.monitor = monitor
        self.mode = mode
        self.top_k = top_k
        self.smooth_k = max(1, int(smooth_k))
        self.index_path = os.path.join(self.ckpt_dir, "topk.json")
        self.entries: dict[str, float] = {}
        self.raw: dict[str, float] = {}
        self.history: list[float] = []  # raw eval stream, incl. pruned checkpoints
        if os.path.exists(self.index_path):
            with open(self.index_path) as f:
                saved = json.load(f)
            if saved.get("monitor") == monitor:
                self.entries = {k: float(v) for k, v in saved["entries"].items()}
                self.raw = {k: float(v) for k, v in saved.get("raw", {}).items()}
                self.history = [float(v) for v in saved.get("history", [])]

    def _write_index(self):
        os.makedirs(self.ckpt_dir, exist_ok=True)
        with open(self.index_path, "w") as f:
            json.dump(
                {"monitor": self.monitor, "mode": self.mode, "entries": self.entries,
                 "raw": self.raw, "history": self.history[-64:],
                 "smooth_k": self.smooth_k}, f
            )

    def save(self, state: TrainState, step: int, metric_value: float) -> str:
        """Checkpoint ``state`` and prune: keeps the top-k by (smoothed) metric + the
        newest step."""
        path = save_checkpoint(self.ckpt_dir, state, step)
        name = os.path.basename(path)
        raw = float(metric_value)
        self.history.append(raw)
        self.raw[name] = raw
        ranked_value = (
            float(np.mean(self.history[-self.smooth_k:])) if self.smooth_k > 1 else raw
        )
        self.entries[name] = ranked_value
        self._write_index()
        self._prune(keep_newest=name)
        return path

    def _ranked(self) -> list[str]:
        return sorted(
            self.entries, key=self.entries.__getitem__, reverse=self.mode == "max"
        )

    def _prune(self, keep_newest: str):
        import shutil

        keep = set(self._ranked()[: self.top_k]) | {keep_newest}
        for name in list(self.entries):
            if name not in keep:
                victim = os.path.join(self.ckpt_dir, name)
                if os.path.isdir(victim):
                    shutil.rmtree(victim)
                del self.entries[name]
                self.raw.pop(name, None)
        self._write_index()

    def best(self) -> str | None:
        ranked = self._ranked()
        return os.path.join(self.ckpt_dir, ranked[0]) if ranked else None


def best_checkpoint(ckpt_dir: str) -> str | None:
    """Best step_* dir per the persisted topk.json index; falls back to mtime-latest when no
    monitored index exists (e.g. periodic-only checkpoints)."""
    index_path = os.path.join(ckpt_dir, "topk.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            saved = json.load(f)
        entries = saved.get("entries", {})
        live = {k: v for k, v in entries.items()
                if os.path.isdir(os.path.join(ckpt_dir, k))}
        if live:
            pick = (max if saved.get("mode", "max") == "max" else min)(
                live, key=live.__getitem__
            )
            return os.path.join(ckpt_dir, pick)
    return latest_checkpoint(ckpt_dir)


# ---------------------------------------------------------------- logging


class MetricsLogger:
    """Append-only JSONL metrics stream + stdout echo."""

    def __init__(self, out_dir: str, name: str = "metrics"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.jsonl")
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                v = float(np.asarray(v))
            rec[k] = v
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        pretty = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in rec.items()
        )
        print(pretty, flush=True)
