"""Top-k checkpoint retention by monitored metric (reference ModelCheckpoint: top-3 +
save_last on eval/part_acc, config/denoiser/global_config.yaml:42-50)."""

import os

import jax.numpy as jnp
import optax

from puzzlefusion_plusplus_tpu.training.state import (
    TopKCheckpointer,
    TrainState,
    best_checkpoint,
    create_state,
    latest_checkpoint,
    maybe_restore,
    resolve_checkpoint_path,
)


def _state(value: float, step: int = 0) -> TrainState:
    tx = optax.adamw(1e-3)
    s = create_state({"params": {"w": jnp.full((2,), value)}}, tx)
    return s._replace(step=jnp.asarray(step, jnp.int32))


def _steps(ckpt_dir):
    return sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))


def test_topk_retention_and_best(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=2)

    scores = {1: 0.1, 2: 0.5, 3: 0.3, 4: 0.05, 5: 0.4}
    for step, acc in scores.items():
        topk.save(_state(float(step), step), step, acc)

    kept = _steps(ckpt_dir)
    # top-2 by metric = steps 2 (0.5) and 5 (0.4); step 5 is also the newest (save_last)
    assert kept == ["step_2", "step_5"]
    assert os.path.basename(best_checkpoint(ckpt_dir)) == "step_2"
    # a plain ckpt-dir path resolves to the BEST checkpoint for loading
    assert os.path.basename(resolve_checkpoint_path(ckpt_dir)) == "step_2"
    assert os.path.basename(resolve_checkpoint_path(ckpt_dir + "/best")) == "step_2"
    # the latest alias and resume still mean mtime-latest
    assert os.path.basename(latest_checkpoint(ckpt_dir)) == "step_5"
    assert os.path.basename(resolve_checkpoint_path(ckpt_dir + "/latest")) == "step_5"
    restored = maybe_restore(_state(0.0), ckpt_dir)
    assert int(restored.step) == 5


def test_topk_save_last_keeps_newest_even_if_worst(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=1)
    topk.save(_state(1.0), 1, 0.9)
    topk.save(_state(2.0), 2, 0.8)  # worse, but newest -> kept alongside the best
    assert _steps(ckpt_dir) == ["step_1", "step_2"]
    topk.save(_state(3.0), 3, 0.7)  # step_2 now neither best nor newest -> pruned
    assert _steps(ckpt_dir) == ["step_1", "step_3"]
    assert os.path.basename(best_checkpoint(ckpt_dir)) == "step_1"


def test_topk_mode_min_and_restart_persistence(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="val_cd_loss", mode="min", top_k=2)
    for step, loss in {1: 0.9, 2: 0.2, 3: 0.5}.items():
        topk.save(_state(float(step)), step, loss)
    assert os.path.basename(best_checkpoint(ckpt_dir)) == "step_2"

    # a fresh checkpointer (process restart) reloads the index and keeps pruning correctly
    topk2 = TopKCheckpointer(ckpt_dir, monitor="val_cd_loss", mode="min", top_k=2)
    topk2.save(_state(4.0), 4, 0.1)
    assert os.path.basename(best_checkpoint(ckpt_dir)) == "step_4"
    assert _steps(ckpt_dir) == ["step_2", "step_4"]


def test_best_falls_back_to_latest_without_index(tmp_path):
    from puzzlefusion_plusplus_tpu.training.state import save_checkpoint

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, _state(1.0), 1)
    save_checkpoint(ckpt_dir, _state(2.0), 2)
    assert os.path.basename(best_checkpoint(ckpt_dir)) == "step_2"


def test_resume_continues_step_counter(tmp_path):
    """Resumed training must continue the restored step counter: a counter restarting at 0
    would regenerate the same step_N checkpoint names, overwriting the retained top-k
    weights while topk.json silently rebinds their metrics (round-2 review finding)."""
    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=2)
    topk.save(_state(1.0, 63), 63, 0.91)  # best checkpoint of the "first run"

    restored = maybe_restore(_state(0.0, 0), ckpt_dir, None)
    step = int(restored.step)  # the training loops' resume pattern
    assert step == 63
    topk.save(_state(2.0, step + 1), step + 1, 0.55)  # resumed run's next validation
    assert best_checkpoint(ckpt_dir).endswith("step_63")
    r63 = maybe_restore(_state(0.0, 0), ckpt_dir, os.path.join(ckpt_dir, "step_63"))
    assert float(r63.params["w"][0]) == 1.0  # best weights untouched


def test_resume_skips_incomplete_orbax_tmp(tmp_path):
    """An OOM-kill mid-save leaves ``step_N.orbax-checkpoint-tmp`` behind; auto-resume must
    skip it and land on the newest COMPLETE checkpoint (round-4 incident: the evidence
    queue crash-looped for ~5 h on ``ValueError: Found incomplete checkpoint``)."""
    import time

    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=2)
    topk.save(_state(1.0, 100), 100, 0.5)
    time.sleep(0.01)
    # plant the interrupted-save artifact, mtime-newer than the real checkpoint
    tmp_ckpt = os.path.join(ckpt_dir, "step_120.orbax-checkpoint-tmp")
    os.makedirs(os.path.join(tmp_ckpt, "params"))

    assert os.path.basename(latest_checkpoint(ckpt_dir)) == "step_100"
    restored = maybe_restore(_state(0.0, 0), ckpt_dir)
    assert int(restored.step) == 100
    assert float(restored.params["w"][0]) == 1.0

    # the next save prunes the stale tmp dir
    topk.save(_state(2.0, 130), 130, 0.6)
    assert not os.path.exists(tmp_ckpt)
    assert os.path.basename(latest_checkpoint(ckpt_dir)) == "step_130"


def test_resume_falls_back_past_corrupt_checkpoint(tmp_path):
    """A checkpoint damaged in ways the tmp-dir filter can't see (metadata gone) must not
    crash resume: fall back to the next-newest restorable checkpoint."""
    import shutil
    import time

    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=3)
    topk.save(_state(1.0, 100), 100, 0.5)
    time.sleep(0.01)
    topk.save(_state(2.0, 200), 200, 0.6)
    # corrupt the newest complete-looking checkpoint: strip orbax internals
    victim = os.path.join(ckpt_dir, "step_200")
    for entry in os.listdir(victim):
        full = os.path.join(victim, entry)
        shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)

    restored = maybe_restore(_state(0.0, 0), ckpt_dir)
    assert int(restored.step) == 100
    assert float(restored.params["w"][0]) == 1.0


def test_topk_smoothed_ranking_rejects_spikes(tmp_path):
    """smooth_k=3 ranks on the trailing-mean eval, so a single lucky outlier eval must not
    win best_checkpoint over a sustained plateau (round-4 finding: ±0.05 adjacent-eval
    swings on the 32-shape val split put spike checkpoints at the top of topk.json)."""
    ckpt_dir = str(tmp_path / "ckpt")
    topk = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=3,
                            smooth_k=3)
    # noisy plateau at ~0.20 with one 0.31 spike, then a genuine sustained climb to ~0.28
    evals = {1: 0.20, 2: 0.31, 3: 0.19, 4: 0.21, 5: 0.27, 6: 0.28, 7: 0.285}
    for step, acc in evals.items():
        topk.save(_state(float(step), step), step, acc)
    # raw ranking would pick the step-2 spike; smoothed ranking picks the plateau's end
    assert os.path.basename(best_checkpoint(ckpt_dir)) == "step_7"
    # raw values are preserved for audit
    import json

    with open(os.path.join(ckpt_dir, "topk.json")) as f:
        idx = json.load(f)
    assert idx["raw"]["step_7"] == 0.285
    assert len(idx["history"]) == 7

    # restart persistence: the smoothing window survives a process restart
    topk2 = TopKCheckpointer(ckpt_dir, monitor="eval_part_acc", mode="max", top_k=3,
                             smooth_k=3)
    topk2.save(_state(8.0, 8), 8, 0.29)
    assert abs(topk2.entries["step_8"] - (0.28 + 0.285 + 0.29) / 3) < 1e-9
