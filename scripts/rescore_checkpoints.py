"""Multi-seed re-scoring of retained denoiser checkpoints + engine eval of the winner.

Checkpoint selection follow-through (VERDICT r4 #5): smoothed ranking (training/state.py
TopKCheckpointer smooth_k) fixes FUTURE saves, but the gen4096 topk.json still carries a
pre-smoothing legacy entry (step_14632 raw 0.3086, a spike — its adjacent evals scored
0.226/0.279), and stage handoffs keep resolving to it. This script re-scores every
retained checkpoint with the same full-sampling eval the training loop uses
(training/denoiser.py make_sample_fn + eval_metrics, val-mode dataset), averaged over
SEEDS rng seeds, rewrites topk.json entries with the multi-seed means (raw values kept),
and re-runs the held-out engine eval when the winner changes.

Env: N_TRAIN=4096 SEEDS=3 BATCH=16 RUN_ENGINE=1
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PFPP_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

from puzzlefusion_plusplus_tpu.data.bucketing import part_bucket, slice_batch_parts
from puzzlefusion_plusplus_tpu.data.datasets import DenoiserDataset
from puzzlefusion_plusplus_tpu.data.loader import Loader
from puzzlefusion_plusplus_tpu.models.scheduler import DDPMParams
from puzzlefusion_plusplus_tpu.parallel.mesh import (
    data_parallel_mesh,
    pad_batch_to_devices,
    shard_batch,
)
from puzzlefusion_plusplus_tpu.training import denoiser as tden
from puzzlefusion_plusplus_tpu.training.state import best_checkpoint, load_checkpoint
from puzzlefusion_plusplus_tpu.utils.config import Config

N_TRAIN = int(os.environ.get("N_TRAIN", "4096"))
SEEDS = int(os.environ.get("SEEDS", "3"))
BATCH = int(os.environ.get("BATCH", "16"))
RUN_ENGINE = int(os.environ.get("RUN_ENGINE", "1"))
BUCKET_MULT = int(os.environ.get("BUCKET_MULT", "4"))

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
OUT = ROOT + "/out"
CKPT_DIR = OUT + "/everyday/denoiser/ckpt"
t0 = time.time()

from evidence import collect, write_summary  # noqa: E402 (scripts/ on sys.path)

cfg = Config()
cfg.trainer.output_dir = OUT
cfg.denoiser.encoder_ckpt_path = OUT + "/everyday/vqvae/ckpt"

model = tden.make_model(cfg)
encoder = tden.load_frozen_encoder(cfg)
ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
mesh = data_parallel_mesh(1)
sample_fn = tden.make_sample_fn(model, encoder, ddpm, cfg.denoiser.num_inference_steps)

ds = DenoiserDataset(ROOT + "/pc_data/val", mode="val",
                     max_num_part=cfg.data.max_num_part,
                     multiple_ref_parts=cfg.denoiser.multiple_ref_parts)
keys = [part_bucket(int(c), BUCKET_MULT, cap=cfg.data.max_num_part)
        for c in ds.num_parts_list()]
loader = Loader(ds, BATCH, shuffle=False, drop_last=False, seed=0, bucket_key=keys)

prev_best = best_checkpoint(CKPT_DIR)
ckpts = sorted(
    (d for d in os.listdir(CKPT_DIR)
     if d.startswith("step_") and not d.endswith(".orbax-checkpoint-tmp")),
    key=lambda d: int(d.split("_")[1]),
)
print(f"[{time.time()-t0:.0f}s] re-scoring {len(ckpts)} ckpts x {SEEDS} seeds "
      f"(prev best: {os.path.basename(prev_best or '-')})", flush=True)

scores = {}
for name in ckpts:
    params = load_checkpoint(os.path.join(CKPT_DIR, name))["params"]
    per_seed = []
    for s in range(SEEDS):
        rng = jax.random.key(1000 + s)
        accs = []
        for batch in loader:
            P_b = part_bucket(int(np.max(batch["num_parts"])), BUCKET_MULT,
                              cap=cfg.data.max_num_part)
            b = slice_batch_parts(tden.numeric_batch(batch), P_b)
            padded, _ = pad_batch_to_devices(b, mesh.devices.size)
            sharded = shard_batch(padded, mesh)
            rng, k = jax.random.split(rng)
            final, _ = sample_fn(params, sharded, k)
            m = jax.device_get(tden.eval_metrics(final, sharded))
            accs.append({k2: float(np.mean(v)) for k2, v in m.items()})
        per_seed.append({k2: float(np.mean([a[k2] for a in accs])) for k2 in accs[0]})
    mean_acc = float(np.mean([p["part_acc"] for p in per_seed]))
    scores[name] = {
        "part_acc_mean": mean_acc,
        "part_acc_std": float(np.std([p["part_acc"] for p in per_seed])),
        "part_acc_nonref_mean": float(np.mean([p["part_acc_nonref"] for p in per_seed])),
        "per_seed": per_seed,
    }
    print(f"[{time.time()-t0:.0f}s] {name}: part_acc {mean_acc:.4f} "
          f"+-{scores[name]['part_acc_std']:.4f} "
          f"nonref {scores[name]['part_acc_nonref_mean']:.4f}", flush=True)

winner = max(scores, key=lambda n: scores[n]["part_acc_mean"])
print(f"[{time.time()-t0:.0f}s] winner: {winner} "
      f"({scores[winner]['part_acc_mean']:.4f})", flush=True)

# rewrite topk entries with the multi-seed means: the index becomes seed-averaged and
# directly comparable across pre-/post-smoothing eras; raw single-eval values stay under
# "raw" (TopKCheckpointer persists them) plus the full rescore record next to it
idx_path = os.path.join(CKPT_DIR, "topk.json")
with open(idx_path) as f:
    idx = json.load(f)
idx["entries"] = {n: scores[n]["part_acc_mean"] for n in scores}
idx["rescored"] = {"seeds": SEEDS, "n_val": len(ds)}
with open(idx_path, "w") as f:
    json.dump(idx, f)

eng_dir = OUT + "/engine_eval"
os.makedirs(eng_dir, exist_ok=True)
summary = {"scores": {n: {k2: v2 for k2, v2 in s.items() if k2 != "per_seed"}
                      for n, s in scores.items()},
           "winner": winner, "prev_best": os.path.basename(prev_best or ""),
           "seeds": SEEDS}

if RUN_ENGINE and (os.path.basename(prev_best or "") != winner):
    from puzzlefusion_plusplus_tpu.inference.run import run_inference

    ecfg = Config()
    ecfg.data.data_val_dir = ROOT + "/pc_data/val"
    ecfg.data.matching_data_path = ROOT + "/matching_data"
    ecfg.trainer.output_dir = OUT
    ecfg.trainer.experiment_name = "everyday_rescored"
    ecfg.denoiser.encoder_ckpt_path = OUT + "/everyday/vqvae/ckpt"
    ecfg.denoiser.ckpt_path = os.path.join(CKPT_DIR, winner)
    ecfg.verifier.ckpt_path = OUT + "/everyday/verifier/ckpt"
    ecfg.inference.batch_size = 8
    ecfg.inference.save_trajectories = False
    ecfg.inference.save_breakdown = True
    agg = run_inference(ecfg)
    print(f"[{time.time()-t0:.0f}s] HELD-OUT engine (rescored best {winner}): "
          f"{json.dumps(agg)}", flush=True)
    summary["heldout_engine_rescored_best"] = agg

write_summary(eng_dir, "ckpt_rescore", summary)
collect(eng_dir, f"gen{N_TRAIN}/engine")
print(f"[{time.time()-t0:.0f}s] done", flush=True)
