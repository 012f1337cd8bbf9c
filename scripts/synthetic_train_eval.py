"""Longest-affordable synthetic GENERALIZATION run (VERDICT #3 follow-through): train all
three stages on N_TRAIN synthetic shapes with the production training loops, then evaluate
the full auto-agglomerative engine on HELD-OUT shapes.

Unlike scripts/overfit_proof.py this measures generalization: train and val are disjoint
shape sets, augmentation is the full reference pipeline (fresh rotations every epoch,
multi-ref curriculum), and checkpoint selection uses the top-k retention on eval part_acc.

Env: N_TRAIN=256 N_VAL=16 STEPS_AE=4000 STEPS_DN=10000 STEPS_VF=1000
     MIN_PARTS=2 MAX_PARTS=20 (r3: full reference part-count range, data.yaml:11)
     PLATEAU_X=3 (r4: stage budgets are floors, not guesses — each stage keeps extending
     in half-budget chunks until its monitored series plateaus, scripts/evidence.py, or
     the PLATEAU_X multiple of the base budget is hit; every stage's metrics.jsonl is
     copied into the committed evidence/ tree the moment the stage ends, VERDICT r3 #7)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.data import generate_dataset
from puzzlefusion_plusplus_tpu.training import denoiser as tden
from puzzlefusion_plusplus_tpu.training import verifier as tvf
from puzzlefusion_plusplus_tpu.training import vqvae as tvq
from puzzlefusion_plusplus_tpu.utils.config import Config

N_TRAIN = int(os.environ.get("N_TRAIN", "256"))
N_VAL = int(os.environ.get("N_VAL", "16"))
STEPS_AE = int(os.environ.get("STEPS_AE", "4000"))
STEPS_DN = int(os.environ.get("STEPS_DN", "10000"))
STEPS_VF = int(os.environ.get("STEPS_VF", "1000"))
MIN_PARTS = int(os.environ.get("MIN_PARTS", "2"))
MAX_PARTS = int(os.environ.get("MAX_PARTS", "20"))
PLATEAU_X = float(os.environ.get("PLATEAU_X", "3"))  # hard cap: PLATEAU_X * base budget

from evidence import collect, loss_plateaued, write_summary  # noqa: E402 (scripts/)

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
OUT = ROOT + "/out"
t0 = time.time()
if not os.path.exists(ROOT + "/.done"):
    print(f"[{time.time()-t0:.0f}s] generating {N_TRAIN}+{N_VAL} shapes", flush=True)
    generate_dataset(ROOT, num_shapes=N_TRAIN, seed=11, split="train",
                     min_parts=MIN_PARTS, max_parts=MAX_PARTS, n_points=1000)
    generate_dataset(ROOT, num_shapes=N_VAL, seed=12, split="val",
                     min_parts=MIN_PARTS, max_parts=MAX_PARTS, n_points=1000)
    open(ROOT + "/.done", "w").write("ok")

cfg = Config()
cfg.data.data_dir = ROOT + "/pc_data/train"
cfg.data.data_val_dir = ROOT + "/pc_data/val"
cfg.data.matching_data_path = ROOT + "/matching_data"
cfg.data.verifier_data_path = ROOT + "/verifier_data"
cfg.trainer.output_dir = OUT
cfg.trainer.num_devices = 1
# part-count bucketing for the training loops (pad-invariant by loss masking; property-
# tested in tests/test_bucketing.py) — one XLA specialization per bucket pad
cfg.data.part_bucket_multiple = int(os.environ.get("BUCKET_MULT", "4"))

# ---- stage 1 (plateau-gated: r3's fixed budget left cd_loss still falling at the cut)
ae_ckpt = OUT + "/everyday/vqvae/ckpt"
ae_metrics = OUT + "/everyday/vqvae/metrics.jsonl"
if not os.path.exists(ROOT + "/.stage1_plateau"):
    cfg.data.batch_size = 16
    cfg.data.val_batch_size = 16
    target = STEPS_AE
    while True:
        print(f"[{time.time()-t0:.0f}s] stage 1: VQ-VAE -> step {target}", flush=True)
        tvq.train(cfg, max_steps=target)  # auto-resumes from the last ckpt step
        done, info = loss_plateaued(ae_metrics, "cd_loss", window=10)
        print(f"[{time.time()-t0:.0f}s] stage 1 plateau check: done={done} {info}",
              flush=True)
        if done or target >= STEPS_AE * PLATEAU_X:
            break
        target += max(STEPS_AE // 2, 1)
    open(ROOT + "/.stage1_plateau", "w").write(str(info))
collect(OUT + "/everyday/vqvae", f"gen{N_TRAIN}/vqvae")
cfg.denoiser.encoder_ckpt_path = ae_ckpt

# ---- stage 2 (production loop; val every val_every epochs logs the part_acc curve;
# plateau-gated on eval_part_acc: the 0.22-plateau question needs the curve flat, not cut)
dn_ckpt = OUT + "/everyday/denoiser/ckpt"
dn_metrics = OUT + "/everyday/denoiser/metrics.jsonl"
cfg.data.batch_size = 64
cfg.data.val_batch_size = 16
cfg.denoiser.train_on_inference_timesteps = True
steps_per_epoch = max(N_TRAIN // cfg.data.batch_size, 1)
base_epochs = -(-STEPS_DN // steps_per_epoch)
# denser val cadence: each val checkpoints the run, which bounds the work lost when the
# axon tunnel's per-dispatch host leak OOMs the process (supervisor relaunch + auto-resume)
cfg.denoiser.val_every = max(base_epochs // 40, 1)
if not os.path.exists(ROOT + "/.stage2_plateau"):
    epochs = base_epochs
    while True:
        print(f"[{time.time()-t0:.0f}s] stage 2: denoiser -> epoch {epochs} "
              f"(~{epochs * steps_per_epoch} steps)", flush=True)
        cfg.denoiser.epochs = epochs
        tden.train(cfg)
        done, info = loss_plateaued(dn_metrics, "eval_part_acc", window=5,
                                    min_rel_improve=0.01, mode="max")
        print(f"[{time.time()-t0:.0f}s] stage 2 plateau check: done={done} {info}",
              flush=True)
        if done or epochs >= base_epochs * PLATEAU_X:
            break
        epochs += max(base_epochs // 2, 1)
    open(ROOT + "/.stage2_plateau", "w").write(str(info))
collect(OUT + "/everyday/denoiser", f"gen{N_TRAIN}/denoiser")

# ---- stage 3
print(f"[{time.time()-t0:.0f}s] stage 3: verifier {STEPS_VF} steps", flush=True)
cfg.data.batch_size = 64
cfg.data.val_batch_size = 64
tvf.train(cfg, max_steps=STEPS_VF)
collect(OUT + "/everyday/verifier", f"gen{N_TRAIN}/verifier")

# ---- engine on held-out shapes (best ckpt by eval part_acc via topk index)
from puzzlefusion_plusplus_tpu.inference.run import run_inference

cfg.denoiser.ckpt_path = dn_ckpt
cfg.verifier.ckpt_path = OUT + "/everyday/verifier/ckpt"
cfg.inference.batch_size = 8
cfg.inference.save_trajectories = False
cfg.inference.save_breakdown = True  # per-part records -> scripts/engine_breakdown.py
agg = run_inference(cfg)
print(f"[{time.time()-t0:.0f}s] HELD-OUT engine metrics: {agg}", flush=True)
eng_dir = OUT + "/engine_eval"
os.makedirs(eng_dir, exist_ok=True)
from engine_breakdown import analyze, load_records  # noqa: E402 (scripts/ on sys.path)

inf_dir = os.path.join(cfg.trainer.output_dir, cfg.trainer.experiment_name, "inference",
                       cfg.inference.inference_dir)
try:
    breakdown = analyze(load_records(inf_dir))
except Exception as e:  # never lose the headline metrics to an analysis bug
    breakdown = {"error": repr(e)}
print(f"[{time.time()-t0:.0f}s] per-part breakdown: {json.dumps(breakdown)}", flush=True)
write_summary(eng_dir, "heldout_engine", {
    "metrics": agg, "n_train": N_TRAIN, "n_val": N_VAL,
    "min_parts": MIN_PARTS, "max_parts": MAX_PARTS,
    "breakdown": breakdown,
    "reference_bar": {"part_acc": 0.7018, "source": "docs/test.md:17",
                      "nonref_equivalent": 0.65},
})
collect(eng_dir, f"gen{N_TRAIN}/engine")
