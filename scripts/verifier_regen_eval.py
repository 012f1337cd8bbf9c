"""Verifier-data provenance A/B: synthetic-perturbation labels vs denoiser-generated labels.

The reference's verifier dataset is produced by ITS trained denoiser (distributed as a
download, docs/data_preparation.md; schema verifier/dataset/dataset.py:50-53): the verifier
learns the failure modes of the actual sampler it will gate at inference. The evidence
queue's stage-A verifier instead trained on the synthetic-perturbation tree
(data/synthetic.py::make_verifier_data_npz) — labels from random pose noise, not from
denoiser behavior. The r5 model-vs-GT matching comparison came back bit-identical, i.e.
the engine outcome was insensitive to the verifier's histogram features; a verifier that
has never seen real denoiser outputs is the prime suspect.

This script closes the loop the reference closes with its download:
  1. regenerate verifier data from the best stage-A denoiser checkpoint
     (data/verifier_gen.py — full 20-step sampling per train shape),
  2. train a fresh verifier on it (same budget as stage A's),
  3. run the held-out engine with BOTH verifiers and publish the comparison.

Env: N_TRAIN=4096 MAX_SAMPLES=1500 ROUNDS=1 STEPS_VF=1000 BATCH_GEN unused (batch 1 by
generator design). Reads /tmp/pfpp_gen_{N_TRAIN}; writes evidence/gen{N_TRAIN}/verifier_dn.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PFPP_FORCE_CPU"):  # CPU smokes (the axon backend ignores JAX_PLATFORMS)
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

from puzzlefusion_plusplus_tpu.data.verifier_gen import generate_verifier_data
from puzzlefusion_plusplus_tpu.models.scheduler import DDPMParams
from puzzlefusion_plusplus_tpu.training import denoiser as tden
from puzzlefusion_plusplus_tpu.training import verifier as tvf
from puzzlefusion_plusplus_tpu.training.state import best_checkpoint, load_checkpoint
from puzzlefusion_plusplus_tpu.utils.config import Config

N_TRAIN = int(os.environ.get("N_TRAIN", "4096"))
MAX_SAMPLES = int(os.environ.get("MAX_SAMPLES", "1500"))
ROUNDS = int(os.environ.get("ROUNDS", "1"))
STEPS_VF = int(os.environ.get("STEPS_VF", "1000"))
EVAL_OVERFIT = int(os.environ.get("EVAL_OVERFIT", "-1"))  # subset val for CPU smokes

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
OUT = ROOT + "/out"
VF_DATA = ROOT + "/verifier_data_dn"
t0 = time.time()

from evidence import collect, write_summary  # noqa: E402 (scripts/ on sys.path)

cfg = Config()
cfg.trainer.output_dir = OUT
cfg.denoiser.encoder_ckpt_path = OUT + "/everyday/vqvae/ckpt"

# ---- 1) regenerate verifier data from the best denoiser
marker = ROOT + "/.vfdata_dn"
if not os.path.exists(marker):
    model = tden.make_model(cfg)
    encoder = tden.load_frozen_encoder(cfg)
    ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
    best = best_checkpoint(OUT + "/everyday/denoiser/ckpt")
    assert best, "no denoiser checkpoint"
    params = load_checkpoint(best)["params"]
    sample_fn = tden.make_sample_fn(model, encoder, ddpm,
                                    cfg.denoiser.num_inference_steps)
    print(f"[{time.time()-t0:.0f}s] generating verifier data from {best}", flush=True)
    n = generate_verifier_data(
        sample_fn, params, ROOT + "/pc_data/train", ROOT + "/matching_data", VF_DATA,
        max_num_part=cfg.data.max_num_part, max_samples=MAX_SAMPLES, rounds=ROUNDS,
    )
    print(f"[{time.time()-t0:.0f}s] wrote {n} verifier samples -> {VF_DATA}", flush=True)
    open(marker, "w").write(str(n))

# ---- 2) fresh verifier on the denoiser-generated data
cfg.data.verifier_data_path = VF_DATA
cfg.trainer.output_dir = ROOT + "/out_dnvf"
cfg.data.batch_size = 64
cfg.data.val_batch_size = 64
print(f"[{time.time()-t0:.0f}s] training verifier on denoiser data ({STEPS_VF} steps)",
      flush=True)
tvf.train(cfg, max_steps=STEPS_VF)
collect(ROOT + "/out_dnvf/everyday/verifier", f"gen{N_TRAIN}/verifier_dn")

# ---- 3) engine A/B: synthetic-data verifier vs denoiser-data verifier
from puzzlefusion_plusplus_tpu.inference.run import run_inference

comparison = {}
for tag, vf_ckpt in (
    ("synthetic-verifier", OUT + "/everyday/verifier/ckpt"),
    ("denoiser-verifier", ROOT + "/out_dnvf/everyday/verifier/ckpt"),
):
    ecfg = Config()
    ecfg.data.data_val_dir = ROOT + "/pc_data/val"
    ecfg.data.matching_data_path = ROOT + "/matching_data"
    ecfg.trainer.output_dir = ROOT + "/out_dnvf"
    ecfg.trainer.experiment_name = "engine_" + tag
    ecfg.denoiser.encoder_ckpt_path = OUT + "/everyday/vqvae/ckpt"
    ecfg.denoiser.ckpt_path = OUT + "/everyday/denoiser/ckpt"
    ecfg.verifier.ckpt_path = vf_ckpt
    ecfg.data.overfit = EVAL_OVERFIT
    ecfg.inference.batch_size = 8
    ecfg.inference.save_trajectories = False
    ecfg.inference.save_breakdown = True
    agg = run_inference(ecfg)
    # merge telemetry: the engine outcome question is WHETHER the verifier gates merges
    bd_path = os.path.join(ROOT, "out_dnvf", "engine_" + tag, "inference", "results",
                           "breakdown.jsonl")
    merged = []
    if os.path.exists(bd_path):
        merged = [json.loads(l).get("n_merged_pairs", 0) for l in open(bd_path)]
    agg["total_merged_pairs"] = int(np.sum(merged)) if merged else 0
    comparison[tag] = agg
    print(f"[{time.time()-t0:.0f}s] engine ({tag}): {json.dumps(agg)}", flush=True)

eng_dir = ROOT + "/out_dnvf/engine_eval"
os.makedirs(eng_dir, exist_ok=True)
write_summary(eng_dir, "verifier_provenance_engine", {
    "comparison": comparison, "n_train": N_TRAIN, "max_samples": MAX_SAMPLES,
    "steps_vf": STEPS_VF,
    "note": "reference provenance: verifier data generated by the trained denoiser "
            "(docs/data_preparation.md); stage A used synthetic-perturbation labels",
})
collect(eng_dir, f"gen{N_TRAIN}/verifier_dn")
print(f"[{time.time()-t0:.0f}s] done", flush=True)
