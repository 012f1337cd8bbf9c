"""Diagnose the engine's sensitivity to matching-data quality (r5 follow-up).

The stage-B model-vs-GT matching comparison returned BIT-IDENTICAL engine metrics
(evidence/gen4096/matcher_out/engine_matching_comparison.summary.json) even though the
two matching trees differ materially (7 vs 88 valid edges on shape 10000, different
correspondences -> different verifier CD-histogram features, verified by direct feature
comparison). Matching data reaches the engine ONLY through those histogram features
(inference/engine.py::edge_histograms -> verify_phase, mirroring auto_aggl.py:184-206),
so identical outcomes mean the verifier's thresholded decisions coincided everywhere.
This probe quantifies that with the r5 merge telemetry: per-shape merged-pair counts and
iteration counts under both matching variants, plus the per-shape metric deltas.

Env: N_TRAIN=4096 SUBSET=-1 (all val shapes) BATCH=8.
Writes evidence/gen{N_TRAIN}/engine/matching_sensitivity.summary.json.
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

from puzzlefusion_plusplus_tpu.inference.run import run_inference
from puzzlefusion_plusplus_tpu.utils.config import Config

N_TRAIN = int(os.environ.get("N_TRAIN", "4096"))
SUBSET = int(os.environ.get("SUBSET", "-1"))
BATCH = int(os.environ.get("BATCH", "8"))
MATCH_DIR = os.environ.get("MATCH_DIR", "matching_data_matcher_out")

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
t0 = time.time()

from evidence import collect, write_summary  # noqa: E402 (scripts/ on sys.path)

runs = {}
for tag, mpath in (("model", ROOT + "/" + MATCH_DIR), ("gt", ROOT + "/matching_data")):
    cfg = Config()
    cfg.data.data_val_dir = ROOT + "/pc_data/val"
    cfg.data.matching_data_path = mpath
    cfg.data.overfit = SUBSET
    cfg.trainer.output_dir = ROOT + "/out_msens"
    cfg.trainer.experiment_name = tag
    cfg.denoiser.encoder_ckpt_path = ROOT + "/out/everyday/vqvae/ckpt"
    cfg.denoiser.ckpt_path = ROOT + "/out/everyday/denoiser/ckpt"
    cfg.verifier.ckpt_path = ROOT + "/out/everyday/verifier/ckpt"
    cfg.inference.batch_size = BATCH
    cfg.inference.save_trajectories = False
    cfg.inference.save_breakdown = True
    bd_path = os.path.join(ROOT, "out_msens", tag, "inference", "results",
                           "breakdown.jsonl")
    if os.path.exists(bd_path):
        os.remove(bd_path)
    agg = run_inference(cfg)
    bd = [json.loads(l) for l in open(bd_path)] if os.path.exists(bd_path) else []
    runs[tag] = {"agg": agg, "by_shape": {b["data_id"]: b for b in bd}}
    print(f"[{time.time()-t0:.0f}s] {tag}: {json.dumps(agg)} | merged_pairs="
          f"{sum(b['n_merged_pairs'] for b in bd)}", flush=True)

ids = sorted(set(runs["model"]["by_shape"]) & set(runs["gt"]["by_shape"]))
per_shape = []
for i in ids:
    a, b = runs["model"]["by_shape"][i], runs["gt"]["by_shape"][i]
    per_shape.append({
        "data_id": i,
        "merged_pairs": [a["n_merged_pairs"], b["n_merged_pairs"]],
        "n_iters": [a["n_iters"], b["n_iters"]],
        "part_acc": [a["part_acc"], b["part_acc"]],
        "differs": (a["n_merged_pairs"] != b["n_merged_pairs"]
                    or abs(a["part_acc"] - b["part_acc"]) > 1e-9),
    })
n_diff = sum(p["differs"] for p in per_shape)
total_merges = [sum(p["merged_pairs"][j] for p in per_shape) for j in (0, 1)]
verdict = (
    "no merges executed under either variant — matching data cannot influence outcomes "
    "through a merge gate that never opens" if total_merges == [0, 0] else
    f"merges executed ({total_merges[0]} model / {total_merges[1]} gt pairs) but "
    f"{n_diff}/{len(per_shape)} shapes differ — "
    + ("decisions coincide despite differing features" if n_diff == 0
       else "outcomes ARE matching-sensitive")
)
print(f"[{time.time()-t0:.0f}s] verdict: {verdict}", flush=True)

out_dir = ROOT + "/out_msens"
write_summary(out_dir, "matching_sensitivity", {
    "aggregate": {k: v["agg"] for k, v in runs.items()},
    "total_merged_pairs": {"model": total_merges[0], "gt": total_merges[1]},
    "shapes_differing": n_diff,
    "n_shapes": len(per_shape),
    "per_shape": per_shape,
    "verdict": verdict,
})
collect(out_dir, f"gen{N_TRAIN}/engine")
