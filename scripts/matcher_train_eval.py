"""Matcher training at scale + matching-data round trip on held-out shapes
(VERDICT r2 #2a/#2c follow-through).

Trains the production JigsawModel on the SAME synthetic shape set as
scripts/synthetic_train_eval.py (shares /tmp/pfpp_gen_{N_TRAIN}), logging the held-out
mat_f1 curve (the reference's val monitor, Jigsaw_matching/train_matching.py:41-49;
the reference trains 250 epochs, experiments/jigsaw_4x4_128_512_250e_cosine_everyday.yaml).

Then, if the main pipeline's checkpoints exist (synthetic_train_eval.py finished), it
closes the loop the reference closes with eval.sh + test.py: generate
``matching_data/{id}.npz`` from the trained matcher on the HELD-OUT split
(matching/generate.py, reference matching_base_model.py:614-640 schema) and run the full
engine twice — once consuming the model-generated matching data, once the GT-synthetic
artifacts — printing the comparison table for VALIDATION.md.

Env: N_TRAIN=512 N_VAL=32 EPOCHS=120 BATCH=4 NUM_POINTS=2000 VAL_EVERY=10
     MAT_EPOCH=5 RIG_EPOCH=96 (reference ratios 10/200 of 250 scaled to EPOCHS)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PFPP_CPU", "0") == "1":
    # CPU smoke runs (wiring checks while the chip is busy): JAX_PLATFORMS env is
    # ignored on this host (force-registered axon backend, CLAUDE.md) — the config
    # update before any device touch is the only working switch
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np

N_TRAIN = int(os.environ.get("N_TRAIN", "512"))
N_VAL = int(os.environ.get("N_VAL", "32"))
EPOCHS = int(os.environ.get("EPOCHS", "120"))
BATCH = int(os.environ.get("BATCH", "4"))
NUM_POINTS = int(os.environ.get("NUM_POINTS", "2000"))
VAL_EVERY = int(os.environ.get("VAL_EVERY", "10"))
# >1 escapes plain BCE's all-negative base-rate minimum (~18% positives) in epochs
# instead of the reference's O(100); 1.0 restores exact reference loss parity
POS_WEIGHT = float(os.environ.get("POS_WEIGHT", "4.0"))
MAT_EPOCH = int(os.environ.get("MAT_EPOCH", str(max(EPOCHS * 10 // 250, 1))))
RIG_EPOCH = int(os.environ.get("RIG_EPOCH", str(EPOCHS * 200 // 250)))
# 1 = per-piece PCA-canonicalized encoder inputs (matching/ops.py::pca_canonicalize):
# SO(3)-invariance by construction instead of the reference's 250-epoch augmentation
# schedule — the r4 bottleneck decomposition showed rotation-robust affinity features are
# the held-out mat_f1 gap. 0 = exact reference input parity (raw rotated clouds).
CANONICALIZE = os.environ.get("CANONICALIZE", "0") == "1"

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
OUT = os.environ.get("MATCHER_OUT", ROOT + "/matcher_out")
t0 = time.time()

if not os.path.exists(ROOT + "/.done"):
    from puzzlefusion_plusplus_tpu.data import generate_dataset

    print(f"[{time.time()-t0:.0f}s] generating {N_TRAIN}+{N_VAL} shapes", flush=True)
    generate_dataset(ROOT, num_shapes=N_TRAIN, seed=11, split="train",
                     min_parts=2, max_parts=20, n_points=1000)
    generate_dataset(ROOT, num_shapes=N_VAL, seed=12, split="val",
                     min_parts=2, max_parts=20, n_points=1000)
    open(ROOT + "/.done", "w").write("ok")

from evidence import collect, write_summary  # noqa: E402 (scripts/ on sys.path)
from puzzlefusion_plusplus_tpu.matching.oracle import oracle_matching_stats
from puzzlefusion_plusplus_tpu.matching.train import make_model, train_matching

# the metric's structural ceiling at this operating point (matching/oracle.py): the
# held-out mat_f1 curve below should be read as achieved/oracle, not raw
oracle = oracle_matching_stats(ROOT + "/pc_data/val", num_points=NUM_POINTS,
                               num_shapes=min(N_VAL, 16))
print(f"[{time.time()-t0:.0f}s] val oracle ceiling @ {NUM_POINTS} pts: "
      f"{json.dumps(oracle)}", flush=True)
print(f"[{time.time()-t0:.0f}s] matcher: {EPOCHS} epochs, batch {BATCH}, "
      f"{NUM_POINTS} pts, mat@{MAT_EPOCH} rig@{RIG_EPOCH} canon={CANONICALIZE}",
      flush=True)
model = make_model(canonicalize=CANONICALIZE)
state = train_matching(
    ROOT + "/pc_data/train",
    out_dir=OUT,
    epochs=EPOCHS,
    batch_size=BATCH,
    num_points=NUM_POINTS,
    mat_epoch=MAT_EPOCH,
    rig_epoch=RIG_EPOCH,
    model=model,
    val_data_dir=ROOT + "/pc_data/val",
    val_every=VAL_EVERY,
    cls_pos_weight=POS_WEIGHT,
)
print(f"[{time.time()-t0:.0f}s] matcher training done", flush=True)
write_summary(OUT, "oracle_ceiling", {
    "oracle": oracle, "num_points": NUM_POINTS, "n_train": N_TRAIN, "epochs": EPOCHS,
    "canonicalize": CANONICALIZE,
    "reference_schedule": "250 epochs, jigsaw_4x4_128_512_250e_cosine_everyday.yaml:13-20",
})
collect(OUT, f"gen{N_TRAIN}/{os.path.basename(OUT)}")  # held-out mat_f1 curve survives /tmp (VERDICT r3 #7)

# ---- matching_data from the trained matcher on the HELD-OUT split (eval.sh parity)
from puzzlefusion_plusplus_tpu.matching.generate import generate_matching_data
from puzzlefusion_plusplus_tpu.training.state import best_checkpoint, load_checkpoint

best = best_checkpoint(OUT + "/ckpt")
if best is not None:
    restored = load_checkpoint(best)
    params, batch_stats = restored["params"], restored.get("batch_stats", {})
    print(f"[{time.time()-t0:.0f}s] generating matching_data from {best}", flush=True)
else:
    params, batch_stats = state.params, state.batch_stats
match_dir = ROOT + "/matching_data_" + os.path.basename(OUT)  # variant-unique
results = generate_matching_data(
    model, params, batch_stats, ROOT + "/pc_data/val", match_dir,
    num_points=NUM_POINTS, seed=0,
)
n_edges = sum(r["num_edges"] for r in results)
print(f"[{time.time()-t0:.0f}s] wrote {len(results)} shapes, {n_edges} edges "
      f"-> {match_dir}", flush=True)

# ---- engine comparison: model-generated vs GT-synthetic matching data
dn_ckpt = ROOT + "/out/everyday/denoiser/ckpt"
need = (dn_ckpt, ROOT + "/out/everyday/vqvae/ckpt", ROOT + "/out/everyday/verifier/ckpt")
if not all(os.path.isdir(d) for d in need):
    # requiring ALL THREE stages' checkpoints: a partial set (e.g. a run killed before
    # stage 3) would crash the engine restore and crash-loop the supervisor queue
    print("main-pipeline checkpoints incomplete (synthetic_train_eval.py still running?) — "
          "skipping the engine comparison", flush=True)
    sys.exit(0)

from puzzlefusion_plusplus_tpu.inference.run import run_inference
from puzzlefusion_plusplus_tpu.utils.config import Config

comparison = {}
for tag, mpath in (("model", match_dir), ("gt-synthetic", ROOT + "/matching_data")):
    cfg = Config()
    cfg.data.data_val_dir = ROOT + "/pc_data/val"
    cfg.data.matching_data_path = mpath
    cfg.trainer.output_dir = ROOT + "/out"
    cfg.denoiser.encoder_ckpt_path = ROOT + "/out/everyday/vqvae/ckpt"
    cfg.denoiser.ckpt_path = dn_ckpt
    cfg.verifier.ckpt_path = ROOT + "/out/everyday/verifier/ckpt"
    cfg.inference.batch_size = 8
    cfg.inference.save_trajectories = False
    agg = run_inference(cfg)
    comparison[tag] = agg
    print(f"[{time.time()-t0:.0f}s] engine metrics ({tag} matching data): "
          f"{json.dumps(agg)}", flush=True)

# VERDICT r3 #6: the model-generated-vs-GT matching-data quality gate, persisted in-repo
write_summary(OUT, "engine_matching_comparison", {
    "comparison": comparison, "num_points": NUM_POINTS, "n_val": N_VAL,
    "matcher_epochs": EPOCHS, "pos_weight": POS_WEIGHT, "canonicalize": CANONICALIZE,
    "reference_loop": "eval.sh -> test.py, matching_base_model.py:274-454",
})
collect(OUT, f"gen{N_TRAIN}/{os.path.basename(OUT)}")
