"""Overfit-gap probe: evaluate the best denoiser checkpoint's full-sampling metrics on a
subset of its own TRAINING shapes, using the exact val-eval pipeline (val-mode dataset
semantics, bucketed batches, make_sample_fn + eval_metrics).

Decomposition evidence for the held-out plateau (VERDICT r2 #3): the gap between train-split
part_acc and the logged eval_part_acc on held-out shapes separates "the model can't fit this
data/task" (both low) from "the model memorizes N_TRAIN shapes and N_TRAIN is too small"
(train high, held-out low). The reference never needs this probe because it trains on ~34k
real Breaking Bad fractures (docs/data.md); our synthetic N is the variable under study.

Env: N_TRAIN=512 SUBSET=32 BATCH=16 (reads /tmp/pfpp_gen_{N_TRAIN}/out checkpoints)
"""

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

N_TRAIN = int(os.environ.get("N_TRAIN", "512"))
SUBSET = int(os.environ.get("SUBSET", "32"))
BATCH = int(os.environ.get("BATCH", "16"))
SPLIT = os.environ.get("SPLIT", "train")

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
OUT = ROOT + "/out"
t0 = time.time()

cfg = Config()
cfg.trainer.output_dir = OUT
cfg.denoiser.encoder_ckpt_path = OUT + "/everyday/vqvae/ckpt"

model = tden.make_model(cfg)
encoder = tden.load_frozen_encoder(cfg)
ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
mesh = data_parallel_mesh(1)

ckpt_dir = OUT + "/everyday/denoiser/ckpt"
best = best_checkpoint(ckpt_dir)
assert best is not None, f"no checkpoints under {ckpt_dir}"
restored = load_checkpoint(best)
print(f"[{time.time()-t0:.0f}s] best ckpt: {best}", flush=True)

# val-mode semantics over the requested split's files: deterministic eval-time transforms,
# identical to the in-training eval on held-out shapes (training/denoiser.py:309-321)
ds = DenoiserDataset(
    ROOT + f"/pc_data/{SPLIT}", mode="val", max_num_part=cfg.data.max_num_part,
    multiple_ref_parts=cfg.denoiser.multiple_ref_parts, overfit=SUBSET,
)
# mirror the training setup: synthetic_train_eval.py sets part_bucket_multiple from
# BUCKET_MULT (default 4), while the dataclass default is 0 (off) — using the dataclass
# default here crashed stage A1 with a ZeroDivisionError in part_bucket (r5 fix); 0 now
# means "no bucketing": every batch stays at the global pad
bucket_mult = int(os.environ.get("BUCKET_MULT", "4"))
keys = ([part_bucket(int(c), bucket_mult, cap=cfg.data.max_num_part)
         for c in ds.num_parts_list()] if bucket_mult else None)
loader = Loader(ds, BATCH, shuffle=False, drop_last=False, seed=0, bucket_key=keys)

params = restored["params"]
sample_fn = tden.make_sample_fn(model, encoder, ddpm, cfg.denoiser.num_inference_steps)

rng = jax.random.key(7)
accs = []
for batch in loader:
    P_b = (part_bucket(int(np.max(batch["num_parts"])), bucket_mult,
                       cap=cfg.data.max_num_part)
           if bucket_mult else cfg.data.max_num_part)
    b = slice_batch_parts(tden.numeric_batch(batch), P_b)
    padded, _ = pad_batch_to_devices(b, mesh.devices.size)
    sharded = shard_batch(padded, mesh)
    rng, k = jax.random.split(rng)
    final, _ = sample_fn(params, sharded, k)
    m = jax.device_get(tden.eval_metrics(final, sharded))
    accs.append({k2: float(np.mean(v)) for k2, v in m.items()})
    print(f"[{time.time()-t0:.0f}s] batch P={P_b}: "
          f"{ {k2: round(v, 4) for k2, v in accs[-1].items()} }", flush=True)

agg = {k2: float(np.mean([a[k2] for a in accs])) for k2 in accs[0]}
print(f"[{time.time()-t0:.0f}s] {SPLIT}-split ({SUBSET} shapes) metrics: {agg}", flush=True)

# persist into the committed evidence tree (survives /tmp dying with the host)
from evidence import collect, write_summary  # noqa: E402 (scripts/ on sys.path)

eng_dir = OUT + "/engine_eval"
os.makedirs(eng_dir, exist_ok=True)
write_summary(eng_dir, f"{SPLIT}split_sampling", {
    "metrics": agg, "n_train": N_TRAIN, "subset": SUBSET, "split": SPLIT,
    "best_ckpt": best, "per_batch": accs,
})
collect(eng_dir, f"gen{N_TRAIN}/engine")
