"""Direct denoiser training extension (round-5 stage G): train until a wall-clock
deadline, no plateau gate.

The stage-E plateau gate (1% median-window improvement) fired at ~20k steps while the
A1/E1 train-split decomposition says the remaining gap is optimization, not
generalization — i.e. more steps are the one lever that can still move the held-out
engine headline. This driver simply continues `tden.train` from the latest checkpoint
with a huge epoch budget; the surrounding supervisor relaunches through tunnel OOMs and
the caller time-boxes the run by writing DEADLINE_MARKER (checked between epochs via
max_steps) or killing the process (checkpoints land at every val).

Env: N_TRAIN=4096 EPOCHS=800 BATCH=64 VAL_EVERY=4 DEADLINE_UTC="HH:MM" (optional).
"""

import datetime
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

from puzzlefusion_plusplus_tpu.training import denoiser as tden
from puzzlefusion_plusplus_tpu.utils.config import Config

N_TRAIN = int(os.environ.get("N_TRAIN", "4096"))
EPOCHS = int(os.environ.get("EPOCHS", "800"))
BATCH = int(os.environ.get("BATCH", "64"))
VAL_EVERY = int(os.environ.get("VAL_EVERY", "4"))
DEADLINE = os.environ.get("DEADLINE_UTC", "")  # "HH:MM" today, UTC

ROOT = f"/tmp/pfpp_gen_{N_TRAIN}"
OUT = ROOT + "/out"

max_steps = None
if DEADLINE:
    now = datetime.datetime.now(datetime.timezone.utc)
    hh, mm = map(int, DEADLINE.split(":"))
    dl = now.replace(hour=hh, minute=mm, second=0)
    remaining_s = max((dl - now).total_seconds(), 0)
    # ~1 step/s incl. evals at these shapes (measured stage E); bound the run so the
    # final save lands before the deadline even if the supervisor relaunched midway
    max_steps_budget = int(remaining_s * 1.0)
    print(f"deadline {DEADLINE}Z -> ~{remaining_s:.0f}s -> step budget {max_steps_budget}",
          flush=True)

cfg = Config()
cfg.data.data_dir = ROOT + "/pc_data/train"
cfg.data.data_val_dir = ROOT + "/pc_data/val"
cfg.trainer.output_dir = OUT
cfg.trainer.num_devices = 1
cfg.data.part_bucket_multiple = int(os.environ.get("BUCKET_MULT", "4"))
cfg.data.batch_size = BATCH
cfg.data.val_batch_size = 16
cfg.denoiser.encoder_ckpt_path = OUT + "/everyday/vqvae/ckpt"
cfg.denoiser.train_on_inference_timesteps = True
cfg.denoiser.val_every = VAL_EVERY
cfg.denoiser.epochs = EPOCHS

if DEADLINE:
    # translate the wall budget into an absolute step bound from the restored counter
    from puzzlefusion_plusplus_tpu.training.state import latest_checkpoint

    ck = latest_checkpoint(OUT + "/everyday/denoiser/ckpt")
    start = int(ck.rsplit("_", 1)[1]) if ck else 0
    max_steps = start + max_steps_budget
    print(f"resume ~step {start}, max_steps {max_steps}", flush=True)

t0 = time.time()
tden.train(cfg, max_steps=max_steps)
print(f"[{time.time()-t0:.0f}s] extension done", flush=True)
