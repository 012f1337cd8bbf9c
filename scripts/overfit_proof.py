"""TPU production-scale overfit proof (VERDICT #3): full 3-stage pipeline on NUM_SHAPES
synthetic shapes until the engine's part_acc clears the CD<0.01 bar.

Stage 1: VQ-VAE overfit (rotation-augmented) -> trained frozen encoder.
Stage 2: denoiser overfit at batch 64 (fixed-augmentation samples tiled), timesteps drawn
         from the 20 inference steps (the AdaLN table rows inference actually uses — with
         t~U[0,1000) each row would get STEPS/1000 updates; the reference amortizes the
         full table over ~1.4M steps).
Stage 3: verifier trained on the synthetic verifier data.
Engine:  part_acc with merging disabled (pure denoise path) AND with the trained verifier.

Env: NUM_SHAPES=1 STEPS_AE=1500 STEPS_DN=4000 STEPS_VF=400
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

import functools

import numpy as np
import jax.numpy as jnp

from puzzlefusion_plusplus_tpu.data import generate_dataset
from puzzlefusion_plusplus_tpu.data.datasets import DenoiserDataset, VQVAEDataset
from puzzlefusion_plusplus_tpu.models.scheduler import (
    DDPMParams, add_noise, leading_timesteps,
)
from puzzlefusion_plusplus_tpu.inference.sampler import extract_features
from puzzlefusion_plusplus_tpu.training import vqvae as tvq
from puzzlefusion_plusplus_tpu.training import verifier as tvf
from puzzlefusion_plusplus_tpu.training.denoiser import (
    eval_metrics, load_frozen_encoder, make_model, make_sample_fn,
)
from puzzlefusion_plusplus_tpu.training.state import (
    TrainState, adamw_reference, create_state, save_checkpoint,
)
from puzzlefusion_plusplus_tpu.utils.config import Config

NUM_SHAPES = int(os.environ.get("NUM_SHAPES", "1"))
STEPS_AE = int(os.environ.get("STEPS_AE", "1500"))
STEPS_DN = int(os.environ.get("STEPS_DN", "4000"))
STEPS_VF = int(os.environ.get("STEPS_VF", "400"))
B = 64

ROOT = f"/tmp/pfpp_overfit_tpu_{NUM_SHAPES}"
OUT = ROOT + "/out"
if not os.path.exists(ROOT + "/.done"):
    generate_dataset(ROOT, num_shapes=NUM_SHAPES, seed=3, split="val",
                     min_parts=4, max_parts=6, n_points=1000)
    open(ROOT + "/.done", "w").write("ok")

cfg = Config()
cfg.data.data_dir = ROOT + "/pc_data/val"
cfg.data.data_val_dir = ROOT + "/pc_data/val"
cfg.data.matching_data_path = ROOT + "/matching_data"
cfg.data.verifier_data_path = ROOT + "/verifier_data"
cfg.data.batch_size = 1
cfg.data.val_batch_size = 1
cfg.trainer.output_dir = OUT
cfg.trainer.num_devices = 1
cfg.denoiser.dropout = 0.0
cfg.denoiser.pe_dropout = 0.0

t_start = time.time()

# ---------------- Stage 1: VQ-VAE ----------------
ae_ckpt = OUT + "/everyday/vqvae/ckpt"
if not os.path.isdir(ae_ckpt):
    print(f"[{time.time()-t_start:.0f}s] stage 1: VQ-VAE {STEPS_AE} steps", flush=True)
    tvq.train(cfg, max_steps=STEPS_AE)
cfg.denoiser.encoder_ckpt_path = ae_ckpt

# ---------------- Stage 2: denoiser overfit ----------------
encoder = load_frozen_encoder(cfg)
model = make_model(cfg)
ddpm = DDPMParams.piecewise(cfg.denoiser.ddpm_train_steps)
P, L, C = cfg.data.max_num_part, cfg.denoiser.num_point, cfg.denoiser.num_dim

ds = DenoiserDataset(cfg.data.data_val_dir, mode="test",
                     matching_data_path=cfg.data.matching_data_path,
                     max_num_part=P, multiple_ref_parts=False)
fixed = [ds.get(i, np.random.default_rng(42 + i)) for i in range(len(ds))]
reps = B // len(fixed)
batch = {
    k: jnp.asarray(np.stack([np.asarray(s[k]) for s in fixed for _ in range(reps)]))
    for k in fixed[0]
    if isinstance(fixed[0][k], (np.ndarray, np.generic, int, float))
}
Bt = batch["part_pcs"].shape[0]

init_fn = jax.jit(lambda k: model.init(
    k, jnp.zeros((1, P, 7)), jnp.zeros((1,), jnp.int32),
    jnp.zeros((1, P, L, C)), jnp.zeros((1, P, L, 3)),
    jnp.ones((1, P)), jnp.ones((1, P, 1)), jnp.zeros((1, P), bool), train=False))
variables = init_fn(jax.random.key(1))
tx = adamw_reference(cfg.denoiser.lr)
state = create_state(variables, tx)
infer_ts = jnp.asarray(leading_timesteps(cfg.denoiser.ddpm_train_steps, 20))

gt = jnp.concatenate([batch["part_trans"], batch["part_rots"]], -1)
ref = batch["ref_part"].astype(bool)
mask = (batch["part_valids"] > 0) & ~ref
w = mask[..., None].astype(jnp.float32)


@functools.partial(jax.jit, donate_argnames=("state",))
def step_fn(state, rng):
    def lf(params):
        t_rng, n_rng = jax.random.split(rng)
        t = infer_ts[jax.random.randint(t_rng, (Bt,), 0, infer_ts.shape[0])]
        noise = jax.random.normal(n_rng, gt.shape, gt.dtype)
        noisy = add_noise(ddpm, gt, noise, t)
        noisy = jnp.where(ref[..., None], gt, noisy)
        latent, xyz = extract_features(encoder, batch["part_pcs"], batch["part_valids"],
                                       noisy)
        pred = model.apply({"params": params}, noisy, t,
                           jax.lax.stop_gradient(latent), jax.lax.stop_gradient(xyz),
                           batch["part_valids"], batch["part_scale"], ref, train=False)
        return ((pred - noise) ** 2 * w).sum() / jnp.maximum(w.sum() * 7.0, 1.0)

    loss, grads = jax.value_and_grad(lf)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return TrainState(jax.tree.map(lambda p, u: p + u, state.params, updates),
                      state.batch_stats, new_opt, state.step + 1), loss


sample_fn = make_sample_fn(model, encoder, ddpm, cfg.denoiser.num_inference_steps)
eval_batch = {k: v[:: reps] for k, v in batch.items()}  # one copy per shape

print(f"[{time.time()-t_start:.0f}s] stage 2: denoiser overfit, batch {Bt}", flush=True)
rng = jax.random.key(7)
best_acc = 0.0
for step in range(1, STEPS_DN + 1):
    rng, k = jax.random.split(rng)
    state, loss = step_fn(state, k)
    if step % 250 == 0 or step == 1:
        final, _ = sample_fn(state.params, eval_batch, jax.random.key(0))
        m = {k2: float(np.mean(v2))
             for k2, v2 in jax.device_get(eval_metrics(final, eval_batch)).items()}
        print(f"[{time.time()-t_start:.0f}s] step {step}: mse={float(loss):.5f} " +
              " ".join(f"{k2}={v2:.4f}" for k2, v2 in m.items()), flush=True)
        best_acc = max(best_acc, m["part_acc"])
        if m["part_acc"] > 0.95:
            print("part_acc bar cleared, stopping early", flush=True)
            break

dn_ckpt = save_checkpoint(OUT + "/everyday/denoiser/ckpt", state, int(state.step))

# ---------------- Stage 3: verifier ----------------
print(f"[{time.time()-t_start:.0f}s] stage 3: verifier {STEPS_VF} steps", flush=True)
cfg.data.batch_size = 8
cfg.data.val_batch_size = 8
tvf.train(cfg, max_steps=STEPS_VF)
vf_ckpt = OUT + "/everyday/verifier/ckpt"

# ---------------- Engine ----------------
from puzzlefusion_plusplus_tpu.inference.run import SAMPLE_KEYS, build_engine_fn

cfg.denoiser.ckpt_path = dn_ckpt
sample = {k: jnp.asarray(np.stack([np.asarray(s[k]) for s in fixed]))
          for k in SAMPLE_KEYS}
n = sample["part_pcs"].shape[0]
rngs = jax.random.split(jax.random.key(0), n)

for label, thr, ck in (("no-merge", 1.1, ""), ("full", 0.9, vf_ckpt)):
    cfg.verifier.threshold = thr
    cfg.verifier.ckpt_path = ck
    engine = build_engine_fn(cfg)
    res = jax.device_get(engine(sample, rngs))
    print(f"[{time.time()-t_start:.0f}s] engine[{label}]: " +
          " ".join(f"{k2}={float(np.mean(res[k2])):.4f}"
                   for k2 in ("part_acc", "shape_cd", "rmse_r", "rmse_t")), flush=True)
