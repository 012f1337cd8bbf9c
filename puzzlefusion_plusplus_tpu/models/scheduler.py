"""DDPM scheduler with the PuzzleFusion++ piecewise alpha-bar schedule (pure arrays + functions).

Re-implements the exact sampling semantics the reference gets from diffusers' ``DDPMScheduler``
subclassed as ``PiecewiseScheduler`` (puzzlefusion_plusplus/denoiser/model/modules/
custom_diffusers.py:5-69) with the reference's config (config/denoiser/model.yaml:18-25):
1000 train steps, epsilon prediction, ``timestep_spacing='leading'``, ``clip_sample=False``,
default ``variance_type='fixed_small'``, and betas **overridden post-init** by the piecewise
alpha-bar: quadratic 1 -> 0.9 over t in [0, 700], quadratic 0.9 -> 0 over [700, 1000].

Design: no scheduler object on the compute path — a frozen ``DDPMParams`` pytree of precomputed
arrays plus pure ``add_noise`` / ``step`` functions, so the 20-step reverse loop compiles to a
single ``lax.scan`` inside the denoiser sampler and the agglomeration engine.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


def piecewise_alpha_bar(t: np.ndarray) -> np.ndarray:
    """Continuous alpha-bar(t), t in [0, 1] (reference custom_diffusers.py:38-46)."""
    t = np.asarray(t, np.float64) * 1000.0
    early = 1.0 - 0.1 * (t / 700.0) ** 2
    late = 0.9 * (1.0 - ((t - 700.0) / 300.0) ** 2)
    return np.where(t <= 700.0, early, late)


def piecewise_betas(num_train_timesteps: int = 1000, max_beta: float = 0.999) -> np.ndarray:
    """Discretized betas from the piecewise alpha-bar (reference custom_diffusers.py:49-56)."""
    i = np.arange(num_train_timesteps, dtype=np.float64)
    t1 = i / num_train_timesteps
    t2 = (i + 1) / num_train_timesteps
    betas = 1.0 - piecewise_alpha_bar(t2) / piecewise_alpha_bar(t1)
    return np.minimum(betas, max_beta).astype(np.float32)


class DDPMParams(NamedTuple):
    """Precomputed schedule arrays (all [T])."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    num_train_timesteps: int

    @staticmethod
    def piecewise(num_train_timesteps: int = 1000) -> "DDPMParams":
        betas = piecewise_betas(num_train_timesteps)
        alphas = 1.0 - betas
        return DDPMParams(
            betas=jnp.asarray(betas),
            alphas=jnp.asarray(alphas),
            alphas_cumprod=jnp.asarray(np.cumprod(alphas.astype(np.float64)).astype(np.float32)),
            num_train_timesteps=num_train_timesteps,
        )


def leading_timesteps(num_train_timesteps: int, num_inference_steps: int) -> np.ndarray:
    """Inference timesteps for ``timestep_spacing='leading'``: [950, 900, ..., 50, 0] for 20."""
    step_ratio = num_train_timesteps // num_inference_steps
    return (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy().astype(np.int32)


def add_noise(
    params: DDPMParams, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward-process noising: sqrt(abar_t) x0 + sqrt(1 - abar_t) eps.

    t: integer timesteps broadcastable against sample's leading dims (e.g. [B] vs [B, P, 7]).
    """
    abar = params.alphas_cumprod[t]
    abar = abar.reshape(abar.shape + (1,) * (sample.ndim - abar.ndim))
    return jnp.sqrt(abar) * sample + jnp.sqrt(1.0 - abar) * noise


def step(
    params: DDPMParams,
    model_output: jnp.ndarray,
    t: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    num_inference_steps: int,
) -> jnp.ndarray:
    """One reverse-diffusion step (diffusers DDPMScheduler.step, epsilon/fixed_small/no-clip).

    ``noise`` must be pre-sampled standard normal of sample's shape (ignored at t == 0).
    ``t`` may be a traced scalar — the function is scan-compatible.
    """
    t = jnp.asarray(t, jnp.int32)
    prev_t = t - params.num_train_timesteps // num_inference_steps

    alpha_prod_t = params.alphas_cumprod[t]
    alpha_prod_t_prev = jnp.where(prev_t >= 0, params.alphas_cumprod[jnp.maximum(prev_t, 0)], 1.0)
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    current_alpha_t = alpha_prod_t / alpha_prod_t_prev
    current_beta_t = 1.0 - current_alpha_t

    # epsilon prediction, no clipping
    pred_x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(alpha_prod_t)

    pred_x0_coeff = jnp.sqrt(alpha_prod_t_prev) * current_beta_t / beta_prod_t
    sample_coeff = jnp.sqrt(current_alpha_t) * beta_prod_t_prev / beta_prod_t
    prev_sample = pred_x0_coeff * pred_x0 + sample_coeff * sample

    # fixed_small variance, clamped at 1e-20, added only for t > 0
    variance = jnp.clip(beta_prod_t_prev / beta_prod_t * current_beta_t, 1e-20, None)
    prev_sample = jnp.where(t > 0, prev_sample + jnp.sqrt(variance) * noise, prev_sample)
    return prev_sample
