"""Scheduler numerics vs an independent numpy oracle of the published DDPM algorithm."""

import jax
import jax.numpy as jnp
import numpy as np

from puzzlefusion_plusplus_tpu.models import scheduler as S


def numpy_betas():
    # independent oracle: the piecewise alpha-bar discretization from the paper config
    def abar(t):
        t = t * 1000.0
        if t <= 700:
            return 1 - 0.1 * (t / 700.0) ** 2
        return 0.9 * (1 - ((t - 700.0) / 300.0) ** 2)

    out = []
    for i in range(1000):
        out.append(min(1 - abar((i + 1) / 1000) / abar(i / 1000), 0.999))
    return np.array(out, np.float64)


def test_betas_match_oracle():
    got = S.piecewise_betas(1000)
    want = numpy_betas()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # endpoint properties of the schedule
    abar = np.cumprod(1 - want)
    assert 0.88 < abar[699] <= 0.9 + 1e-9  # ~0.9 at the breakpoint
    assert abar[-1] < 1e-3  # ~0 at t=1000


def test_leading_timesteps():
    ts = S.leading_timesteps(1000, 20)
    assert ts.tolist() == list(range(950, -1, -50))


def test_add_noise_limits():
    p = S.DDPMParams.piecewise()
    x = jnp.ones((2, 3, 7))
    eps = jnp.full((2, 3, 7), 2.0)
    near_clean = S.add_noise(p, x, eps, jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(near_clean), 1.0 * np.sqrt(1 - p.betas[0]) + 2.0 * np.sqrt(p.betas[0]), rtol=1e-4)
    near_noise = S.add_noise(p, x, eps, jnp.array([999, 999]))
    # alpha_bar(1000) ~ 0 -> almost pure (scaled) noise
    assert np.abs(np.asarray(near_noise) - 2.0).max() < 0.15


def test_step_oracle():
    """Full reverse step against a literal numpy transcription of DDPM posterior math."""
    p = S.DDPMParams.piecewise()
    abar = np.asarray(p.alphas_cumprod, np.float64)
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((2, 4, 7)).astype(np.float32)
    eps_hat = rng.standard_normal((2, 4, 7)).astype(np.float32)
    z = rng.standard_normal((2, 4, 7)).astype(np.float32)

    for t in [950, 500, 50, 0]:
        got = np.asarray(
            S.step(p, jnp.array(eps_hat), t, jnp.array(sample), jnp.array(z), 20)
        )
        prev_t = t - 50
        a_t = abar[t]
        a_prev = abar[prev_t] if prev_t >= 0 else 1.0
        b_t, b_prev = 1 - a_t, 1 - a_prev
        cur_a = a_t / a_prev
        cur_b = 1 - cur_a
        x0 = (sample - np.sqrt(b_t) * eps_hat) / np.sqrt(a_t)
        want = (np.sqrt(a_prev) * cur_b / b_t) * x0 + (np.sqrt(cur_a) * b_prev / b_t) * sample
        if t > 0:
            var = max(b_prev / b_t * cur_b, 1e-20)
            want = want + np.sqrt(var) * z
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_sampling_recovers_signal():
    """End-to-end sanity: with a perfect epsilon oracle, 20-step sampling recovers x0."""
    p = S.DDPMParams.piecewise()
    x0 = jnp.array(np.random.default_rng(1).standard_normal((4, 7)).astype(np.float32)) * 0.5
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, x0.shape)
    ts = S.leading_timesteps(1000, 20)

    for t in ts:
        abar_t = p.alphas_cumprod[t]
        # the true epsilon implied by (xt, x0)
        eps = (xt - jnp.sqrt(abar_t) * x0) / jnp.sqrt(1 - abar_t)
        key, sub = jax.random.split(key)
        xt = S.step(p, eps, int(t), xt, jax.random.normal(sub, x0.shape), 20)

    # stochastic sampling with exact oracle should land near x0
    assert float(jnp.abs(xt - x0).mean()) < 0.15
