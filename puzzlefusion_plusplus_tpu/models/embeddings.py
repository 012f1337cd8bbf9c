"""Shared embedding utilities: NeRF frequency embedding + sinusoidal position table.

Matches the reference's utils/model_utils.py:
  * ``nerf_embed``       — EmbedderNerf (:39-69): concat(x, sin(x*2^0), cos(x*2^0), ...,
    sin(x*2^{L-1}), cos(x*2^{L-1})) in exactly that interleaving (the following Linear layers'
    checkpoint layout depends on the ordering).
  * ``sinusoidal_table`` — PositionalEncoding (:5-21): the classic transformer PE matrix.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def nerf_embed_dim(input_dims: int, num_freqs: int = 10, include_input: bool = True) -> int:
    return input_dims * ((1 if include_input else 0) + 2 * num_freqs)


def nerf_embed(
    x: jnp.ndarray, num_freqs: int = 10, include_input: bool = True
) -> jnp.ndarray:
    """[..., d] -> [..., d * (1 + 2*num_freqs)] with log-sampled freqs 2^0 .. 2^{num_freqs-1}."""
    freqs = 2.0 ** np.linspace(0.0, num_freqs - 1.0, num_freqs)
    outs = [x] if include_input else []
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] sin/cos position table (reference model_utils.py:5-21)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)
