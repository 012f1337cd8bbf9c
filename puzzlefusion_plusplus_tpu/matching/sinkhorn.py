"""Log-space Sinkhorn (on-device) + Hungarian assignment (host callback).

Semantics follow the reference's Sinkhorn (Jigsaw_matching/utils/linear_solvers.py:9-247):
  * input is an UNNORMALIZED affinity matrix; scores are divided by tau and iterated in
    log space with row/column logsumexp normalizations (:158-177),
  * padded rows/cols beyond (n_rows, n_cols) are excluded from the normalization and the
    output is zero there,
  * ``max_iter`` alternating row/col steps, returning exp of the final log matrix.

Hungarian (scipy linear_sum_assignment) is test-time only in the reference (:279-340); we wrap
it in ``jax.pure_callback`` so it composes with jit without pretending to be a TPU op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e18


def sinkhorn_log(
    scores: jnp.ndarray,  # [B, N, M] raw affinities
    n_rows: jnp.ndarray,  # [B]
    n_cols: jnp.ndarray,  # [B]
    max_iter: int = 20,
    tau: float = 0.05,
) -> jnp.ndarray:
    """Masked log-space Sinkhorn -> approximately doubly-stochastic [B, N, M]."""
    B, N, M = scores.shape
    row_valid = jnp.arange(N)[None, :] < n_rows[:, None]  # [B, N]
    col_valid = jnp.arange(M)[None, :] < n_cols[:, None]  # [B, M]
    mask = row_valid[:, :, None] & col_valid[:, None, :]

    log_s = jnp.where(mask, scores / tau, _NEG)

    def body(log_s, i):
        # row normalization then column normalization (reference alternates per iteration)
        log_s = log_s - jnp.where(
            row_valid[:, :, None],
            jax.scipy.special.logsumexp(log_s, axis=2, keepdims=True),
            0.0,
        )
        log_s = jnp.where(mask, log_s, _NEG)
        log_s = log_s - jnp.where(
            col_valid[:, None, :],
            jax.scipy.special.logsumexp(log_s, axis=1, keepdims=True),
            0.0,
        )
        log_s = jnp.where(mask, log_s, _NEG)
        return log_s, None

    log_s, _ = jax.lax.scan(body, log_s, jnp.arange(max_iter))
    return jnp.where(mask, jnp.exp(log_s), 0.0)


def _hungarian_host(scores: np.ndarray, n_rows: np.ndarray, n_cols: np.ndarray) -> np.ndarray:
    from scipy.optimize import linear_sum_assignment

    B, N, M = scores.shape
    out = np.zeros_like(scores, dtype=np.float32)
    for b in range(B):
        r, c = int(n_rows[b]), int(n_cols[b])
        if r == 0 or c == 0:
            continue
        ri, ci = linear_sum_assignment(-scores[b, :r, :c])
        out[b, ri, ci] = 1.0
    return out


def hungarian(
    scores: jnp.ndarray, n_rows: jnp.ndarray, n_cols: jnp.ndarray
) -> jnp.ndarray:
    """Maximize-score assignment as a 0/1 permutation-ish matrix (host callback)."""
    return jax.pure_callback(
        functools.partial(_hungarian_host),
        jax.ShapeDtypeStruct(scores.shape, jnp.float32),
        scores, n_rows, n_cols,
        vmap_method="sequential",
    )
