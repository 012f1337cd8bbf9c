"""Numerical sanitizers (SURVEY.md §5.2 — the reference's detect_anomaly / NaN asserts).

The reference guards numerics with Lightning ``detect_anomaly=True`` (train_matching.py:68),
NaN asserts inside Sinkhorn (linear_solvers.py:171-177), and range asserts on
doubly-stochastic matrices (loss.py:41-45). JAX-native equivalents:

  * ``check_finite``       — checkify-free masked finiteness check that raises on host.
  * ``assert_doubly_stochastic`` — range/rowsum check for Sinkhorn outputs.
  * ``debug_nans``         — context manager enabling jax_debug_nans (traps the first NaN
    with a traceback into the offending primitive — the detect_anomaly analogue).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, name: str = "value") -> None:
    """Host-side finiteness assert over a pytree (call on device_get'd results)."""
    bad = [
        path
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if np.issubdtype(np.asarray(leaf).dtype, np.floating)
        and not np.isfinite(np.asarray(leaf)).all()
    ]
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def assert_doubly_stochastic(mat: jnp.ndarray, n_rows, n_cols, atol: float = 1e-3) -> None:
    """Sinkhorn-output sanity (reference loss.py:41-45): entries in [0, 1], valid row sums
    ~1. Host-side; call on materialized arrays."""
    m = np.asarray(mat)
    if not ((m >= -atol) & (m <= 1 + atol)).all():
        raise AssertionError(f"doubly-stochastic range violated: [{m.min()}, {m.max()}]")
    n_rows = np.asarray(n_rows)
    for b in range(m.shape[0]):
        r = int(n_rows[b])
        if r:
            sums = m[b, :r].sum(-1)
            if not np.allclose(sums, 1.0, atol=max(atol, 1e-2)):
                raise AssertionError(f"row sums off: {sums.min()}..{sums.max()}")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """jax_debug_nans around a block — the detect_anomaly analogue (recompiles unjitted)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
