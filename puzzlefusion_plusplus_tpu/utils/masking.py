"""Fixed-shape replacements for the reference's boolean-gather part flattening.

The reference compacts valid parts with dynamic shapes everywhere
(``part_pcs[part_valids.bool()]`` — fracture_ae.py:16-29, denoiser.py:66-77). Dynamic shapes
don't jit, and feeding zero-padded parts through the encoder would pollute BatchNorm statistics.
Instead we *permute* valid parts to the front and fill the tail slots with cyclic repeats of the
valid parts, so every slot carries real data:

  * ``compact_parts``  — [B, P, ...] -> [B, P, ...] with valid parts first, repeats after.
  * ``scatter_parts``  — inverse: place per-slot encoder outputs back at their part indices,
    zeroing invalid parts (the reference's ``latent[part_valids.bool()] = ...`` scatter).

``slot_valid`` marks the first n_valid slots — use it to mask losses so repeats don't double
count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compaction_indices(valids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """valids: [B, P] {0,1} -> (order [B, P], src [B, P], slot_valid [B, P]).

    ``order`` is a permutation putting valid parts first (stable);
    ``src[b, s] = order[b, s % n_valid]`` is the part index each slot reads from;
    ``slot_valid[b, s] = s < n_valid``.
    """
    P = valids.shape[-1]
    v = valids.astype(jnp.int32)
    order = jnp.argsort(1 - v, axis=-1, stable=True).astype(jnp.int32)  # valid first
    n = jnp.maximum(v.sum(axis=-1, keepdims=True), 1)  # [B, 1]
    slots = jnp.arange(P, dtype=jnp.int32)[None, :]
    src = jnp.take_along_axis(order, slots % n, axis=-1)
    slot_valid = slots < n
    slot_valid = slot_valid & (v.sum(axis=-1, keepdims=True) > 0)
    return order, src, slot_valid


def compact_parts(x: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    """Gather parts by slot source index. x: [B, P, ...], src: [B, P] -> [B, P, ...]."""
    idx = src.reshape(src.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def scatter_parts(
    x: jnp.ndarray, order: jnp.ndarray, slot_valid: jnp.ndarray
) -> jnp.ndarray:
    """Place slot s's value at part index order[b, s]; invalid slots write zeros.

    x: [B, P, ...] slot-major -> [B, P, ...] part-major.
    """
    masked = jnp.where(slot_valid.reshape(slot_valid.shape + (1,) * (x.ndim - 2)), x, 0)
    out = jnp.zeros_like(x)
    # order is a permutation, so at[].set over axis 1 has no collisions; the tail slots
    # (slot_valid False) write zeros at the invalid part indices — exactly the reference's
    # zero-init + boolean scatter.
    return jax.vmap(lambda o, v, out_b: out_b.at[o].set(v))(order, masked, out)
