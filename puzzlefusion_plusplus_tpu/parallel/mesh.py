"""Device mesh / sharding helpers — the TPU-native replacement for the reference's DDP backend.

The reference parallelizes purely by data parallelism via PyTorch DDP over NCCL
(scripts/train_denoiser.sh:6-7, SURVEY.md §2.4/§5.8). The JAX equivalent is declarative:

  * one ``jax.sharding.Mesh`` over the local devices with a ``data`` axis,
  * batches placed with ``NamedSharding(mesh, P('data'))`` on the leading dim,
  * parameters/optimizer state replicated with ``NamedSharding(mesh, P())``,
  * gradient all-reduce emitted automatically by XLA when the jitted loss consumes sharded
    batches and replicated params (no DDP wrapper concept; psum rides the ICI).

``sync_dist``-style metric reduction (reference denoiser.py:218-221) likewise falls out of jit:
a jitted mean over a batch-sharded array IS the cross-device reduction.

Multi-host (multi-slice DCN) extension: call ``jax.distributed.initialize()`` before
``data_parallel_mesh()`` — ``jax.devices()`` then spans all hosts and the same code shards
globally; per-host batch slicing is handled in the loader via ``jax.process_index()``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(num_devices: int = -1) -> Mesh:
    """A 1-D ``data`` mesh over the first ``num_devices`` local devices (-1 = all)."""
    devices = jax.devices()
    if num_devices != -1:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a (nested) batch dict on the mesh, batch-dim sharded.

    Batch leading dims must be divisible by the mesh size — loaders produce global batches of
    ``per_device_batch * num_devices`` (the DDP-equivalent contract).
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate params / optimizer state across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(batch: dict, n_devices: int) -> tuple[dict, int]:
    """Pad a possibly-ragged final batch up to a multiple of ``n_devices``.

    Returns (padded batch, real count). Padding repeats row 0; callers mask metrics by count.
    """
    sizes = {x.shape[0] for x in jax.tree.leaves(batch)}
    assert len(sizes) == 1, f"inconsistent batch dims {sizes}"
    n = sizes.pop()
    pad = (-n) % n_devices
    if pad == 0:
        return batch, n
    padded = jax.tree.map(
        lambda x: np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0), batch
    )
    return padded, n
