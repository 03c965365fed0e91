"""Mesh/sharding utilities — the TPU-native replacement for DDP/NCCL.

Reference parallelism inventory (SURVEY.md section 2.11): training is
1-process-per-GPU PyTorch DDP over NCCL (train.py:252-319); selfplay scale
is game-level thread parallelism. Here both collapse to one axis: the
batch-of-games/batch-of-rows dimension sharded over a jax.sharding.Mesh.
XLA inserts the gradient all-reduce (psum over ICI) where DDP used NCCL;
there is no wrapper class, barrier, or process group to manage.

The model family is small enough (<100M params) that weights replicate;
scaling is pure data parallelism plus (later) multi-slice DCN data
parallelism — matching how the reference scales (SURVEY.md 2.11 table).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/games) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of [B, ...] arrays with B sharded over the mesh."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def setup_accelerator_dispatch():
    """Route trace-time eager constants to the CPU and return the
    accelerator device for explicit input placement.

    Over a tunneled accelerator runtime (the axon platform, ~100ms per
    dispatch), leaving the accelerator as the default device makes JAX
    execute every trace-time constant expression (jnp.asarray of lookup
    tables, jnp.arange, jnp.zeros, ...) as its own remote tiny program —
    lowering a featurizer-sized graph takes minutes instead of seconds.
    Setting the default device to CPU keeps those on the host; jitted
    functions still run on the accelerator because their inputs are
    explicitly device_put there (jit follows committed argument devices).

    Returns the accelerator device (or the CPU if none is present).
    """
    cpus = jax.devices("cpu")
    accels = [d for d in jax.devices() if d.platform != "cpu"]
    if accels:
        jax.config.update("jax_default_device", cpus[0])
        return accels[0]
    return cpus[0]
