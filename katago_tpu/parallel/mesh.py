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

import os
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


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host entry point: jax.distributed.initialize.

    The reference's multi-machine story is (a) NCCL DDP within one host
    (train.py:252-267) and (b) shared-filesystem selfplay across machines
    (SelfplayTraining.md). The TPU-native equivalent for (a) across hosts
    is jax.distributed: after initialize(), jax.devices() spans every
    process's chips, and the same Mesh/psum code scales over ICI+DCN with
    zero further changes. With no arguments, TPU pod environments
    auto-detect coordinator/process topology.

    Safe to call when already initialized (no-op).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(start_row, rows) of this process's slice of a global batch — the
    analogue of the reference's per-rank data slicing
    (data_processing_pytorch.py:28 rank slicing)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return i * per, per


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

    Also enables the persistent XLA compilation cache for accelerator
    runs (KATAGO_TPU_COMPILE_CACHE overrides the location; empty string
    disables). A warm cache turns the headline bench's ~150s first
    compile into a disk load. The cache stays OFF on CPU-only runs: the
    CPU AOT loader records stricter machine features than the host
    reports and SIGILLs on reload (tests/conftest.py note).
    """
    cpus = jax.devices("cpu")
    accels = [d for d in jax.devices() if d.platform != "cpu"]
    if accels:
        jax.config.update("jax_default_device", cpus[0])
        cache_dir = os.environ.get("KATAGO_TPU_COMPILE_CACHE",
                                   "/tmp/katago_tpu_xla_cache")
        if cache_dir:
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs",
                                  2.0)
            except Exception:  # noqa: BLE001 — older jax without the knob
                pass
        return accels[0]
    return cpus[0]
