"""Checkpoint save/restore — the reference's torch-checkpoint equivalent.

Reference behavior (python/train.py:579-607): checkpoints hold model
params, SWA/EMA params, optimizer state, and train_state (global step /
samples); plus longterm snapshots and export-for-selfplay copies. Here the
TrainState pytree is saved with orbax; exports for selfplay/gatekeeper are
plain param-only checkpoints in an export dir that the selfplay loop polls
(mirroring the models-dir polling of cpp/command/selfplay.cpp:140-151).
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

from katago_tpu.train.train_step import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    keep: int = 3, metadata: dict | None = None):
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:012d}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    if metadata is not None:
        with open(os.path.join(path, "train_metadata.json"), "w") as f:
            json.dump(metadata, f)
    # prune old checkpoints
    entries = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    for old in entries[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return path


def maybe_save_longterm(ckpt_dir: str, state: TrainState, step: int,
                        every_s: float = 12 * 3600.0,
                        metadata: dict | None = None) -> str | None:
    """Periodic never-pruned snapshots (train.py:1358-1885 longterm
    checkpoints, saved every 12h by default): writes into
    ckpt_dir/longterm_checkpoints/ when the newest snapshot there is
    older than every_s. Returns the path when one was written."""
    import time
    lt_dir = os.path.join(ckpt_dir, "longterm_checkpoints")
    os.makedirs(lt_dir, exist_ok=True)
    entries = [os.path.join(lt_dir, d) for d in os.listdir(lt_dir)
               if d.startswith("step_")]
    if entries:
        newest = max(os.path.getmtime(e) for e in entries)
        if time.time() - newest < every_s:
            return None
    path = os.path.abspath(os.path.join(lt_dir, f"step_{step:012d}"))
    if os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    if metadata is not None:
        with open(os.path.join(path, "train_metadata.json"), "w") as f:
            json.dump(metadata, f)
    return path


def load_metadata(path: str) -> dict:
    """Read the sidecar train_metadata.json of a checkpoint (global step,
    samples, SWA accumulator, data-serving state); {} if absent."""
    meta_path = os.path.join(path, "train_metadata.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, entries[-1]) if entries else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree.map(lambda t, r: np.asarray(r), template, restored)


def export_params(export_dir: str, name: str, params) -> str:
    """Write a param-only model export for selfplay/gatekeeper polling.

    Like the reference's export_model_for_selfplay.sh output: a named
    directory whose appearance (atomic rename) signals a new model.
    """
    os.makedirs(export_dir, exist_ok=True)
    tmp = os.path.join(export_dir, f".tmp_{name}")
    final = os.path.join(export_dir, name)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(tmp), jax.device_get(params), force=True)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def export_bin_gz(export_dir: str, name: str, params, cfg) -> str | None:
    """Additionally publish the reference .bin.gz engine format
    (export_model_pytorch.py equivalent; models/export.py). Returns None
    for architectures the conv format can't express (transformers)."""
    from katago_tpu.models.export import export_model
    os.makedirs(export_dir, exist_ok=True)
    path = os.path.join(export_dir, f"{name}.bin.gz")
    try:
        return export_model(jax.device_get(params), cfg, path, name=name)
    except ValueError:
        return None


def find_latest_model(models_dir: str) -> str | None:
    """Newest model export by mtime (reference LoadModel::findLatestModel)."""
    if not os.path.isdir(models_dir):
        return None
    entries = [os.path.join(models_dir, d) for d in os.listdir(models_dir)
               if not d.startswith(".")]
    entries = [e for e in entries if os.path.isdir(e)]
    if not entries:
        return None
    return max(entries, key=os.path.getmtime)


def load_params(path: str, template):
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree.map(lambda t, r: np.asarray(r), template, restored)
