"""train command — the learner loop (reference python/train.py).

Reads shuffled npz shards, runs the train step data-parallel over the
device mesh (batch axis sharded, params replicated; XLA inserts the
gradient psum where the reference used DDP/NCCL, train.py:252-319),
checkpoints with optimizer+EMA state, and periodically exports EMA params
for selfplay — the reference's tfsavedmodels_toexport flow
(train.py:1422-1637, 579-607). `-multi-host` calls
jax.distributed.initialize so the same mesh spans pod slices.

Usage: python -m katago_tpu.cli.train_cmd -data-dir D -ckpt-dir C
         -export-dir E [-size 9] [-config b2c16] [-batch-size 64]
         [-steps 100] [-lr 6e-5]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.dataio import trainingwrite as TW
from katago_tpu.train import checkpoint as C
from katago_tpu.train.train_step import (init_train_state, make_optimizer,
                                         make_train_step)


def run_training(data_dir: str, ckpt_dir: str, export_dir: str | None, *,
                 size: int, config_name: str, batch_size: int, steps: int,
                 lr: float, export_every: int = 0, seed: int = 0,
                 optimizer_kind: str = "sgd", log=print) -> dict:
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.parallel import mesh as M
    cfg = MC.get_config(config_name)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    optimizer = make_optimizer(lr=lr, kind=optimizer_kind)
    state = init_train_state(params, optimizer)

    latest = C.latest_checkpoint(ckpt_dir)
    start_step = 0
    if latest:
        state = C.restore_checkpoint(latest, state)
        start_step = int(np.asarray(state.step))
        log(f"resumed from {latest} at step {start_step}")

    # data-parallel mesh over every visible device (one device -> trivial
    # mesh; multi-host after initialize_multihost -> global mesh). Params
    # replicate, the batch axis shards, XLA inserts the gradient psum.
    n_dev = len(jax.devices())
    if batch_size % n_dev != 0:
        raise ValueError(f"batch-size {batch_size} not divisible by "
                         f"{n_dev} devices")
    mesh = M.make_mesh()

    files = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not files:
        raise FileNotFoundError(f"no npz shards in {data_dir}")
    rows = [TW.read_npz(f, size) for f in files]
    data = {k: np.concatenate([r[k] for r in rows]) for k in rows[0]}
    n = data["binaryInputNCHW"].shape[0]
    log(f"training on {n} rows from {len(files)} shards")
    state = M.replicate(state, mesh)
    if n_dev > 1:
        log(f"data-parallel over {n_dev} devices "
            f"({batch_size // n_dev} rows/device)")

    train_step = jax.jit(make_train_step(model.apply, optimizer),
                         in_shardings=(M.replicated(mesh),
                                       M.data_sharding(mesh)))
    rng = np.random.default_rng(seed)
    metrics_hist = []
    # anomaly detection + JSON-lines metrics (trainloop_helpers.py:300,
    # metrics_logging.py)
    from katago_tpu.train.watchers import GnormWatcher, MetricsLogger
    watcher = GnormWatcher(log=log)
    mlog = MetricsLogger(os.path.join(ckpt_dir, "metrics.json"))
    t0 = time.time()
    from katago_tpu.dataio import native as NV
    for i in range(steps):
        idx = rng.integers(0, n, size=batch_size)
        hb = {k: v[idx] for k, v in data.items()}
        # random dihedral symmetry per batch (data_processing_pytorch.py's
        # apply_symmetry; native C++ transform when built)
        sym = int(rng.integers(0, 8))
        if sym:
            hb["binaryInputNCHW"] = NV.apply_symmetry_planes(
                np.ascontiguousarray(hb["binaryInputNCHW"]), sym)
            hb["valueTargetsNCHW"] = NV.apply_symmetry_planes(
                np.ascontiguousarray(hb["valueTargetsNCHW"]), sym)
            for k in ("policyTargetsNCMove", "qValueTargetsNCMove"):
                arr = np.ascontiguousarray(hb[k])
                b, c, a = arr.shape
                hb[k] = NV.apply_symmetry_policy(
                    arr.reshape(b * c, a), size, sym).reshape(b, c, a)
        batch = M.shard_batch({k: jnp.asarray(v) for k, v in hb.items()},
                              mesh)
        state, metrics = train_step(state, batch)
        gn = float(metrics["gnorm"])
        watcher.observe(gn)
        mlog.accumulate({k: float(v) for k, v in metrics.items()},
                        batch_size=batch_size)
        mlog.clear_nonfinite(log=log)
        if i % max(1, steps // 10) == 0 or i == steps - 1:
            m = mlog.log_line({"step": start_step + i})
            metrics_hist.append({k: float(v) for k, v in metrics.items()})
            log(f"  step {start_step + i}: loss={m['loss']:.4f} "
                f"policy={m['policy_loss']:.4f} value={m['value_loss']:.4f} "
                f"gnorm={gn:.3f}")
        if export_every and export_dir and (i + 1) % export_every == 0:
            C.export_params(export_dir,
                            f"{config_name}-s{start_step + i + 1}",
                            state.ema_params)

    final_step = start_step + steps
    path = C.save_checkpoint(ckpt_dir, state, final_step,
                             metadata={"global_step": final_step,
                                       "config": config_name, "size": size})
    if export_dir:
        C.export_params(export_dir, f"{config_name}-s{final_step}",
                        state.ema_params)
    dt = time.time() - t0
    return {"steps": steps, "final_loss": metrics_hist[-1]["loss"],
            "first_loss": metrics_hist[0]["loss"],
            "rows_per_s": steps * batch_size / dt, "checkpoint": path}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-data-dir", required=True)
    ap.add_argument("-ckpt-dir", required=True)
    ap.add_argument("-export-dir", default=None)
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-batch-size", type=int, default=64)
    ap.add_argument("-steps", type=int, default=100)
    ap.add_argument("-lr", type=float, default=6e-5)
    ap.add_argument("-optimizer", default="sgd",
                    choices=["sgd", "muon", "normuon", "polar"])
    ap.add_argument("-multi-host", action="store_true",
                    help="jax.distributed.initialize (auto-detected "
                         "coordinator on TPU pods)")
    args = ap.parse_args(argv)
    if args.multi_host:
        from katago_tpu.parallel.mesh import initialize_multihost
        initialize_multihost()
    out = run_training(args.data_dir, args.ckpt_dir, args.export_dir,
                       size=args.size, config_name=args.config,
                       batch_size=args.batch_size, steps=args.steps,
                       lr=args.lr, optimizer_kind=args.optimizer)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
