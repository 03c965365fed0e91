"""Learner: optimizer, EMA, and the jitted/pjit-able train step.

Reference: python/train.py's per-GPU DDP loop (train.py:1422-1637) with SGD
momentum, gradient clipping, and SWA/EMA (train.py:36,814-818). Here the
train step is one pure function; data parallelism is a jax.sharding Mesh
over the batch axis with XLA inserting the gradient all-reduce — the
NCCL/DDP machinery (train.py:252-319) has no equivalent code at all.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from katago_tpu.train.losses import LossScales, SekiEma, compute_losses


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any            # per-step EMA of weights for export
    swa_params: Any            # SWA average, sampled every swa period
    step: jax.Array
    seki_ema: SekiEma          # seki loss moving unowned-proportion state


def make_optimizer(lr=6e-5, momentum: float = 0.9,
                   weight_decay: float = 3e-5, grad_clip: float = 1e6,
                   kind: str = "sgd"):
    """Optimizer factory. lr may be a float or an optax schedule callable
    (see train.schedules for the reference's LR scale tables).

    kind="sgd": SGD+momentum with decoupled weight decay, the reference's
    default family (train.py lr scaling at train.py:504-526).
    kind="muon"/"normuon"/"polar": the reference's Muon family
    (python/muon/muon.py) — matrix params via orthogonalized momentum,
    AdamW for the rest.
    """
    if kind == "sgd":
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.add_decayed_weights(weight_decay),
            optax.sgd(learning_rate=lr, momentum=momentum),
        )
    from katago_tpu.train.muon import muon
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        muon(lr, weight_decay=weight_decay,
             normuon=(kind == "normuon"),
             use_polar_express=(kind in ("polar", "normuon"))),
    )


def init_train_state(params: Any, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        ema_params=params,
        swa_params=params,
        step=jnp.int32(0),
        seki_ema=SekiEma.init(),
    )


def make_train_step(model_apply, optimizer, ema_decay: float = 0.999,
                    scales: LossScales = LossScales()):
    """Returns train_step(state, batch) -> (state, metrics). Pure; jit or
    pjit with batch sharded over the mesh's data axis.

    batch: the reference-schema dict of dataio.trainingwrite.read_npz
    (binaryInputNCHW float NCHW etc.); model inputs are derived here."""

    def loss_fn(params, batch, seki_ema):
        spatial = batch["binaryInputNCHW"].transpose(0, 2, 3, 1)  # NHWC
        raw = model_apply(params, spatial, batch["globalInputNC"])
        loss, metrics, ema = compute_losses(
            raw, batch, scales=scales, seki_ema=seki_ema, is_training=True)
        return loss, (metrics, ema)

    def train_step(state: TrainState, batch: dict):
        (_, (metrics, seki_ema)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, state.seki_ema)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
            state.ema_params, params)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, gnorm=gnorm)
        return TrainState(params, opt_state, ema, state.swa_params,
                          state.step + 1, seki_ema), metrics

    return train_step


def make_eval_step(model_apply, scales: LossScales = LossScales()):
    """Validation step: eval_step(params, batch, seki_ema) -> metrics
    (no gradient, is_training=False — the reference's val pass,
    train.py:1578-1621)."""

    def eval_step(params, batch, seki_ema):
        spatial = batch["binaryInputNCHW"].transpose(0, 2, 3, 1)
        raw = model_apply(params, spatial, batch["globalInputNC"])
        _, metrics, _ = compute_losses(
            raw, batch, scales=scales, seki_ema=seki_ema, is_training=False)
        return metrics

    return eval_step
