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
    ema_params: Any            # SWA/EMA of weights for export
    step: jax.Array
    seki_ema: SekiEma          # seki loss moving unowned-proportion state


def lr_scale_auto(samples: int) -> float:
    """The reference's hardcoded LR auto-scale by samples seen
    (train.py:504-522)."""
    for bound, scale in [(550e6, 8.0), (1400e6, 6.0), (2500e6, 4.0),
                         (3400e6, 3.0), (4200e6, 2.0), (4900e6, 1.5),
                         (5500e6, 1.0), (6400e6, 0.7)]:
        if samples < bound:
            return scale
    return 0.5


def make_optimizer(lr: float = 6e-5, momentum: float = 0.9,
                   weight_decay: float = 3e-5, grad_clip: float = 1e6,
                   kind: str = "sgd"):
    """Optimizer factory.

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
        return TrainState(params, opt_state, ema, state.step + 1,
                          seki_ema), metrics

    return train_step
