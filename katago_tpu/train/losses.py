"""Training losses — the minimum-slice subset of metrics_pytorch.py.

The reference computes ~20 loss terms (python/katago/train/metrics_pytorch.py:
78-324). This module currently implements the core terms that drive the
end-to-end slice — policy CE, value CE, score-mean huber, ownership CE —
with the reference's weighting style (per-board-area scaling for spatial
targets). The full term-for-term set (TD values, score distributions, seki,
futurepos, shortterm error heads, optimistic policy) is the loss-parity
milestone tracked in SURVEY.md section 7 hard-part 7.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    policy: float = 1.0
    value: float = 1.5
    ownership: float = 1.5
    score_mean: float = 0.0004


def huber(x, delta):
    absx = jnp.abs(x)
    return jnp.where(absx < delta, 0.5 * x * x, delta * (absx - 0.5 * delta))


def compute_losses(raw: dict, batch: dict,
                   w: LossWeights = LossWeights()) -> tuple[jax.Array, dict]:
    """raw: model outputs; batch dict with policy_target [B,A],
    value_target [B,3], score_target [B], ownership_target [B,NN].
    Returns (total_loss, metrics dict)."""
    pol_logits = raw["policy_logits"][:, 0, :]               # [B, A]
    logp = jax.nn.log_softmax(pol_logits, axis=-1)
    policy_loss = -jnp.sum(batch["policy_target"] * logp, axis=-1)

    vlogp = jax.nn.log_softmax(raw["value_logits"], axis=-1)
    value_loss = -jnp.sum(batch["value_target"] * vlogp, axis=-1)

    score_pred = raw["miscvalue"][:, 0] * 20.0
    score_loss = huber(score_pred - batch["score_target"], 10.0)

    b, h, wd = raw["ownership_pretanh"].shape
    own_logits = raw["ownership_pretanh"].reshape(b, h * wd)
    own_t = batch["ownership_target"]                         # [-1, 1]
    p_own = 0.5 * (own_t + 1.0)
    own_ll = p_own * jax.nn.log_sigmoid(2.0 * own_logits) + \
        (1.0 - p_own) * jax.nn.log_sigmoid(-2.0 * own_logits)
    ownership_loss = -jnp.mean(own_ll, axis=-1)

    total = (w.policy * policy_loss + w.value * value_loss +
             w.score_mean * score_loss + w.ownership * ownership_loss)
    metrics = {
        "loss": jnp.mean(total),
        "policy_loss": jnp.mean(policy_loss),
        "value_loss": jnp.mean(value_loss),
        "score_loss": jnp.mean(score_loss),
        "ownership_loss": jnp.mean(ownership_loss),
        "policy_acc1": jnp.mean(
            (jnp.argmax(pol_logits, -1) ==
             jnp.argmax(batch["policy_target"], -1)).astype(jnp.float32)),
    }
    return jnp.mean(total), metrics
