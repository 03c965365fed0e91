"""GenBoard — position-generation net (python/genboard_common.py).

A small fixup resnet that, given a partially-known board, predicts the
content {empty, black, white} of one "inference point"; sampling points
one at a time completes plausible whole positions (genboard_run.py).
Used to fabricate diverse opening/midgame positions for selfplay
seeding.

Input channels (genboard_common.py:62-70):
  0 inference point   1 on-board   2 black   3 white   4 unknown
  5 turn/100   6 turn-noise-stdev/50   7 source

Heads (genboard_common.py:90-115): a 3-class point head (focus-masked
trunk sum concat global-mean, 2-layer MLP) and a 3-class per-point aux
conv head.

TPU shape: the autoregressive fill is a `lax.scan` over a fixed
permutation of all points (skipping known ones by masking), batched
over positions — sequential NN calls like the reference, but each step
is one [B]-batched forward on the device.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

EMPTY_CH, BLACK_CH, WHITE_CH = 0, 1, 2  # output class order
NUM_INPUT_CHANNELS = 8


class _ResBlock(nn.Module):
    ch: int
    scale_init: float

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        biasa = self.param("biasa", nn.initializers.zeros, (ch,))
        h = nn.relu(x + biasa)
        h = nn.Conv(ch, (3, 3), use_bias=False,
                    kernel_init=nn.initializers.normal(
                        math.sqrt(2.0 / ch / 9) * self.scale_init))(h)
        scalb = self.param("scalb", nn.initializers.ones, (ch,))
        biasb = self.param("biasb", nn.initializers.zeros, (ch,))
        h = nn.relu(h * scalb + biasb)
        h = nn.Conv(ch, (3, 3), use_bias=False,
                    kernel_init=nn.initializers.zeros)(h)
        return x + h


class _GPoolResBlock(nn.Module):
    ch: int
    scale_init: float

    @nn.compact
    def __call__(self, x):
        ch = self.ch
        biasa = self.param("biasa", nn.initializers.zeros, (ch,))
        h = nn.relu(x + biasa)
        std = math.sqrt(1.0 / ch / 9)
        a = nn.Conv(ch, (3, 3), use_bias=False,
                    kernel_init=nn.initializers.normal(
                        std * self.scale_init))(h)
        g = nn.Conv(ch, (3, 3), use_bias=False,
                    kernel_init=nn.initializers.normal(
                        std * math.sqrt(self.scale_init)))(h)
        g = jnp.mean(g, axis=(1, 2))
        matg = self.param("matg", nn.initializers.normal(
            math.sqrt(1.0 / ch) * math.sqrt(self.scale_init)), (ch, ch))
        a = a + (g @ matg)[:, None, None, :]
        scalb = self.param("scalb", nn.initializers.ones, (ch,))
        biasb = self.param("biasb", nn.initializers.zeros, (ch,))
        a = nn.relu(a * scalb + biasb)
        a = nn.Conv(ch, (3, 3), use_bias=False,
                    kernel_init=nn.initializers.zeros)(a)
        return x + a


class GenBoardModel(nn.Module):
    """inputs [B,H,W,8] -> (point_logits [B,3], aux_logits [B,H,W,3])."""
    num_channels: int = 96
    num_blocks: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        ch = self.num_channels
        x = nn.Conv(ch, (3, 3), use_bias=False,
                    kernel_init=nn.initializers.normal(
                        math.sqrt(2.0 / NUM_INPUT_CHANNELS / 9)))(
            inputs.astype(self.dtype))
        scale = 1.0 / math.sqrt(self.num_blocks)
        kinds = [_ResBlock, _ResBlock]
        gpool_next = True
        for _ in range(self.num_blocks - 2):
            kinds.append(_GPoolResBlock if gpool_next else _ResBlock)
            gpool_next = not gpool_next
        for kind in kinds:
            x = kind(ch, scale)(x)

        bias_focus = self.param("endtrunk_bias_focus",
                                nn.initializers.zeros, (ch,))
        bias_g = self.param("endtrunk_bias_g",
                            nn.initializers.zeros, (ch,))
        head_focus = nn.relu(x + bias_focus)
        head_g = nn.relu(x + bias_g)
        aux = nn.Conv(3, (1, 1), use_bias=True)(head_focus)
        focus = jnp.sum(head_focus * inputs[..., 0:1].astype(self.dtype),
                        axis=(1, 2))
        g = jnp.mean(head_g, axis=(1, 2))
        h = jnp.concatenate([focus, g], axis=-1)
        h = nn.relu(nn.Dense(ch)(h))
        point = nn.Dense(3)(h)
        return point.astype(jnp.float32), aux.astype(jnp.float32)


def build_inputs(stones, known, infer_point, turn, turn_stdev, source,
                 size: int):
    """Assemble the 8-channel input.

    stones: int[B,NN] 0/1/2; known: bool[B,NN] (False = unknown);
    infer_point: int[B] flat loc; turn/turn_stdev/source: f32[B]."""
    b = stones.shape[0]
    nn_ = size * size
    ch = jnp.zeros((b, nn_, NUM_INPUT_CHANNELS), jnp.float32)
    ch = ch.at[jnp.arange(b), infer_point, 0].set(1.0)
    ch = ch.at[:, :, 1].set(1.0)
    ch = ch.at[:, :, 2].set((known & (stones == 1)).astype(jnp.float32))
    ch = ch.at[:, :, 3].set((known & (stones == 2)).astype(jnp.float32))
    ch = ch.at[:, :, 4].set((~known).astype(jnp.float32))
    ch = ch.at[:, :, 5].set((turn / 100.0)[:, None])
    ch = ch.at[:, :, 6].set((turn_stdev / 50.0)[:, None])
    ch = ch.at[:, :, 7].set(source[:, None])
    return ch.reshape(b, size, size, NUM_INPUT_CHANNELS)


def genboard_loss(point_logits, aux_logits, point_label, aux_label,
                  inputs):
    """Reference loss (genboard_train.py:382-387): point CE + 0.3 * aux
    CE over unknown points normalized by on-board area."""
    main = -jnp.sum(
        jax.nn.one_hot(point_label, 3) * jax.nn.log_softmax(point_logits),
        axis=-1)
    b, h, w, _ = aux_logits.shape
    aux_label = aux_label.reshape(b, h, w)
    unknown = inputs[..., 4:5]
    onboard = jnp.sum(inputs[..., 1:2], axis=(1, 2), keepdims=True)
    aux = -jnp.sum(
        jax.nn.one_hot(aux_label, 3) * jax.nn.log_softmax(aux_logits)
        * unknown / jnp.maximum(onboard, 1.0), axis=(1, 2, 3)) * 0.3
    return jnp.mean(main), jnp.mean(aux)


def sample_fill(apply_fn, params, stones, known, *, size: int, rng,
                turn: float, turn_stdev: float, source: float,
                temperature: float = 1.0):
    """Autoregressively fill every unknown point (genboard_run.py).

    stones int[B,NN], known bool[B,NN]. Returns completed int[B,NN].
    One lax.scan over a random permutation of the NN points; steps whose
    point is already known are no-op (masked), so the whole fill is a
    single compiled program regardless of how many points are unknown.
    """
    b, nn_ = stones.shape
    rng, perm_key = jax.random.split(rng)
    order = jax.random.permutation(perm_key, nn_)
    turn_a = jnp.full((b,), turn, jnp.float32)
    std_a = jnp.full((b,), turn_stdev, jnp.float32)
    src_a = jnp.full((b,), source, jnp.float32)

    def step(carry, inp):
        stones_c, known_c, key = carry
        point = inp
        key, sub = jax.random.split(key)
        pts = jnp.full((b,), point, jnp.int32)
        x = build_inputs(stones_c, known_c, pts, turn_a, std_a, src_a,
                         size)
        logits, _ = apply_fn(params, x)
        choice = jax.random.categorical(sub, logits / temperature, axis=-1)
        was_unknown = ~known_c[:, point]
        new_val = jnp.where(was_unknown, choice.astype(stones_c.dtype),
                            stones_c[:, point])
        stones_c = stones_c.at[:, point].set(new_val)
        known_c = known_c.at[:, point].set(True)
        return (stones_c, known_c, key), None

    (stones, known, _), _ = jax.lax.scan(step, (stones, known, rng), order)
    return stones
