"""Graph-search transposition hashing — cpp/game/graphhash.{h,cpp}.

The MCGS node key must distinguish positions whose *legal continuations*
differ through superko history while still merging genuinely equivalent
transpositions. The reference's scheme (graphhash.cpp:24-39): after a
move, if the local region around the move (its chain plus adjacent
empty regions) is larger than `repBound`, no repetition cycle of length
<= repBound can pass through this position, so the hash RESETS to the
pure state hash (path-independent; transpositions merge across
different move orders and depths). Otherwise — ko-like cramped shapes —
the hash chains path-dependently from the parent's hash, preventing
unsound merges inside potential cycles.

Hash128 becomes our uint32[2]-lane hashes; the splitMix64/nasam mixing
is replaced with murmur3-style 32-bit finalizers per lane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B

# fixed keys (arbitrary constants; reference Board::ZOBRIST_GAME_IS_OVER)
GAME_IS_OVER_KEY = np.array([0x9E3779B9, 0x7F4A7C15], np.uint32)
# LCG multipliers for consecutive ending passes (graphhash.cpp:17-20)
CONSEC_PASS_MULT = np.array([0xDEADBEE7, 0x85EBCA6B], np.uint32)


def _mix32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 per uint32 lane."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def state_hash(ko_hash: jax.Array, game_over: jax.Array,
               consec_passes: jax.Array) -> jax.Array:
    """GraphHash::getStateHash (graphhash.cpp:4-22): the position's
    situation/rules/ko hash folded with game-over and the consecutive
    ending-pass count. (passWouldEndPhase is implied by consec_passes
    for the phase-ending cases our search reaches.)"""
    h = ko_hash ^ jnp.where(game_over, jnp.asarray(GAME_IS_OVER_KEY),
                            jnp.zeros((2,), jnp.uint32))
    return h + jnp.asarray(CONSEC_PASS_MULT) * consec_passes.astype(jnp.uint32)


def graph_hash_step(prev_graph: jax.Array, state_h: jax.Array,
                    reset: jax.Array) -> jax.Array:
    """GraphHash::getGraphHash (graphhash.cpp:24-39): reset to the state
    hash when the local region bounds out repetition, else mix the
    parent's graph hash and add the state hash."""
    mixed = _mix32(prev_graph ^ prev_graph[::-1]) + state_h
    return jnp.where(reset, state_h, mixed)


MAX_REP_BOUND = 15  # static growth budget below; covers repBound <= 15
                    # (reference default 11, searchparams.cpp:42)


def simple_repetition_bound_gt(stones: jax.Array, size: int,
                               loc: jax.Array, bound) -> jax.Array:
    """Board::simpleRepetitionBoundGt (board.cpp:2853-2888), vectorized:
    size of the moved-to chain plus all adjacent empty regions > bound.
    loc is the flat location of the last move; pass/off-board -> False.

    Implementation: grow a mask from the move's chain through
    (same-chain stones ∪ empties) with MAX_REP_BOUND+1 unrolled
    4-neighbor dilations. Connected growth adds at least one cell per
    round until saturation, so the bounded count exceeds `bound` iff
    the true region does (for bound <= MAX_REP_BOUND) — an exact
    decision with fixed-shape shifts instead of a label-propagation
    while-loop (this runs once per playout inside the search scan).
    """
    nn = size * size
    on_board = (loc >= 0) & (loc < nn)
    lc = jnp.clip(loc, 0, nn - 1)
    point = jnp.arange(nn) == lc

    is_stone = on_board & (stones[lc] != B.EMPTY)
    empty = stones == B.EMPTY
    same_chain_medium = (stones == stones[lc]) & ~empty

    def grow(mask, medium, rounds):
        for _ in range(rounds):
            grown = jnp.any(B.shift4(mask.astype(jnp.int32), size, 0) > 0,
                            axis=0)
            mask = mask | (grown & medium)
        return mask

    # phase 1: the chain at loc (stone case only)
    chain = grow(point & is_stone, same_chain_medium, MAX_REP_BOUND + 1)
    # phase 2: empty regions adjacent to the chain (or containing loc)
    empty_seed = jnp.where(
        is_stone,
        empty & jnp.any(B.shift4(chain.astype(jnp.int32), size, 0) > 0,
                        axis=0),
        point & empty & on_board)
    region = grow(empty_seed, empty, MAX_REP_BOUND + 1)
    total = jnp.sum(chain.astype(jnp.int32)) \
        + jnp.sum(region.astype(jnp.int32))
    bound_c = jnp.minimum(jnp.asarray(bound, jnp.int32), MAX_REP_BOUND)
    return on_board & (total > bound_c)
