"""Vectorized Benson pass-alive analysis — replaces Board::calculateArea.

Reference semantics (/root/reference/cpp/game/board.cpp calculateAreaForPla,
board.h:285-366): for each player, regions are connected components of
empty-or-opponent points; a region is *vital* to an adjacent player chain if
every counting point of the region (all points when multi-stone suicide is
legal, else only the empty points) is adjacent to that chain. Benson
iteration kills chains with <2 vital regions and invalidates regions
adjacent to killed chains until a fixpoint; surviving chains are pass-alive.
Regions are then marked as the player's area if they are "small" (≤1
internal point not adjacent to the player) and border only pass-alive
chains, or (safeBigTerritories) contain no opponent stones and border only
pass-alive chains; unsafeBigTerritories marks remaining empty points of
opp-free regions.

Vectorized realization: region/chain component labels from the board
engine's label propagation, then DENSE region-x-chain adjacency matrices
built as one-hot matmuls (MXU work): cnt[r, c] = how many counting points
of region r touch chain c, any[r, c] = region-to-chain adjacency. The
Benson fixpoint is a while_loop of two batched matvecs (vital counts per
chain, killed-neighbor flags per region). The earlier sort-based unique-
pair formulation cost ~58ms/call at [128, 361] on v5e (TPU sorts and
vector-index scatters serialize); the dense form is MXU-native.
No data-dependent shapes; vmap-able over the game batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.ops import lookup as L


def _adjacent_chain_labels(labels: jax.Array, stones: jax.Array,
                           pla: jax.Array, size: int) -> jax.Array:
    """For every point: labels of adjacent pla chains, deduped. [NN,4], pad=NN."""
    nn = size * size
    nbr_s = B.shift4(stones, size, B.WALL)
    nbr_l = B.shift4(labels, size, jnp.int32(nn))
    cand = [jnp.where(nbr_s[d] == pla, nbr_l[d], nn) for d in range(4)]
    for k in range(1, 4):
        dup = jnp.zeros_like(cand[k], dtype=bool)
        for j in range(k):
            dup = dup | (cand[k] == cand[j])
        cand[k] = jnp.where(dup, nn, cand[k])
    return jnp.stack(cand, axis=1)


def pass_alive_area_for(stones: jax.Array, pla: jax.Array,
                        suicide_legal: jax.Array, size: int,
                        safe_big_territories: jax.Array,
                        unsafe_big_territories: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One player's pass-alive marking.

    Returns (mark_all bool[NN] — region/stone points to set to pla
    unconditionally, mark_if_empty bool[NN] — unsafe-territory points to set
    only if nothing else claimed them).
    """
    nn = size * size
    opp = B.opponent(pla)
    is_pla = stones == pla
    is_opp = stones == opp
    is_empty = stones == B.EMPTY
    region_mask = is_empty | is_opp

    # component labels: pla chains from the stones array; regions from a
    # binarized array so empty and opp connect with each other
    chain_lab = B.connected_labels(stones, size)
    region_vals = jnp.where(region_mask, jnp.int32(-7),
                            jnp.arange(nn, dtype=jnp.int32))
    region_lab_all = B.connected_labels(region_vals, size)
    region_lab = jnp.where(region_mask, region_lab_all, nn)  # NN = not a region

    counting = jnp.where(suicide_legal, region_mask, is_empty)

    adj = _adjacent_chain_labels(chain_lab, stones, pla, size)  # [NN,4]

    # dense region-x-chain adjacency via one-hot matmuls (MXU):
    #   ohr[p, r] = point p belongs to region r
    #   adjm[p, c] = point p is adjacent to pla chain c (deduped over dirs)
    #   cnt[r, c] = counting points of r adjacent to c      = ohr^T @ adjm
    #   any[r, c] = region r touches chain c                = ohr^T @ adjm
    bins = jnp.arange(nn, dtype=jnp.int32)
    ohr = (region_lab[:, None] == bins).astype(jnp.float32)     # [NN, NN]
    adjm = jnp.zeros((nn, nn), jnp.float32)
    for d in range(4):
        adjm = adjm + (adj[:, d, None] == bins).astype(jnp.float32)
    cnt_rc = jnp.einsum("pr,pc->rc", ohr * counting[:, None].astype(
        jnp.float32), adjm)                                     # [NN, NN]
    any_rc = jnp.einsum("pr,pc->rc", ohr, adjm) > 0.5           # [NN, NN]

    # counting points per region
    n_count = L.bincount_sum(jnp.where(region_mask, region_lab, -1), nn,
                             counting.astype(jnp.float32))

    vital_rc = any_rc & (cnt_rc >= n_count[:, None] - 0.5) & \
        (n_count[:, None] > 0.5)                                # [NN, NN]
    vital_f = vital_rc.astype(jnp.float32)
    any_f = any_rc.astype(jnp.float32)

    # Benson fixpoint over (chain_alive[NN], region_valid[NN]): two batched
    # matvecs per round instead of scatter/gather segment reductions
    def body(carry):
        chain_alive, _, _ = carry
        dead = 1.0 - chain_alive.astype(jnp.float32)
        # region invalid if adjacent (any-pair) to a dead pla chain
        region_valid = (any_f @ dead) < 0.5
        # vital count per chain over still-valid regions
        vital_ct = region_valid.astype(jnp.float32) @ vital_f
        new_alive = chain_alive & (vital_ct >= 1.5)
        changed = jnp.any(new_alive != chain_alive)
        return new_alive, region_valid, changed

    init_alive = jnp.ones((nn,), bool)  # per-root aliveness, indexed by label
    alive, region_valid, _ = jax.lax.while_loop(
        lambda c: c[2], body, body((init_alive, jnp.ones((nn,), bool), True)))

    # pass-alive stones
    pass_alive_stone = is_pla & (L.gather_1d(alive.astype(jnp.int32),
                                             chain_lab) > 0)

    # region marking
    at_least_one_pla = jnp.any(is_pla)
    adj_to_pla = jnp.any(B.shift4(stones, size, B.WALL) == pla, axis=0)
    internal = region_mask & ~adj_to_pla
    n_internal = L.bincount_sum(jnp.where(region_mask, region_lab, -1), nn,
                                internal.astype(jnp.float32))
    contains_opp = L.bincount_sum(jnp.where(region_mask, region_lab, -1),
                                  nn, is_opp.astype(jnp.float32)) > 0.5

    borders_dead = ~region_valid  # region adjacent to a non-pass-alive pla chain
    small = (n_internal <= 1.5) & ~borders_dead & at_least_one_pla
    safe_big = safe_big_territories & ~contains_opp & ~borders_dead & at_least_one_pla
    region_marked = (L.gather_1d((small | safe_big).astype(jnp.int32),
                                 region_lab) > 0) & region_mask

    unsafe = unsafe_big_territories & \
        ~(L.gather_1d(contains_opp.astype(jnp.int32), region_lab) > 0) \
        & at_least_one_pla & region_mask & is_empty & ~region_marked

    mark_all = pass_alive_stone | region_marked
    return mark_all, unsafe


def calculate_area(stones: jax.Array, size: int,
                   non_pass_alive_stones,
                   safe_big_territories,
                   unsafe_big_territories,
                   suicide_legal) -> jax.Array:
    """int32[NN] area colors (0/1/2), mirroring Board::calculateArea.

    Black is computed first, then white; white's unconditional marks may
    overwrite black's unsafe marks, exactly as in the reference (which
    needs this for pass-dead-surrounded empty points).
    """
    nn = size * size
    b_all, b_unsafe = pass_alive_area_for(
        stones, jnp.int32(B.BLACK), suicide_legal, size,
        safe_big_territories, unsafe_big_territories)
    w_all, w_unsafe = pass_alive_area_for(
        stones, jnp.int32(B.WHITE), suicide_legal, size,
        safe_big_territories, unsafe_big_territories)

    result = jnp.zeros((nn,), jnp.int32)
    result = jnp.where(b_all, B.BLACK, result)
    result = jnp.where(b_unsafe & (result == 0), B.BLACK, result)
    result = jnp.where(w_all, B.WHITE, result)
    result = jnp.where(w_unsafe & (result == 0), B.WHITE, result)
    result = jnp.where(non_pass_alive_stones & (result == 0), stones, result)
    # off-board cells (WALL stones on rect/shaped boards) own nothing
    return jnp.where(stones == B.WALL, jnp.int32(B.EMPTY), result)


def calculate_independent_life_area(
        stones: jax.Array, size: int,
        keep_territories, keep_stones,
        suicide_legal) -> tuple[jax.Array, jax.Array]:
    """Area colors excluding seki, mirroring
    Board::calculateIndependentLifeArea (board.cpp:1876-1921, helper
    board.cpp:2230).

    Returns (area int32[NN], white_minus_black_region_count int32): the
    signed count of independent-life regions (connected components of basic
    area, seki excluded) for group-tax scoring (TAX_ALL subtracts 2x this).

    Semantics: basic area = full area scoring (pass-alive + big territories
    + remaining stones keep their color); a basic-area component is "seki"
    if it contains an owner's stone in atari or touches dame (an empty
    point with no basic-area owner); seki components are excluded. With
    keep_territories, points whose area owner differs from their stone
    color are kept regardless; with keep_stones, points whose owner matches
    their stone color are kept regardless.
    """
    nn = size * size
    basic = calculate_area(stones, size,
                           jnp.bool_(True), jnp.bool_(True), jnp.bool_(True),
                           suicide_legal)

    chain_lab = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, chain_lab, size)

    owned = basic != B.EMPTY
    nbr_s = B.shift4(stones, size, B.WALL)
    nbr_b = B.shift4(basic, size, jnp.int32(B.WALL))
    touches_dame = jnp.any((nbr_s == B.EMPTY) & (nbr_b == B.EMPTY), axis=0)
    atari_own = (stones == basic) & owned & (libs == 1)
    seed = owned & (atari_own | touches_dame)

    # flood seki through same-color basic-area components
    comp_vals = jnp.where(owned, basic, jnp.arange(nn, dtype=jnp.int32) + 8)
    comp = B.connected_labels(comp_vals, size)
    seki_c = L.bincount_sum(jnp.where(owned & seed, comp, -1), nn,
                            dtype=jnp.int32)
    seki = owned & (L.gather_1d(seki_c, comp) >= 1)

    result = jnp.where(owned & ~seki, basic, B.EMPTY)

    is_root = owned & ~seki & (comp == jnp.arange(nn))
    wmb = jnp.sum(jnp.where(is_root,
                            jnp.where(basic == B.WHITE, 1, -1), 0)).astype(
        jnp.int32)

    keep_t = owned & (basic != stones)
    result = jnp.where(keep_territories & keep_t, basic, result)
    keep_s = owned & (basic == stones)
    result = jnp.where(keep_stones & keep_s, basic, result)
    return result, wmb
