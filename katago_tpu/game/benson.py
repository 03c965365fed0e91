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
engine's label propagation, per-point adjacent-chain label sets (≤4,
deduped), unique (region, chain) pairs resolved by sorting the ≤4·NN pair
keys, then the Benson fixpoint as a while_loop whose body is two segment
reductions (vital counts per chain, killed-neighbor flags per region).
No data-dependent shapes; vmap-able over the game batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B


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

    # pair keys (region, chain) from region points; two families:
    #   any-pairs:  adjacency of the region to the chain (any region point)
    #   cnt-pairs:  counting-point adjacency (for vitality counting)
    rkey = region_lab[:, None]                                   # [NN,1]
    valid_any = region_mask[:, None] & (adj != nn)
    pair_key = jnp.where(valid_any, rkey * (nn + 1) + adj, nn * (nn + 1) + nn)
    is_cnt = counting[:, None] & (adj != nn)

    flat_key = pair_key.reshape(-1)                              # [4NN]
    flat_cnt = is_cnt.reshape(-1)

    order = jnp.argsort(flat_key)
    skey = flat_key[order]
    scnt = flat_cnt[order].astype(jnp.int32)

    # unique representative = first occurrence of each key
    is_rep = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    # count of counting-point adjacencies per unique pair: segmented sum via
    # cumsum differencing
    # segmented sum of counting-adjacencies per unique pair
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va + vb)

    _, seg_inclusive = jax.lax.associative_scan(combine, (is_rep, scnt))
    is_last = jnp.concatenate([skey[:-1] != skey[1:], jnp.ones((1,), bool)])

    pr = skey // (nn + 1)   # region label per sorted pair
    pc = skey % (nn + 1)    # chain label per sorted pair
    pair_valid = is_last & (pr < nn) & (pc < nn)

    # counting points per region
    n_count = jnp.zeros((nn + 1,), jnp.int32).at[region_lab].add(
        counting.astype(jnp.int32))[:nn]

    pair_vital = pair_valid & (seg_inclusive == n_count[jnp.minimum(pr, nn - 1)]) \
        & (n_count[jnp.minimum(pr, nn - 1)] > 0)

    # Benson fixpoint over (chain_alive[NN], region_valid[NN])
    chain_is_root = (chain_lab == jnp.arange(nn)) & is_pla

    def body(carry):
        chain_alive, _, _ = carry
        # region invalid if adjacent (any-pair) to a dead pla chain
        dead_adj = jnp.zeros((nn + 1,), jnp.int32).at[
            jnp.where(pair_valid, pr, nn)].add(
            (pair_valid & ~chain_alive[jnp.minimum(pc, nn - 1)]).astype(jnp.int32))
        region_valid = dead_adj[:nn] == 0
        # vital count per chain over still-valid regions
        vital_ct = jnp.zeros((nn + 1,), jnp.int32).at[
            jnp.where(pair_vital, pc, nn)].add(
            (pair_vital & region_valid[jnp.minimum(pr, nn - 1)]).astype(jnp.int32))
        new_alive = chain_alive & (vital_ct[:nn] >= 2)
        changed = jnp.any(new_alive != chain_alive)
        return new_alive, region_valid, changed

    init_alive = jnp.ones((nn,), bool)  # per-root aliveness, indexed by label
    alive, region_valid, _ = jax.lax.while_loop(
        lambda c: c[2], body, body((init_alive, jnp.ones((nn,), bool), True)))
    del chain_is_root

    # pass-alive stones
    pass_alive_stone = is_pla & alive[chain_lab]

    # region marking
    at_least_one_pla = jnp.any(is_pla)
    adj_to_pla = jnp.any(B.shift4(stones, size, B.WALL) == pla, axis=0)
    internal = region_mask & ~adj_to_pla
    n_internal = jnp.zeros((nn + 1,), jnp.int32).at[region_lab].add(
        internal.astype(jnp.int32))[:nn]
    contains_opp = (jnp.zeros((nn + 1,), jnp.int32).at[region_lab].add(
        is_opp.astype(jnp.int32))[:nn]) > 0

    borders_dead = ~region_valid  # region adjacent to a non-pass-alive pla chain
    small = (n_internal <= 1) & ~borders_dead & at_least_one_pla
    safe_big = safe_big_territories & ~contains_opp & ~borders_dead & at_least_one_pla
    region_marked = (small | safe_big)[jnp.minimum(region_lab, nn - 1)] & region_mask

    unsafe = unsafe_big_territories & ~contains_opp[jnp.minimum(region_lab, nn - 1)] \
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
    seki_c = jnp.zeros((nn + 1,), jnp.int32).at[
        jnp.where(owned, comp, nn)].max(seed.astype(jnp.int32))
    seki = owned & (seki_c[comp] == 1)

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
