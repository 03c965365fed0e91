"""Vectorized ladder solver for NN input planes 14-17.

The reference solves ladders with a budgeted alpha-beta search over board
undo/redo (Board::searchIsLadderCaptured, board.cpp:1628, budget 25000
nodes) invoked per chain by iterLadders (nninputs.cpp:815). That shape —
recursive, branchy, per-chain — is wrong for a TPU. Here every candidate
chain on the board becomes one lane of a batched *forced-line simulation*:

  - all chains with 1 or 2 liberties are gathered (up to ``max_chains``);
  - each gets up to 3 simulation slots: defender-to-move (libs == 1), and
    attacker-first at either liberty (libs == 2, mirroring
    searchIsLadderCapturedAttackerFirst2Libs, board.cpp:1581);
  - each simulation advances defender-move/attacker-move pairs in lockstep
    under one `lax.while_loop`, with candidate moves evaluated by batched
    trial `play_move` calls (a 1-ply greedy in place of the reference's
    backtracking: the defender picks the liberty-maximizing move among
    extend + liberty-gaining captures; the attacker picks the liberty
    filling move minimizing the defender's liberties).

This reads all standard ladders and ladder-breaker interactions exactly;
it can differ from the reference's search on deep branchy captures where
the greedy line is not optimal for one side (rare in real positions; the
reference itself truncates at a node budget there). Ko is handled as in
the reference: the defender is assumed to win any ko (search ends "not
laddered" when it is the defender's turn and a simple-ko point exists,
board.cpp:1700-1704).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B


class LadderResult(NamedTuple):
    laddered: jax.Array          # bool[NN]: stones of ladder-captured chains
    working_vs_black: jax.Array  # bool[NN]: working attacker 1st moves vs 2-lib black chains
    working_vs_white: jax.Array  # bool[NN]: same vs white chains


class _Sim(NamedTuple):
    stones: jax.Array    # int32[NN]
    ko_loc: jax.Array    # int32
    done: jax.Array      # bool
    laddered: jax.Array  # bool
    step: jax.Array      # int32


_BIG = jnp.int32(1 << 20)


def _chain_lib_points(stones, labels, rep, size):
    """bool[NN]: empty points adjacent to the chain containing rep."""
    nn = size * size
    neigh = jnp.asarray(B.neighbor_table(size))
    chain = (labels == labels[rep]) & (stones != B.EMPTY)
    cpad = jnp.concatenate([chain, jnp.zeros((1,), bool)])
    adj = jnp.any(cpad[neigh], axis=1)
    return (stones == B.EMPTY) & adj


def _lowest_k(mask, k, nn):
    """Indices of the k lowest set positions of bool[NN] (nn where unset)."""
    vals = jnp.where(mask, jnp.arange(nn, dtype=jnp.int32), _BIG)
    neg_top = jax.lax.top_k(-vals, k)[0]
    idx = -neg_top
    return jnp.where(idx >= _BIG, nn, idx).astype(jnp.int32)


def _trial_play(board_stones, ko_loc, loc, player, size):
    """play_move on a hash-less board; returns (stones, ko_loc)."""
    st = B.BoardState(stones=board_stones, ko_loc=ko_loc,
                      pos_hash=jnp.zeros((2,), jnp.uint32))
    new, _ = B.play_move(st, loc, player, size)
    return new.stones, new.ko_loc


def _defender_candidates(stones, labels, libs, rep, defender, size):
    """Defender move candidates: extend at the lone liberty + up to 3
    liberty-gaining captures (findLibertyGainingCaptures, board.cpp).
    Returns (cand int32[4], valid bool[4])."""
    nn = size * size
    neigh = jnp.asarray(B.neighbor_table(size))
    attacker = B.opponent(defender)
    lib_pts = _chain_lib_points(stones, labels, rep, size)
    extend_loc = jnp.argmax(lib_pts).astype(jnp.int32)

    chain = (labels == labels[rep]) & (stones != B.EMPTY)
    cpad = jnp.concatenate([chain, jnp.zeros((1,), bool)])
    adj_chain = jnp.any(cpad[neigh], axis=1)
    opp_atari_adj = (stones == attacker) & (libs == 1) & adj_chain
    lab_mark = jnp.zeros((nn + 1,), jnp.int32).at[
        jnp.where(opp_atari_adj, labels, nn)].max(1)
    spad = B._pad(stones, B.WALL)
    lpad = B._pad(labels, jnp.int32(nn))
    nbr_marked = jnp.any(
        (spad[neigh] == attacker) & (lab_mark[lpad[neigh]] == 1), axis=1)
    cap_moves = (stones == B.EMPTY) & nbr_marked
    caps = _lowest_k(cap_moves, 3, nn)

    cand = jnp.concatenate([extend_loc[None], caps])           # [4]
    valid = jnp.concatenate([jnp.any(lib_pts)[None], caps < nn])
    return cand, valid


def _defender_best_reply_libs(stones, ko_loc, rep, defender, size):
    """Max liberties the defender chain can reach with one move (its greedy
    reply): the base heuristic value both phases share. Also returns the
    trial boards so the defender phase can commit the winner."""
    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    cand, valid = _defender_candidates(stones, labels, libs, rep, defender,
                                       size)
    nn = size * size
    tr_stones, tr_ko = jax.vmap(
        lambda c: _trial_play(stones, ko_loc, jnp.minimum(c, nn), defender,
                              size))(cand)
    tr_labels = jax.vmap(lambda s: B.connected_labels(s, size))(tr_stones)
    tr_libs = jax.vmap(
        lambda s, l: B.chain_liberties(s, l, size))(tr_stones, tr_labels)
    res_libs = tr_libs[:, rep]
    alive = tr_stones[:, rep] == defender
    score = jnp.where(valid & alive, res_libs, -1)
    best = jnp.argmax(score).astype(jnp.int32)
    return score[best], tr_stones[best], tr_ko[best]


def _defender_phase(sim: _Sim, rep, defender, size):
    """Defender to move with (nominally) 1 liberty: terminal checks, then
    commit the liberty-maximizing move among extend + captures."""
    stones = sim.stones
    captured = stones[rep] != defender
    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    dlibs = libs[rep]

    # terminal checks (board.cpp:1694-1704)
    esc_ko = sim.ko_loc >= 0          # attacker left a ko: defender wins
    esc_libs = dlibs >= 2

    best_libs, best_stones, best_ko = _defender_best_reply_libs(
        stones, sim.ko_loc, rep, defender, size)
    esc_escaped = best_libs >= 3
    now_captured = best_libs <= 1     # best defense still loses the chain

    new_done = captured | esc_ko | esc_libs | esc_escaped | now_captured
    new_laddered = captured | now_captured
    commit = ~new_done
    stones2 = jnp.where(commit, best_stones, stones)
    ko2 = jnp.where(commit, best_ko, sim.ko_loc)
    return _Sim(stones=stones2, ko_loc=ko2,
                done=sim.done | new_done,
                laddered=jnp.where(sim.done, sim.laddered, new_laddered),
                step=sim.step)


def _attacker_phase(sim: _Sim, rep, defender, size):
    """Attacker fills one of the defender's two liberties, chosen by 2-ply
    lookahead: minimize the defender's best-reply liberty count (the
    collapsed version of the reference's try-both-and-search,
    board.cpp:1608-1613)."""
    nn = size * size
    attacker = B.opponent(defender)
    stones = sim.stones
    labels = B.connected_labels(stones, size)
    lib_pts = _chain_lib_points(stones, labels, rep, size)
    cand = _lowest_k(lib_pts, 2, nn)                          # [2]
    legal = B.legal_moves_basic(
        B.BoardState(stones=stones, ko_loc=sim.ko_loc,
                     pos_hash=jnp.zeros((2,), jnp.uint32)),
        attacker, jnp.bool_(False), size)
    legal_pad = jnp.concatenate([legal, jnp.zeros((1,), bool)])
    valid = (cand < nn) & legal_pad[jnp.minimum(cand, nn)]

    tr_stones, tr_ko = jax.vmap(
        lambda c: _trial_play(stones, sim.ko_loc, jnp.minimum(c, nn), attacker,
                              size))(cand)
    reply_libs, _, _ = jax.vmap(
        lambda s, k: _defender_best_reply_libs(s, k, rep, defender, size)
    )(tr_stones, tr_ko)                                       # [2]
    # minimize defender's best achievable libs; tie-break toward the lower
    # index (the reference's deterministic move ordering)
    score = jnp.where(valid, reply_libs, _BIG)
    best = jnp.argmin(score).astype(jnp.int32)
    no_move = ~jnp.any(valid)
    commit = ~no_move
    stones2 = jnp.where(commit, tr_stones[best], stones)
    ko2 = jnp.where(commit, tr_ko[best], sim.ko_loc)
    return _Sim(stones=stones2, ko_loc=ko2,
                done=sim.done | no_move,
                laddered=sim.laddered,
                step=sim.step)


def _run_sim(stones0, rep, defender, premove, active, size: int,
             max_steps: int):
    """One ladder line: optional attacker premove, then defender/attacker
    pairs until resolution. Returns bool: chain is ladder-captured."""
    nn = size * size
    attacker = B.opponent(defender)
    # attacker premove (2-lib candidates); illegal premove -> not laddered
    has_pre = premove >= 0
    legal0 = B.legal_moves_basic(
        B.BoardState(stones=stones0, ko_loc=jnp.int32(-1),
                     pos_hash=jnp.zeros((2,), jnp.uint32)),
        attacker, jnp.bool_(False), size)
    pre_ok = ~has_pre | legal0[jnp.clip(premove, 0, nn - 1)]
    st1, ko1 = _trial_play(stones0, jnp.int32(-1),
                           jnp.where(has_pre, premove, nn), attacker, size)
    # the defender is assumed to win kos: clear ko at the root
    # (board.cpp:1643-1645); premove-created kos still end the search at the
    # first defender phase via ko1.
    sim = _Sim(stones=st1, ko_loc=jnp.where(has_pre, ko1, jnp.int32(-1)),
               done=~active | ~pre_ok, laddered=jnp.bool_(False),
               step=jnp.int32(0))

    def cond(s):
        return ~s.done & (s.step < max_steps)

    def body(s):
        s = _defender_phase(s, rep, defender, size)
        s = jax.lax.cond(s.done, lambda x: x,
                         lambda x: _attacker_phase(x, rep, defender, size), s)
        return s._replace(step=s.step + 1)

    sim = jax.lax.while_loop(cond, body, sim)
    # step cap without resolution: assume not laddered (the reference's
    # node-budget bailout, board.cpp:1680-1688)
    return sim.laddered & active & pre_ok


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def ladder_map(stones: jax.Array, size: int, max_chains: int = 16,
               max_steps: int | None = None) -> LadderResult:
    """Solve all 1-2 liberty chains on one board.

    max_chains bounds how many distinct low-liberty chains are analyzed
    (lowest flat index first, the reference's row-major iteration order);
    boards with more candidates than that get the overflow chains marked
    not-laddered. max_steps bounds each forced line's length in move pairs
    (default scales with board area, cf. the reference's stack bound of
    1.5x board area plies, board.cpp:1648).
    """
    nn = size * size
    if max_steps is None:
        max_steps = (3 * nn) // 4 + 6
    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    occupied = (stones == B.BLACK) | (stones == B.WHITE)
    idx = jnp.arange(nn, dtype=jnp.int32)
    is_head = occupied & (labels == idx) & (libs >= 1) & (libs <= 2)
    heads = _lowest_k(is_head, max_chains, nn)                 # [K]
    head_ok = heads < nn
    h = jnp.minimum(heads, nn - 1)
    hdef = stones[h]
    hlibs = libs[h]

    # liberty points for 2-lib premoves
    def two_libs(rep):
        pts = _chain_lib_points(stones, labels, rep, size)
        return _lowest_k(pts, 2, nn)

    libpts = jax.vmap(two_libs)(h)                             # [K, 2]

    k = max_chains
    reps = jnp.concatenate([h, h, h])                          # [3K]
    defenders = jnp.concatenate([hdef, hdef, hdef])
    premoves = jnp.concatenate([
        jnp.full((k,), -1, jnp.int32),
        jnp.where(libpts[:, 0] < nn, libpts[:, 0], -1),
        jnp.where(libpts[:, 1] < nn, libpts[:, 1], -1),
    ])
    active = jnp.concatenate([
        head_ok & (hlibs == 1),
        head_ok & (hlibs == 2) & (libpts[:, 0] < nn),
        head_ok & (hlibs == 2) & (libpts[:, 1] < nn),
    ])

    results = jax.vmap(
        lambda r, d, p, a: _run_sim(stones, r, d, p, a, size, max_steps)
    )(reps, defenders, premoves, active)                       # [3K] bool

    lad1 = results[:k]
    lad2a, lad2b = results[k:2 * k], results[2 * k:]
    chain_laddered = lad1 | lad2a | lad2b                      # per head

    mark = jnp.zeros((nn + 1,), jnp.int32).at[
        jnp.where(head_ok & chain_laddered, h, nn)].max(1)
    laddered_mask = (mark[labels] == 1) & occupied

    def working_mask(color):
        m = jnp.zeros((nn + 1,), bool)
        sel_a = head_ok & lad2a & (hdef == color)
        sel_b = head_ok & lad2b & (hdef == color)
        m = m.at[jnp.where(sel_a, jnp.minimum(libpts[:, 0], nn), nn)].max(
            sel_a)
        m = m.at[jnp.where(sel_b, jnp.minimum(libpts[:, 1], nn), nn)].max(
            sel_b)
        return m[:nn]

    return LadderResult(
        laddered=laddered_mask,
        working_vs_black=working_mask(jnp.int32(B.BLACK)),
        working_vs_white=working_mask(jnp.int32(B.WHITE)),
    )
