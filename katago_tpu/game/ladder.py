"""Vectorized ladder solver for NN input planes 14-17.

The reference solves ladders with a budgeted backtracking search over
board undo/redo (Board::searchIsLadderCaptured, board.cpp:1628, budget
25000 nodes) invoked per chain by iterLadders (nninputs.cpp:815). This is
the same *search semantics* — the defender branches over liberty-gaining
captures + the lone-liberty extension, the attacker over the chain's two
liberties, with the reference's exact base cases (defender wins on >=2
libs / any attacker-left simple ko / provable escape; attacker wins on
<=1 lib / the double-ko-death pattern) — but re-shaped for a TPU:

  - all chains with 1 or 2 liberties are gathered (up to ``max_chains``);
  - each gets up to 3 query lanes: defender-to-move (libs == 1), and
    attacker-first at either liberty (libs == 2, mirroring
    searchIsLadderCapturedAttackerFirst2Libs, board.cpp:1581);
  - every lane runs the backtracking search as one `lax.while_loop` over
    an EXPLICIT STACK (`_Stk`): per-level pre-move boards (int8), exact
    chain labels (int16), ko point, and candidate-move lists live in
    fixed [depth, NN] arrays, so a whole batch of lanes advances in
    lockstep vector ops with no recursion or data-dependent shapes.

Cost structure (this file is on the per-leaf featurize path of every
search playout, so it is speed-of-light-critical): the ONLY iterative
fixpoint is one stone-chain labeling per query (`_stone_labels`, which
unlike B.connected_labels does not label empty regions — the empty-region
fixpoint dominates convergence on open boards and nothing here needs it).
Inside the search loop there are NO fixpoints: a move merges at most 4
known chains and captures at most 4 known chains, so `_move_effects`
maintains the label array *exactly* — merged points take the min of <=5
known labels, captured points revert to their own index — and undo is a
row restore from the stack. Per node: one candidate generation, one
`_move_effects`, one liberty scatter pass.

Deviations from the reference (all conservative, none observed on the
parity fixtures): the defender's capture list caps at ``num_caps`` moves
per level, the stack caps at ``max_depth`` plies (counted as captured,
the reference's own stack-limit bias), and the reference's sound move-
ordering/pruning heuristics (non-adjacent-liberty quitouts, connection-
liberty ordering) are dropped — they only affect node counts, not
results, for a complete search.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.ops import lookup as L


class LadderResult(NamedTuple):
    laddered: jax.Array          # bool[NN]: stones of ladder-captured chains
    working_vs_black: jax.Array  # bool[NN]: working attacker 1st moves vs 2-lib black chains
    working_vs_white: jax.Array  # bool[NN]: same vs white chains


class _MoveEffects(NamedTuple):
    """Exact incremental effects of one stone placement (no relabeling)."""
    new_stones: jax.Array   # int32[NN]
    new_labels: jax.Array   # int32[NN] exact stone-chain labels after move
    my_mask: jax.Array      # bool[NN]: chain containing the placed stone
    my_libs: jax.Array      # int32: its exact liberty count
    num_captured: jax.Array  # int32
    ko_loc: jax.Array       # int32: simple-ko ban or -1
    legal: jax.Array        # bool: empty target and not suicide (ko unchecked)


_BIG = jnp.int32(1 << 20)


def _dilate(m, size):
    """4-neighbor dilation of bool[NN] via 2-D shifts — no gathers. TPU
    lowers the neighbor-table gather form ([NN,4] indices) to serialized
    scalar loads; pad+slice shifts stay pure vector ops (~300x faster at
    search lane widths)."""
    m2 = m.reshape(size, size)
    up = jnp.pad(m2[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(m2[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(m2[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(m2[:, :-1], ((0, 0), (1, 0)))
    return (up | down | left | right).reshape(size * size)


def _extract(x, loc):
    """x[loc] as a one-hot reduction (fusable; avoids per-lane dynamic
    gather). loc must be in-range."""
    nn = x.shape[0]
    idx = jnp.arange(nn, dtype=jnp.int32)
    return jnp.sum(jnp.where(idx == loc, x, jnp.zeros_like(x)))


_shift4 = B.shift4


def _stone_labels(stones, size):
    """Min-index labels of stone chains only; empty points keep their own
    index. Converges in O(log chain-diameter) rounds — much faster than
    B.connected_labels, whose whole-board empty-region components dominate
    its fixpoint on open boards."""
    nn = size * size
    idx = jnp.arange(nn, dtype=jnp.int32)
    occ = (stones == B.BLACK) | (stones == B.WHITE)
    same = (_shift4(stones, size, B.WALL) == stones[None, :]) & occ[None, :]

    def body(carry):
        lab, _ = carry
        # no pointer jump: lab[lab] point-gathers serialize on TPU
        # (board.connected_labels docstring); stone-chain diameters are
        # small so pure propagation converges in a few rounds
        lab2 = lab
        for _ in range(2):
            nbr_min = jnp.min(jnp.where(same, _shift4(lab2, size, B.INT_MAX),
                                        B.INT_MAX), axis=0)
            lab2 = jnp.minimum(lab2, nbr_min)
        return lab2, jnp.any(lab2 != lab)

    lab, _ = jax.lax.while_loop(lambda c: c[1], body, (idx, jnp.bool_(True)))
    return lab


def _analyze(stones, size):
    labels = _stone_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    return labels, libs


def _move_effects(stones, labels, libs, m, player, size) -> _MoveEffects:
    """Play `player` at point m using only the precomputed analysis.

    The placed stone merges the <=4 adjacent own chains and captures the
    <=4 adjacent opponent chains in atari; both sets are identified by
    comparing the label array against the neighbors' label scalars, and
    the merged chain's liberty count is the exact count of empty points
    adjacent to its mask on the post-capture board (the incremental
    equivalent of Board::playMoveAssumeLegal's linked-list surgery,
    board.cpp). The stone-label array is maintained exactly: merged
    points take min(merged labels, m), captured points revert to their
    own index. m must be < NN; callers mask invalid candidates.
    """
    nn = size * size
    idx = jnp.arange(nn, dtype=jnp.int32)
    opp = B.opponent(player)
    # per-direction neighbor values of point m via shifted boards + one-hot
    # extraction (no gathers)
    s_sh = _shift4(stones, size, B.WALL)
    l_sh = _shift4(labels, size, jnp.int32(nn))
    lib_sh = _shift4(libs, size, jnp.int32(0))
    nbr_s = jnp.stack([_extract(s_sh[d], m) for d in range(4)])
    nbr_l = jnp.stack([_extract(l_sh[d], m) for d in range(4)])
    nbr_libs = jnp.stack([_extract(lib_sh[d], m) for d in range(4)])
    own_sel = nbr_s == player
    cap_sel = (nbr_s == opp) & (nbr_libs == 1)

    own_mask = jnp.zeros((nn,), bool)
    cap_mask = jnp.zeros((nn,), bool)
    merged_label = m
    for i in range(4):
        own_mask = own_mask | (own_sel[i] & (labels == nbr_l[i]))
        cap_mask = cap_mask | (cap_sel[i] & (labels == nbr_l[i]))
        merged_label = jnp.minimum(merged_label,
                                   jnp.where(own_sel[i], nbr_l[i], m))
    own_mask = own_mask & (stones == player)
    cap_mask = cap_mask & (stones == opp)

    target_empty = stones[m] == B.EMPTY
    at_m = idx == m
    new_stones = jnp.where(at_m, player,
                           jnp.where(cap_mask, B.EMPTY, stones))
    my_mask = own_mask | at_m
    new_labels = jnp.where(my_mask, merged_label,
                           jnp.where(cap_mask, idx, labels))
    adj = _dilate(my_mask, size)
    my_libs = jnp.sum(((new_stones == B.EMPTY) & adj).astype(jnp.int32))
    num_captured = jnp.sum(cap_mask.astype(jnp.int32))

    own_any = jnp.any(own_sel)
    is_ko = (num_captured == 1) & ~own_any & (my_libs == 1)
    ko_loc = jnp.where(is_ko, jnp.argmax(cap_mask).astype(jnp.int32),
                       jnp.int32(-1))
    legal = target_empty & (my_libs > 0)
    return _MoveEffects(new_stones=new_stones, new_labels=new_labels,
                        my_mask=my_mask,
                        my_libs=my_libs, num_captured=num_captured,
                        ko_loc=ko_loc, legal=legal)


def _rep_libs_after(stones, labels, rep, eff: _MoveEffects, size):
    """Exact liberties of the chain containing `rep` after eff's move: the
    merged mask when the move touched rep's chain, else rep's original
    chain mask on the post-capture board. 0 if the chain was captured."""
    alive = _extract(eff.new_stones, rep) == _extract(stones, rep)
    base_mask = (labels == _extract(labels, rep)) & (stones != B.EMPTY)
    mask = jnp.where(_extract(eff.my_mask, rep), eff.my_mask, base_mask)
    adj = _dilate(mask, size)
    cnt = jnp.sum(((eff.new_stones == B.EMPTY) & adj).astype(jnp.int32))
    return jnp.where(alive, cnt, 0)


def _chain_lib_points(stones, labels, rep, size):
    """bool[NN]: empty points adjacent to the chain containing rep."""
    chain = (labels == _extract(labels, rep)) & (stones != B.EMPTY)
    return (stones == B.EMPTY) & _dilate(chain, size)


def _lowest_k(mask, k, nn):
    """Indices of the k lowest set positions of bool[NN] (nn where unset).

    Small k (move candidates): chained min-reductions — ~200x cheaper
    than lax.top_k on TPU at search lane widths (top_k lowers to a full
    sort). Large k (head selection): one rank-compare one-hot reduction
    instead of k sequential mins."""
    if k > 8:
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1          # [NN]
        idx = jnp.arange(nn, dtype=jnp.int32)
        slot = jnp.where(mask, rank, -1)
        # out[j] = min index with rank j (unique), nn if none
        hit = slot[:, None] == jnp.arange(k, dtype=jnp.int32)  # [NN, k]
        out = jnp.sum(jnp.where(hit, idx[:, None], 0), axis=0)
        return jnp.where(jnp.any(hit, axis=0), out,
                         jnp.int32(nn)).astype(jnp.int32)
    vals = jnp.where(mask, jnp.arange(nn, dtype=jnp.int32), _BIG)
    outs = []
    for _ in range(k):
        m = jnp.min(vals)
        outs.append(jnp.where(m >= _BIG, jnp.int32(nn), m))
        vals = jnp.where(vals == m, _BIG, vals)
    return jnp.stack(outs).astype(jnp.int32)


def _defender_candidates(stones, labels, libs, rep, defender, size,
                         num_caps: int):
    """Defender move candidates: up to num_caps liberty-gaining captures
    (findLibertyGainingCaptures, board.cpp:1522 — the lone liberties of
    attacker chains in atari adjacent to the defender chain) followed by
    the extension at the defender's lone liberty (the reference's move
    order, board.cpp:1717-1719). Returns (cand int32[num_caps+1],
    valid bool[num_caps+1], any_caps bool)."""
    nn = size * size
    attacker = B.opponent(defender)
    lib_pts = _chain_lib_points(stones, labels, rep, size)
    extend_loc = jnp.argmax(lib_pts).astype(jnp.int32)

    chain = (labels == _extract(labels, rep)) & (stones != B.EMPTY)
    adj_chain = _dilate(chain, size)
    opp_atari_adj = (stones == attacker) & (libs == 1) & adj_chain
    # whole chains containing a touching point: mark labels then read the
    # marks back per point — both as one-hot forms (ops/lookup.py);
    # label-vector scatters AND gathers serialize on TPU
    lab_mark = L.bincount_sum(jnp.where(opp_atari_adj, labels, -1), nn,
                              dtype=jnp.int32)
    marked_pts = (stones == attacker) & (L.gather_1d(lab_mark, labels) >= 1)
    cap_moves = (stones == B.EMPTY) & _dilate(marked_pts, size)
    caps = _lowest_k(cap_moves, num_caps, nn)

    cand = jnp.concatenate([caps, extend_loc[None]])
    valid = jnp.concatenate([caps < nn, jnp.any(lib_pts)[None]])
    return cand, valid, jnp.any(cap_moves)


def _empty_neighbor_count(stones, size):
    """int32[NN]: getNumImmediateLiberties for every point."""
    return jnp.sum((_shift4(stones, size, B.WALL) == B.EMPTY)
                   .astype(jnp.int32), axis=0)


def _would_be_ko_capture(stones, labels, libs, size, defender):
    """bool[NN]: wouldBeKoCapture(loc, attacker) for every empty point
    (board.cpp:518-545): all 4 neighbors defender-or-wall, exactly one
    adjacent point belonging to a 1-lib defender chain, and that chain is
    a single stone."""
    nn = size * size
    nbr_s = _shift4(stones, size, B.WALL)
    nbr_libs = _shift4(libs, size, jnp.int32(0))
    all_def_or_wall = jnp.all((nbr_s == defender) | (nbr_s == B.WALL),
                              axis=0)
    cap_nbr = (nbr_s == defender) & (nbr_libs == 1)
    cap_count = jnp.sum(cap_nbr.astype(jnp.int32), axis=0)
    sizes = L.bincount_sum(jnp.where(stones != B.EMPTY, labels, -1), nn,
                           dtype=jnp.int32)
    nbr_size1 = _shift4(
        L.gather_1d(sizes, labels) * (stones != B.EMPTY), size,
        jnp.int32(0)) == 1
    one_single = jnp.sum((cap_nbr & nbr_size1).astype(jnp.int32),
                         axis=0) == 1
    return ((stones == B.EMPTY) & all_def_or_wall & (cap_count == 1)
            & one_single)


class _Stk(NamedTuple):
    """Explicit-stack state of one ladder search lane
    (Board::searchIsLadderCaptured's stack machine, board.cpp:1628-1851,
    as a branchless lax.while_loop)."""
    stones: jax.Array      # int32[NN] current board
    labels: jax.Array      # int32[NN] exact stone-chain labels
    libs: jax.Array        # int32[NN] per-chain liberty counts
    ko: jax.Array          # int32 simple-ko point or -1
    stk_stones: jax.Array  # int8[D, NN] pre-move board per level
    stk_labels: jax.Array  # int16[D, NN]
    stk_ko: jax.Array      # int32[D]
    stk_moves: jax.Array   # int32[D, M] candidate moves per level
    stk_len: jax.Array     # int32[D]
    stk_cur: jax.Array     # int32[D]; -1 = level not yet expanded
    idx: jax.Array         # int32 stack level; -1 = returned from root
    ret: jax.Array         # bool value being returned
    from_deeper: jax.Array  # bool: board must be restored on re-entry
    nodes: jax.Array       # int32 moves played (node budget)


def _search_captured(stones0, labels0, libs0, ko0, rep, defender, active,
                     size: int, depth: int, num_caps: int, budget: int):
    """Is the defender chain at `rep` ladder-captured, defender to move?

    The reference's exact backtracking search (searchIsLadderCaptured with
    defenderFirst=true, board.cpp:1628-1851): the defender branches over
    liberty-gaining captures + the lone-liberty extension, the attacker
    over the chain's two liberties; the defender wins on >=2 liberties at
    its turn, any simple ko left by the attacker, or a provable escape;
    the attacker wins on <=1 liberty, the double-ko-death pattern, or
    depth exhaustion (the reference's stack-limit bias); node-budget
    exhaustion means not-captured. Implemented as one lax.while_loop over
    an explicit stack of (board, labels, ko, move-list) levels so a whole
    batch of lanes runs in lockstep vector ops; the only fixpoint anywhere
    is the caller's initial labeling ( _move_effects maintains labels
    exactly through each push).
    """
    nn = size * size
    attacker = B.opponent(defender)
    m_moves = num_caps + 1

    init = _Stk(
        stones=stones0, labels=labels0, libs=libs0, ko=ko0,
        stk_stones=jnp.zeros((depth, nn), jnp.int8),
        stk_labels=jnp.zeros((depth, nn), jnp.int16),
        stk_ko=jnp.zeros((depth,), jnp.int32),
        stk_moves=jnp.zeros((depth, m_moves), jnp.int32),
        stk_len=jnp.zeros((depth,), jnp.int32),
        stk_cur=jnp.full((depth,), -1, jnp.int32),
        idx=jnp.int32(0), ret=jnp.bool_(False),
        from_deeper=jnp.bool_(False), nodes=jnp.int32(0))

    def cond(s: _Stk):
        return (s.idx >= 0) & (s.nodes < budget)

    def body(s: _Stk) -> _Stk:
        lvl = jnp.clip(s.idx, 0, depth - 1)
        is_def = (s.idx % 2) == 0
        mover = jnp.where(is_def, defender, attacker)
        cur = jax.lax.dynamic_index_in_dim(s.stk_cur, lvl, keepdims=False)
        entering = cur == -1

        # ---- re-entry: restore the pre-move board of this level --------
        restore = ~entering & s.from_deeper
        stones = jnp.where(restore,
                           jax.lax.dynamic_index_in_dim(
                               s.stk_stones, lvl,
                               keepdims=False).astype(jnp.int32),
                           s.stones)
        labels = jnp.where(restore,
                           jax.lax.dynamic_index_in_dim(
                               s.stk_labels, lvl,
                               keepdims=False).astype(jnp.int32),
                           s.labels)
        ko = jnp.where(restore,
                       jax.lax.dynamic_index_in_dim(s.stk_ko, lvl,
                                                    keepdims=False),
                       s.ko)
        libs = jnp.where(restore, B.chain_liberties(stones, labels, size),
                         s.libs)

        # ---- current defender-chain status ------------------------------
        chain_gone = _extract(stones, rep) != defender
        dlibs = jnp.where(chain_gone, 0, _extract(libs, rep))

        # ---- node entry: base cases + move generation -------------------
        cand, valid, any_caps = _defender_candidates(
            stones, labels, libs, rep, defender, size, num_caps)
        ext_loc = cand[num_caps]
        ext_eff = _move_effects(stones, labels, libs,
                                jnp.clip(ext_loc, 0, nn - 1), defender, size)
        ext_libs = _rep_libs_after(stones, labels, rep, ext_eff, size)
        ext_valid = valid[num_caps] & ext_eff.legal

        lib2 = _lowest_k(_chain_lib_points(stones, labels, rep, size), 2, nn)
        att_cand = jnp.concatenate(
            [lib2, jnp.full((m_moves - 2,), nn, jnp.int32)])

        # double-ko death (board.cpp:1746-1756): both liberties are
        # 0-immediate-liberty ko mouths, connecting either gains the
        # defender at most 2 libs, and the defender has no captures
        imm = _empty_neighbor_count(stones, size)
        kocap = _would_be_ko_capture(stones, labels, libs, size, defender)
        l0 = jnp.clip(lib2[0], 0, nn - 1)
        l1 = jnp.clip(lib2[1], 0, nn - 1)
        both = (lib2[0] < nn) & (lib2[1] < nn)

        def rep_libs_if_def_plays(loc):
            eff = _move_effects(stones, labels, libs, loc, defender, size)
            return _rep_libs_after(stones, labels, rep, eff, size)

        double_ko = (both
                     & (_extract(imm, l0) == 0) & (_extract(imm, l1) == 0)
                     & (_extract(kocap, l0) > 0) & (_extract(kocap, l1) > 0)
                     & (rep_libs_if_def_plays(l0) <= 2)
                     & (rep_libs_if_def_plays(l1) <= 2)
                     & ~any_caps)

        # base-case returns at entry (board.cpp:1694-1704 + defender
        # pruning 1717-1729)
        def_win = is_def & ((ko >= 0) | (dlibs >= 2)
                            | (ext_valid & (ext_libs >= 3)))
        def_lose = is_def & ~def_win & ~any_caps & (ext_valid
                                                    & (ext_libs <= 1)
                                                    | ~ext_valid)
        att_win = ~is_def & ((dlibs <= 1) | double_ko)
        att_lose = ~is_def & (dlibs >= 3)
        base = entering & (def_win | def_lose | att_win | att_lose)
        base_ret = def_lose | att_win

        # move list on true entry
        moves = jnp.where(is_def, cand, att_cand)
        moves_valid = jnp.where(
            is_def, valid,
            jnp.concatenate([lib2 < nn,
                             jnp.zeros((m_moves - 2,), bool)]))
        moves = jnp.where(moves_valid, moves, nn)
        # compact valid moves to the front (stable), so stk_len counts them
        order = jnp.argsort(jnp.where(moves_valid, 0, 1),
                            stable=True).astype(jnp.int32)
        moves = moves[order]
        n_moves = jnp.sum(moves_valid.astype(jnp.int32))

        gen = entering & ~base
        stk_moves = jnp.where(
            gen,
            jax.lax.dynamic_update_index_in_dim(
                s.stk_moves, moves[None, :], lvl, 0),
            s.stk_moves)
        stk_len = jnp.where(gen,
                            jax.lax.dynamic_update_index_in_dim(
                                s.stk_len, n_moves, lvl, 0),
                            s.stk_len)
        cur2 = jnp.where(gen, 0, cur)

        # ---- re-entry: child returned (or same-level illegal move) ------
        child_cut = ~entering & ((is_def & ~s.ret) | (~is_def & s.ret))
        cur2 = jnp.where(~entering & ~child_cut, cur2 + 1, cur2)

        # ---- list exhausted -> lose for the side to move ----------------
        llen = jnp.where(gen, n_moves,
                         jax.lax.dynamic_index_in_dim(s.stk_len, lvl,
                                                      keepdims=False))
        exhausted = ~base & ~child_cut & (cur2 >= llen)

        popping = base | child_cut | exhausted
        ret_out = jnp.where(base, base_ret,
                            jnp.where(child_cut, s.ret, is_def))

        # ---- try the next move ------------------------------------------
        trying = ~popping
        move_row = jnp.where(gen, moves,
                             jax.lax.dynamic_index_in_dim(s.stk_moves, lvl,
                                                          keepdims=False))
        move = jax.lax.dynamic_index_in_dim(
            move_row, jnp.clip(cur2, 0, m_moves - 1), keepdims=False)
        move_c = jnp.clip(move, 0, nn - 1)
        eff = _move_effects(stones, labels, libs, move_c, mover, size)
        legal = trying & (move < nn) & eff.legal & (move_c != ko)
        depth_hit = legal & (s.idx + 1 >= depth)
        push = legal & ~depth_hit
        illegal = trying & ~legal & ~depth_hit

        # illegal (or depth-capped) move: stay at this level; the next
        # iteration's child_cut/cur++ logic consumes ret (board.cpp:1831)
        ret_stay = jnp.where(depth_hit, jnp.bool_(True),  # stack-limit bias
                             is_def)

        # push: save this level's pre-move board, apply the move
        stk_stones = jnp.where(
            push,
            jax.lax.dynamic_update_index_in_dim(
                s.stk_stones, stones.astype(jnp.int8)[None, :], lvl, 0),
            s.stk_stones)
        stk_labels = jnp.where(
            push,
            jax.lax.dynamic_update_index_in_dim(
                s.stk_labels, labels.astype(jnp.int16)[None, :], lvl, 0),
            s.stk_labels)
        stk_ko = jnp.where(push,
                           jax.lax.dynamic_update_index_in_dim(
                               s.stk_ko, ko, lvl, 0),
                           s.stk_ko)

        new_stones = jnp.where(push, eff.new_stones, stones)
        new_labels = jnp.where(push, eff.new_labels, labels)
        new_libs = jnp.where(push,
                             B.chain_liberties(eff.new_stones,
                                               eff.new_labels, size),
                             libs)
        new_ko = jnp.where(push, eff.ko_loc, ko)

        # write back cur for this level; reset the child level's cur
        stk_cur = jax.lax.dynamic_update_index_in_dim(s.stk_cur, cur2, lvl, 0)
        child = jnp.clip(lvl + 1, 0, depth - 1)
        stk_cur = jnp.where(
            push,
            jax.lax.dynamic_update_index_in_dim(stk_cur, jnp.int32(-1),
                                                child, 0),
            stk_cur)

        new_idx = jnp.where(popping, s.idx - 1,
                            jnp.where(push, s.idx + 1, s.idx))
        new_ret = jnp.where(popping, ret_out,
                            jnp.where(push, s.ret, ret_stay))
        new_from_deeper = popping  # pushes/illegal stays don't need restore

        return _Stk(stones=new_stones, labels=new_labels, libs=new_libs,
                    ko=new_ko, stk_stones=stk_stones, stk_labels=stk_labels,
                    stk_ko=stk_ko, stk_moves=stk_moves, stk_len=stk_len,
                    stk_cur=stk_cur, idx=new_idx, ret=new_ret,
                    from_deeper=new_from_deeper,
                    nodes=s.nodes + push.astype(jnp.int32))

    init = init._replace(idx=jnp.where(active, 0, -1))
    out = jax.lax.while_loop(cond, body, init)
    # node-budget exhaustion: assume not captured (board.cpp:1680-1688)
    return out.ret & (out.nodes < budget) & active


def _run_sim(stones0, labels0, libs0, rep, defender, premove, active,
             size: int, depth: int, num_caps: int = 4,
             budget: int = 25000):
    """One ladder query: optional attacker premove (the 2-liberty
    attacker-first form, board.cpp:1581-1625), then the defender-first
    backtracking search. Returns bool: chain is ladder-captured."""
    nn = size * size
    attacker = B.opponent(defender)
    has_pre = premove >= 0
    pre_eff = _move_effects(stones0, labels0, libs0,
                            jnp.clip(premove, 0, nn - 1), attacker, size)
    pre_ok = ~has_pre | pre_eff.legal
    st1 = jnp.where(has_pre, pre_eff.new_stones, stones0)
    labels1 = jnp.where(has_pre, pre_eff.new_labels, labels0)
    libs1 = B.chain_liberties(st1, labels1, size)
    # the inner defender-first search clears any ko at its root — the
    # defender is assumed to win kos (board.cpp:1643-1645), including a ko
    # left by the premove
    ko1 = jnp.int32(-1)
    return _search_captured(st1, labels1, libs1, ko1, rep, defender,
                            active & pre_ok, size, depth, num_caps, budget)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def ladder_map(stones: jax.Array, size: int, max_chains: int | None = None,
               max_depth: int | None = None, num_caps: int = 4,
               budget: int = 25000,
               ko_loc: jax.Array | int = -1) -> LadderResult:
    """Solve all 1-2 liberty chains on one board.

    max_chains bounds how many distinct low-liberty chains are analyzed
    (lowest flat index first, the reference's row-major iteration order);
    boards with more candidates than that get the overflow chains marked
    not-laddered. The default nn//3 + 8 covers every position seen in
    random-game parity fixtures with margin (a tighter cap is a perf knob
    for search-internal featurization). max_depth bounds the search stack
    (default ~4 board lengths; deeper unresolved lines count as captured,
    the reference's stack-limit bias, board.cpp:1675-1677). budget bounds
    played nodes per query (exhaustion counts as not-captured,
    board.cpp:1680-1688; reference value 25000). num_caps caps the
    defender's candidate capture moves per level (the reference list is
    unbounded; >4 liberty-gaining captures around one ladder is
    out-of-distribution). ko_loc is the board's live simple-ko point (or
    -1): the attacker's first move in the 2-liberty form must respect it
    (isLegal inside searchIsLadderCapturedAttackerFirst2Libs,
    board.cpp:1606-1611; the inner defender-first search then clears ko
    at its root as always).
    """
    nn = size * size
    if max_chains is None:
        max_chains = nn // 3 + 8
    if max_depth is None:
        max_depth = 4 * size + 12
    labels, libs = _analyze(stones, size)
    occupied = (stones == B.BLACK) | (stones == B.WHITE)
    idx = jnp.arange(nn, dtype=jnp.int32)
    is_head = occupied & (labels == idx) & (libs >= 1) & (libs <= 2)
    heads = _lowest_k(is_head, max_chains, nn)                 # [K]
    head_ok = heads < nn
    h = jnp.minimum(heads, nn - 1)
    hdef = L.gather_1d(stones, h)
    hlibs = L.gather_1d(libs, h)

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
    ko = jnp.asarray(ko_loc, jnp.int32)
    active = jnp.concatenate([
        head_ok & (hlibs == 1),
        head_ok & (hlibs == 2) & (libpts[:, 0] < nn) & (libpts[:, 0] != ko),
        head_ok & (hlibs == 2) & (libpts[:, 1] < nn) & (libpts[:, 1] != ko),
    ])

    results = jax.vmap(
        lambda r, d, p, a: _run_sim(stones, labels, libs, r, d, p, a, size,
                                    max_depth, num_caps, budget)
    )(reps, defenders, premoves, active)                       # [3K] bool

    lad1 = results[:k]
    lad2a, lad2b = results[k:2 * k], results[2 * k:]
    chain_laddered = lad1 | lad2a | lad2b                      # per head

    mark = L.bincount_sum(jnp.where(head_ok & chain_laddered, h, -1), nn,
                          dtype=jnp.int32)
    laddered_mask = (L.gather_1d(mark, labels) >= 1) & occupied

    def working_mask(color):
        sel_a = head_ok & lad2a & (hdef == color)
        sel_b = head_ok & lad2b & (hdef == color)
        m = L.bincount_sum(jnp.where(sel_a, libpts[:, 0], -1), nn,
                           dtype=jnp.int32)
        m = m + L.bincount_sum(jnp.where(sel_b, libpts[:, 1], -1), nn,
                               dtype=jnp.int32)
        return m >= 1

    return LadderResult(
        laddered=laddered_mask,
        working_vs_black=working_mask(jnp.int32(B.BLACK)),
        working_vs_white=working_mask(jnp.int32(B.WHITE)),
    )
