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
    merged_label = jnp.asarray(m, labels.dtype)
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


def _pack2(stones, width):
    """int32[NN] stones (values 0-2) -> uint32[width] 2-bit packed."""
    nn = stones.shape[0]
    v = jnp.pad(stones.astype(jnp.uint32), (0, width * 16 - nn))
    sh = jnp.arange(16, dtype=jnp.uint32) * 2
    # disjoint bit positions: sum == bitwise or
    return jnp.sum(v.reshape(width, 16) << sh, axis=1, dtype=jnp.uint32)


def _unpack2(words, nn):
    """uint32[W] -> int32[NN] stones."""
    sh = jnp.arange(16, dtype=jnp.uint32) * 2
    v = (words[:, None] >> sh) & jnp.uint32(3)
    return v.reshape(-1)[:nn].astype(jnp.int32)


def _row_read(stack, lvl):
    """stack[lvl] via a one-hot reduction over the level axis. Batched
    dynamic_index with per-lane levels lowers to a serialized gather on
    TPU (measured ~210ms/iteration for the whole body at 19x19 lane
    widths); the one-hot form is pure vector work."""
    d = stack.shape[0]
    oh = (jnp.arange(d, dtype=jnp.int32) == lvl)
    ohb = oh.reshape((d,) + (1,) * (stack.ndim - 1))
    return jnp.sum(jnp.where(ohb, stack, jnp.zeros_like(stack)), axis=0,
                   dtype=stack.dtype)


def _row_write(stack, lvl, row, pred):
    """stack with stack[lvl] <- row where pred (one-hot select form)."""
    d = stack.shape[0]
    oh = (jnp.arange(d, dtype=jnp.int32) == lvl) & pred
    ohb = oh.reshape((d,) + (1,) * (stack.ndim - 1))
    return jnp.where(ohb, jnp.broadcast_to(row, stack.shape), stack)


class _Stk(NamedTuple):
    """Explicit-stack state of one ladder search lane
    (Board::searchIsLadderCaptured's stack machine, board.cpp:1628-1851,
    as a branchless lax.while_loop).

    The stack stores only the 2-bit-packed pre-move BOARD per level
    (uint32[D, ceil(NN/16)]): labels are maintained incrementally through
    pushes by _move_effects and recomputed by the _stone_labels fixpoint
    on restore. Storing label rows (int16[D, NN]) or unpacked boards
    makes the while carry ~25x larger and the per-iteration one-hot
    writes HBM-bound."""
    stones: jax.Array      # int32[NN] current board
    labels: jax.Array      # int32[NN] exact stone-chain labels
    libs: jax.Array        # int32[NN] per-chain liberty counts
    ko: jax.Array          # int32 simple-ko point or -1
    stk_stones: jax.Array  # uint32[D, W] packed pre-move board per level
    stk_ko: jax.Array      # int32[D]
    stk_moves: jax.Array   # int32[D, M] candidate moves per level
    stk_len: jax.Array     # int32[D]
    stk_cur: jax.Array     # int32[D]; -1 = level not yet expanded
    idx: jax.Array         # int32 stack level; -1 = returned from root
    ret: jax.Array         # bool value being returned
    from_deeper: jax.Array  # bool: board must be restored on re-entry
    nodes: jax.Array       # int32 moves played (node budget)
    iters: jax.Array       # int32 loop iterations (hard wall-clock cap)


def _search_captured(stones0, labels0, libs0, ko0, rep, defender, active,
                     size: int, depth: int, num_caps: int, budget: int,
                     max_iters: int | None = None):
    """Is the defender chain at `rep` ladder-captured, defender to move?

    The reference's exact backtracking search (searchIsLadderCaptured with
    defenderFirst=true, board.cpp:1628-1851): the defender branches over
    liberty-gaining captures + the lone-liberty extension, the attacker
    over the chain's two liberties; the defender wins on >=2 liberties at
    its turn, any simple ko left by the attacker, or a provable escape;
    the attacker wins on <=1 liberty, the double-ko-death pattern, or
    depth exhaustion (the reference's stack-limit bias); node-budget
    exhaustion means not-captured. Implemented as one lax.while_loop over
    an explicit stack of (packed board, ko, move-list) levels so a whole
    batch of lanes runs in lockstep vector ops. max_iters hard-caps loop
    iterations (exhaustion counts as not-captured, like the node budget);
    it bounds device wall-clock when this runs inside a jitted search.
    """
    nn = size * size
    width = (nn + 15) // 16
    attacker = B.opponent(defender)
    m_moves = num_caps + 1
    if max_iters is None:
        max_iters = 4 * budget + 64

    init = _Stk(
        stones=stones0, labels=labels0, libs=libs0, ko=ko0,
        stk_stones=jnp.zeros((depth, width), jnp.uint32),
        stk_ko=jnp.zeros((depth,), jnp.int32),
        stk_moves=jnp.zeros((depth, m_moves), jnp.int32),
        stk_len=jnp.zeros((depth,), jnp.int32),
        stk_cur=jnp.full((depth,), -1, jnp.int32),
        idx=jnp.int32(0), ret=jnp.bool_(False),
        from_deeper=jnp.bool_(False), nodes=jnp.int32(0),
        iters=jnp.int32(0))

    def cond(s: _Stk):
        return (s.idx >= 0) & (s.nodes < budget) & (s.iters < max_iters)

    def body(s: _Stk) -> _Stk:
        lvl = jnp.clip(s.idx, 0, depth - 1)
        is_def = (s.idx % 2) == 0
        mover = jnp.where(is_def, defender, attacker)
        cur = _row_read(s.stk_cur, lvl)
        entering = cur == -1

        # ---- re-entry: restore the pre-move board of this level --------
        # labels are NOT stored per level: feed the restored board (or an
        # empty board for lanes not restoring, which converges in one
        # round) back through the _stone_labels fixpoint
        restore = ~entering & s.from_deeper
        rst_stones = _unpack2(_row_read(s.stk_stones, lvl), nn)
        stones = jnp.where(restore, rst_stones, s.stones)
        rst_labels = _stone_labels(jnp.where(restore, rst_stones, 0), size)
        labels = jnp.where(restore, rst_labels, s.labels)
        ko = jnp.where(restore, _row_read(s.stk_ko, lvl), s.ko)
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
        stk_moves = _row_write(s.stk_moves, lvl, moves, gen)
        old_len = _row_read(s.stk_len, lvl)
        stk_len = _row_write(s.stk_len, lvl, n_moves, gen)
        cur2 = jnp.where(gen, 0, cur)

        # ---- re-entry: child returned (or same-level illegal move) ------
        child_cut = ~entering & ((is_def & ~s.ret) | (~is_def & s.ret))
        cur2 = jnp.where(~entering & ~child_cut, cur2 + 1, cur2)

        # ---- list exhausted -> lose for the side to move ----------------
        llen = jnp.where(gen, n_moves, old_len)
        exhausted = ~base & ~child_cut & (cur2 >= llen)

        popping = base | child_cut | exhausted
        ret_out = jnp.where(base, base_ret,
                            jnp.where(child_cut, s.ret, is_def))

        # ---- try the next move ------------------------------------------
        trying = ~popping
        move_row = jnp.where(gen, moves, _row_read(s.stk_moves, lvl))
        move = _row_read(move_row, jnp.clip(cur2, 0, m_moves - 1))
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

        # push: save this level's pre-move board (packed), apply the move
        stk_stones = _row_write(s.stk_stones, lvl, _pack2(stones, width),
                                push)
        stk_ko = _row_write(s.stk_ko, lvl, ko, push)

        new_stones = jnp.where(push, eff.new_stones, stones)
        new_labels = jnp.where(push, eff.new_labels, labels)
        new_libs = jnp.where(push,
                             B.chain_liberties(eff.new_stones,
                                               eff.new_labels, size),
                             libs)
        new_ko = jnp.where(push, eff.ko_loc, ko)

        # write back cur for this level; reset the child level's cur
        stk_cur = _row_write(s.stk_cur, lvl, cur2, jnp.bool_(True))
        child = jnp.clip(lvl + 1, 0, depth - 1)
        stk_cur = _row_write(stk_cur, child, jnp.int32(-1), push)

        new_idx = jnp.where(popping, s.idx - 1,
                            jnp.where(push, s.idx + 1, s.idx))
        new_ret = jnp.where(popping, ret_out,
                            jnp.where(push, s.ret, ret_stay))
        new_from_deeper = popping  # pushes/illegal stays don't need restore

        return _Stk(stones=new_stones, labels=new_labels, libs=new_libs,
                    ko=new_ko, stk_stones=stk_stones,
                    stk_ko=stk_ko, stk_moves=stk_moves, stk_len=stk_len,
                    stk_cur=stk_cur, idx=new_idx, ret=new_ret,
                    from_deeper=new_from_deeper,
                    nodes=s.nodes + push.astype(jnp.int32),
                    iters=s.iters + 1)

    init = init._replace(idx=jnp.where(active, 0, -1))
    out = jax.lax.while_loop(cond, body, init)
    # a completed search popped below the root (idx < 0); anything else
    # stopped on node-budget / iteration-cap exhaustion -> assume not
    # captured (board.cpp:1680-1688). Gating on idx rather than comparing
    # the counters to their limits keeps a search that legitimately
    # finishes on exactly the cap-th iteration counted as completed.
    return out.ret & (out.idx < 0) & active


def _run_sim(stones0, labels0, libs0, rep, defender, premove, active,
             size: int, depth: int, num_caps: int = 4,
             budget: int = 25000, max_iters: int | None = None):
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
                            active & pre_ok, size, depth, num_caps, budget,
                            max_iters)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 7))
def ladder_map(stones: jax.Array, size: int, max_chains: int | None = None,
               max_depth: int | None = None, num_caps: int = 4,
               budget: int = 25000,
               ko_loc: jax.Array | int = -1,
               max_iters: int | None = None) -> LadderResult:
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
                                    max_depth, num_caps, budget, max_iters)
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


# ---------------------------------------------------------------------------
# Chase solver: the per-leaf, in-search variant.
# ---------------------------------------------------------------------------
#
# The backtracking solver above is exact but its lockstep while_loop costs
# O(node-count) iterations of heavy bodies — fine amortized once per move
# (root featurization, training-data writing) but ~two orders of magnitude
# over budget when every playout's leaf evaluation re-featurizes (the
# reference pays iterLadders per NN query too, nninputs.cpp:815, but a
# scalar CPU pays ~us where a lockstep vector lane batch pays ms).
#
# The chase is the TPU answer for the hot path: a FORWARD-ONLY greedy
# ladder chase (no stacks, no undo) whose board mechanics are exact —
# labels are maintained incrementally by `_chase_apply`, and chain liberty
# counts live in a head-indexed array `hlibs` where every read is at a
# scalar point (one-hot reductions; no [NN^2] histograms, no chain-wide
# spreads). Only the SEARCH POLICY is approximate versus the reference
# backtracking search:
#   - the defender commits greedily to the candidate (liberty-gaining
#     captures, then the extension — the reference's move order,
#     board.cpp:1717-1719) with the best statically-estimated liberty
#     count instead of trying each in turn;
#   - the attacker refutes its two liberty moves with a 2-ply static
#     lookahead and commits to the surviving one (both surviving — a
#     genuinely branching double ladder — picks the tighter side);
#   - defender capture candidates are capped at _K_ADJ adjacent chains
#     and bookkeeping bails (as "escaped") past _C_CAP captured stones.
# On clean ladders and standard broken-ladder shapes the chase and the
# backtracking search agree exactly (tests/test_ladder.py cross-checks);
# divergence is confined to branchy multi-ladder positions.


_K_ADJ = 3   # defender capture candidates examined per ply
_C_CAP = 4   # captured stones tracked exactly per move


class _ChaseState(NamedTuple):
    stones: jax.Array    # int32[NN]
    labels: jax.Array    # int32[NN] exact min-index stone-chain labels
    hlibs: jax.Array     # int32[NN]: exact chain liberty count at each
    #                      chain's head (label) index; garbage elsewhere
    ko: jax.Array        # int32: simple-ko ban left by the LAST move
    done: jax.Array      # bool
    captured: jax.Array  # bool (valid when done)
    ply: jax.Array       # int32; even = defender to move


def _onehot_nn(loc, nn):
    return jnp.arange(nn, dtype=jnp.int32) == loc


def _chase_apply(stones, labels, hlibs, m, player, size):
    """Play `player` at scalar point m, maintaining labels and the
    head-indexed liberty counts exactly (the incremental equivalent of
    Board::playMoveAssumeLegal's linked-list surgery, board.cpp, with
    liberty counts updated by the move's exact local effects: adjacent
    chains lose the point m, chains bordering captured stones gain those
    points, the mover's merged chain is recounted from its mask)."""
    nn = size * size
    # state dtypes are narrowed (stones i8, labels/hlibs i16) — the chase
    # while_loop is HBM-bandwidth-bound over [lanes, NN] state at search
    # widths, so element width is wall-clock
    idx = jnp.arange(nn, dtype=labels.dtype)
    player = jnp.asarray(player, stones.dtype)
    opp = B.opponent(player).astype(stones.dtype)
    s_sh = _shift4(stones, size, B.WALL)
    l_sh = _shift4(labels, size, jnp.asarray(nn, labels.dtype))
    nbr_s = jnp.stack([_extract(s_sh[d], m) for d in range(4)])
    nbr_l = jnp.stack([_extract(l_sh[d], m) for d in range(4)])
    nbr_libs = jnp.stack([_extract(hlibs, jnp.clip(nbr_l[d], 0, nn - 1))
                          for d in range(4)])
    nbr_stone = (nbr_s == B.BLACK) | (nbr_s == B.WHITE)
    own_sel = nbr_s == player
    cap_sel = (nbr_s == opp) & (nbr_libs == 1)

    own_mask = jnp.zeros((nn,), bool)
    cap_mask = jnp.zeros((nn,), bool)
    merged_label = jnp.asarray(m, labels.dtype)
    for i in range(4):
        own_mask = own_mask | (own_sel[i] & (labels == nbr_l[i]))
        cap_mask = cap_mask | (cap_sel[i] & (labels == nbr_l[i]))
        merged_label = jnp.minimum(merged_label,
                                   jnp.where(own_sel[i], nbr_l[i], m))
    own_mask = own_mask & (stones == player)
    cap_mask = cap_mask & (stones == opp)

    target_empty = _extract(stones, m) == B.EMPTY
    at_m = idx == m
    new_stones = jnp.where(at_m, player,
                           jnp.where(cap_mask,
                                     jnp.asarray(B.EMPTY, stones.dtype),
                                     stones))
    my_mask = own_mask | at_m
    new_labels = jnp.where(my_mask, merged_label,
                           jnp.where(cap_mask, idx, labels))
    adj = _dilate(my_mask, size)
    my_libs = jnp.sum(((new_stones == B.EMPTY) & adj).astype(jnp.int32))
    num_captured = jnp.sum(cap_mask.astype(jnp.int32))

    # ---- head-liberty maintenance ------------------------------------
    h = hlibs
    # (a) surviving chains adjacent to m lose the liberty m (dedup the
    # directions; merged own chains and captured chains are rewritten or
    # garbage below)
    for i in range(4):
        dup = jnp.bool_(False)
        for j in range(i):
            dup = dup | ((nbr_l[j] == nbr_l[i]) & nbr_stone[j])
        sel = nbr_stone[i] & ~dup & ~own_sel[i] & ~cap_sel[i]
        h = h - jnp.where(sel & (idx == nbr_l[i]), 1, 0).astype(h.dtype)
    # (b) chains bordering captured points gain those liberties (exact up
    # to _C_CAP captured stones; the caller bails the lane past that)
    cap_pts = _lowest_k(cap_mask, _C_CAP, nn)
    nl_sh = _shift4(new_labels, size, jnp.asarray(nn, labels.dtype))
    ns_sh = _shift4(new_stones, size, B.WALL)
    for t in range(_C_CAP):
        c = jnp.clip(cap_pts[t], 0, nn - 1)
        cvalid = cap_pts[t] < nn
        cl = jnp.stack([_extract(nl_sh[d], c) for d in range(4)])
        cs = jnp.stack([_extract(ns_sh[d], c) for d in range(4)])
        cstone = (cs == B.BLACK) | (cs == B.WHITE)
        for i in range(4):
            dup = jnp.bool_(False)
            for j in range(i):
                dup = dup | ((cl[j] == cl[i]) & cstone[j])
            sel = (cvalid & cstone[i] & ~dup & (cl[i] != merged_label))
            h = h + jnp.where(sel & (idx == cl[i]), 1, 0).astype(h.dtype)
    # (c) the mover's merged chain, recounted exactly from its mask
    h = jnp.where(idx == merged_label, my_libs.astype(h.dtype), h)

    own_any = jnp.any(own_sel)
    is_ko = (num_captured == 1) & ~own_any & (my_libs == 1)
    ko_loc = jnp.where(is_ko, jnp.argmax(cap_mask).astype(jnp.int32),
                       jnp.int32(-1))
    legal = target_empty & (my_libs > 0)
    overflow = num_captured > _C_CAP
    return new_stones, new_labels, h, ko_loc, legal, overflow


def _chase_one(stones0, labels0, hlibs0, rep, defender, premove, active,
               size: int, max_steps: int):
    """One greedy chase lane: optional attacker premove, then alternating
    defender/attacker plies until a terminal state or the step cap
    (exhaustion counts as not-captured, like the node budget)."""
    nn = size * size
    # narrow the lane state (module comment in _chase_apply): stones i8,
    # labels/hlibs i16 — exact for NN < 2^15
    stones0 = stones0.astype(jnp.int8)
    labels0 = labels0.astype(jnp.int16)
    hlibs0 = hlibs0.astype(jnp.int16)
    defender = jnp.asarray(defender, jnp.int8)
    attacker = B.opponent(defender).astype(jnp.int8)

    has_pre = premove >= 0
    ps, pl, ph, _, plegal, pov = _chase_apply(
        stones0, labels0, hlibs0, jnp.clip(premove, 0, nn - 1), attacker,
        size)
    stones1 = jnp.where(has_pre, ps, stones0)
    labels1 = jnp.where(has_pre, pl, labels0)
    hlibs1 = jnp.where(has_pre, ph, hlibs0)
    live = active & (~has_pre | (plegal & ~pov))

    init = _ChaseState(
        stones=stones1, labels=labels1, hlibs=hlibs1,
        ko=jnp.int32(-1),                 # defender wins kos at the root
        done=~live, captured=jnp.bool_(False), ply=jnp.int32(0))

    def cond(s: _ChaseState):
        return ~s.done & (s.ply < max_steps)

    def _entry(s: _ChaseState):
        """Per-ply-entry context of the defender chain at rep."""
        empty = s.stones == B.EMPTY
        lrep = _extract(s.labels, rep)
        gone = _extract(s.stones, rep) != defender
        def_mask = (s.labels == lrep) & (s.stones == defender)
        dlibs = jnp.where(gone, 0, _extract(s.hlibs, lrep))
        libpts = empty & _dilate(def_mask, size)
        return empty, gone, def_mask, dlibs, libpts

    def body(s: _ChaseState) -> _ChaseState:
        # Two plies per iteration, each specialized to its mover: the
        # single-ply form computed BOTH the defender-candidate machinery
        # and the attacker-refute machinery every ply and selected one —
        # splitting them cuts ~40% of the loop's VPU work and halves the
        # carry churn.

        # =============== defender ply ===============
        empty, gone, def_mask, dlibs, libpts = _entry(s)
        term_cap = gone
        term_esc = ~gone & ((s.ko >= 0) | (dlibs >= 2))

        # extension at the lone liberty (exactly one when dlibs == 1)
        ext = jnp.argmax(libpts).astype(jnp.int32)
        ext_oh = _onehot_nn(ext, nn)
        est_ext = jnp.sum(((empty & ~ext_oh)
                           & _dilate(def_mask | ext_oh, size))
                          .astype(jnp.int32))
        best_est = jnp.where(jnp.any(libpts), est_ext, -1)
        best_move = ext
        # liberty-gaining captures: up to _K_ADJ adjacent attacker
        # chains in atari; their lone liberty is the capture move
        # (findLibertyGainingCaptures, board.cpp:1522). Captures are
        # preferred on ties (the reference explores them first).
        rem = (s.stones == attacker) & _dilate(def_mask, size)
        for _t in range(_K_ADJ):
            p = jnp.argmax(rem).astype(jnp.int32)
            any_rem = jnp.any(rem)
            lp = _extract(s.labels, p)
            chain_t = (s.labels == lp) & (s.stones == attacker)
            atari = _extract(s.hlibs, lp) == 1
            lone = empty & _dilate(chain_t, size)
            ci = jnp.argmax(lone).astype(jnp.int32)
            ci_oh = _onehot_nn(ci, nn)
            valid_t = any_rem & atari & jnp.any(lone) & (ci != s.ko)
            joins = jnp.sum((_dilate(def_mask, size) & ci_oh)
                            .astype(jnp.int32)) > 0
            defm_t = def_mask | (ci_oh & joins)
            est_t = jnp.sum((((empty | chain_t) & ~ci_oh)
                             & _dilate(defm_t, size)).astype(jnp.int32))
            better = valid_t & (est_t >= best_est)
            best_est = jnp.where(better, est_t, best_est)
            best_move = jnp.where(better, ci, best_move)
            rem = rem & ~chain_t
        def_move = best_move
        def_has = best_est >= 0

        ns, nl, nh, nko, legal, ov = _chase_apply(
            s.stones, s.labels, s.hlibs, def_move, defender, size)
        new_cap = term_cap | (~def_has | ~legal)
        new_esc = term_esc | (~new_cap & ov)
        terminal = (new_cap | new_esc) & ~s.done
        advance = ~terminal & ~s.done
        s = _ChaseState(
            stones=jnp.where(advance, ns, s.stones),
            labels=jnp.where(advance, nl, s.labels),
            hlibs=jnp.where(advance, nh, s.hlibs),
            ko=jnp.where(advance, nko, s.ko),
            done=s.done | terminal,
            captured=jnp.where(terminal, new_cap, s.captured),
            ply=s.ply + 1)

        # =============== attacker ply ===============
        # suppressed when the ply cap lands mid-pair, so max_steps keeps
        # exact exhaustion semantics
        at_cap = s.ply >= max_steps
        empty, gone, def_mask, dlibs, libpts = _entry(s)
        term_cap = gone | (dlibs <= 1)
        term_esc = ~gone & (dlibs >= 3)

        l2 = _lowest_k(libpts, 2, nn)
        att_sh = _shift4(s.stones, size, B.WALL)
        atl_sh = _shift4(s.labels, size, jnp.asarray(nn, s.labels.dtype))

        def refute(li_raw, lo_raw):
            li = jnp.clip(li_raw, 0, nn - 1)
            lo = jnp.clip(lo_raw, 0, nn - 1)
            valid = (li_raw < nn) & (li_raw != s.ko)
            # attacker stone at li merges its adjacent attacker chains
            als = jnp.stack([_extract(att_sh[d], li) for d in range(4)])
            all_ = jnp.stack([_extract(atl_sh[d], li) for d in range(4)])
            li_oh = _onehot_nn(li, nn)
            amask = li_oh
            for i in range(4):
                amask = amask | ((als[i] == attacker)
                                 & (s.labels == all_[i]))
            amask = amask & ((s.stones == attacker) | li_oh)
            a_libs = jnp.sum(((empty & ~li_oh) & _dilate(amask, size))
                             .astype(jnp.int32))
            legal_est = a_libs >= 1
            # 2-ply: defender extends at the other liberty
            lo_oh = _onehot_nn(lo, nn)
            est_ext2 = jnp.sum(((empty & ~li_oh & ~lo_oh)
                                & _dilate(def_mask | lo_oh, size))
                               .astype(jnp.int32))
            # ... or captures the attacker's self-atari'd chain
            lone_a = (empty & ~li_oh) & _dilate(amask, size)
            ca = jnp.argmax(lone_a).astype(jnp.int32)
            ca_oh = _onehot_nn(ca, nn)
            joins_a = jnp.sum((_dilate(def_mask, size) & ca_oh)
                              .astype(jnp.int32)) > 0
            est_cap2 = jnp.sum((((empty | amask) & ~li_oh & ~ca_oh)
                                & _dilate(def_mask | (ca_oh & joins_a),
                                          size)).astype(jnp.int32))
            est_def = jnp.maximum(est_ext2,
                                  jnp.where(a_libs == 1, est_cap2, 0))
            return (~valid) | (~legal_est) | (est_def >= 3), est_def

        r0, e0 = refute(l2[0], l2[1])
        r1, e1 = refute(l2[1], l2[0])
        both_ref = r0 & r1
        pick1 = (~r1) & (r0 | (e1 < e0))
        att_move = jnp.where(pick1, l2[1], l2[0]).astype(jnp.int32)
        att_move = jnp.clip(att_move, 0, nn - 1)

        # double-ko death (board.cpp:1746-1756), scalar form at l0/l1:
        # both liberties 0-immediate-liberty ko mouths and no defender
        # captures available
        imm = _empty_neighbor_count(s.stones, size)
        kocap = _would_be_ko_capture_at(s.stones, s.labels, s.hlibs, size,
                                        defender, l2, att_sh, atl_sh)
        lib0 = jnp.clip(l2[0], 0, nn - 1)
        lib1 = jnp.clip(l2[1], 0, nn - 1)
        both_libs = (l2[0] < nn) & (l2[1] < nn)
        double_ko = (both_libs & (_extract(imm, lib0) == 0)
                     & (_extract(imm, lib1) == 0) & kocap[0] & kocap[1])

        ns, nl, nh, nko, legal, ov = _chase_apply(
            s.stones, s.labels, s.hlibs, att_move, attacker, size)
        new_cap = term_cap
        new_esc = term_esc | (~term_cap & (both_ref | ov))
        new_cap = new_cap | (~new_esc & double_ko & ~term_esc)
        terminal = (new_cap | new_esc) & ~s.done & ~at_cap
        advance = ~terminal & ~s.done & ~at_cap
        return _ChaseState(
            stones=jnp.where(advance, ns, s.stones),
            labels=jnp.where(advance, nl, s.labels),
            hlibs=jnp.where(advance, nh, s.hlibs),
            ko=jnp.where(advance, nko, s.ko),
            done=s.done | terminal,
            captured=jnp.where(terminal, new_cap, s.captured),
            ply=s.ply + 1)

    out = jax.lax.while_loop(cond, body, init)
    return out.captured & out.done & active


def _would_be_ko_capture_at(stones, labels, hlibs, size, defender, l2,
                            s_sh, l_sh):
    """wouldBeKoCapture(loc, attacker) (board.cpp:518-545) evaluated only
    at the two scalar liberty points: all 4 neighbors defender-or-wall and
    exactly one adjacent single-stone defender chain in atari."""
    nn = size * size
    outs = []
    for t in range(2):
        loc = jnp.clip(l2[t], 0, nn - 1)
        ns = jnp.stack([_extract(s_sh[d], loc) for d in range(4)])
        nl = jnp.stack([_extract(l_sh[d], loc) for d in range(4)])
        all_def = jnp.all((ns == defender) | (ns == B.WALL))
        cap_cnt = jnp.int32(0)
        single_cnt = jnp.int32(0)
        for i in range(4):
            dup = jnp.bool_(False)
            for j in range(i):
                dup = dup | (nl[j] == nl[i]) & (ns[j] == defender)
            isdef = (ns[i] == defender) & ~dup
            in_atari = _extract(hlibs, jnp.clip(nl[i], 0, nn - 1)) == 1
            chain_sz = jnp.sum(((labels == nl[i])
                                & (stones == defender)).astype(jnp.int32))
            cap_cnt = cap_cnt + jnp.where(isdef & in_atari, 1, 0)
            single_cnt = single_cnt + jnp.where(
                isdef & in_atari & (chain_sz == 1), 1, 0)
        outs.append((l2[t] < nn) & all_def & (cap_cnt == 1)
                    & (single_cnt == 1))
    return outs


def _chase_setup(stones, size: int, max_chains: int, ko):
    """Per-game lane construction shared by the vmapped-XLA and Pallas
    chase drivers: identify low-liberty chains and build the (rep,
    defender, premove, active) query lanes (2 per chain). Returns a dict
    of lane arrays plus the marking context `_chase_finish` needs."""
    nn = size * size
    labels = _stone_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    occupied = (stones == B.BLACK) | (stones == B.WHITE)
    idx = jnp.arange(nn, dtype=jnp.int32)
    is_head = occupied & (labels == idx) & (libs >= 1) & (libs <= 2)
    heads = _lowest_k(is_head, max_chains, nn)                 # [K]
    head_ok = heads < nn
    h = jnp.minimum(heads, nn - 1)
    hdef = L.gather_1d(stones, h)
    hlibcnt = L.gather_1d(libs, h)

    def two_libs(rep):
        pts = _chain_lib_points(stones, labels, rep, size)
        return _lowest_k(pts, 2, nn)

    libpts = jax.vmap(two_libs)(h)                             # [K, 2]

    k = max_chains
    ko = jnp.asarray(ko, jnp.int32)
    # two lanes per chain: lane A = defender-first (1 lib) or
    # attacker-first at liberty 0 (2 libs); lane B = attacker-first at
    # liberty 1 (2 libs only)
    reps = jnp.concatenate([h, h])
    defenders = jnp.concatenate([hdef, hdef])
    pre_a = jnp.where(hlibcnt == 2,
                      jnp.where(libpts[:, 0] < nn, libpts[:, 0], -1),
                      jnp.full((k,), -1, jnp.int32))
    pre_b = jnp.where(libpts[:, 1] < nn, libpts[:, 1], -1)
    premoves = jnp.concatenate([pre_a, pre_b])
    act_a = head_ok & ((hlibcnt == 1)
                       | ((hlibcnt == 2) & (libpts[:, 0] < nn)
                          & (libpts[:, 0] != ko)))
    act_b = head_ok & (hlibcnt == 2) & (libpts[:, 1] < nn) \
        & (libpts[:, 1] != ko)
    active = jnp.concatenate([act_a, act_b])
    return dict(labels=labels, libs=libs, occupied=occupied,
                h=h, head_ok=head_ok, hdef=hdef, hlibcnt=hlibcnt,
                libpts=libpts, reps=reps, defenders=defenders,
                premoves=premoves, active=active)


def _chase_finish(ctx, results, size: int, max_chains: int) -> LadderResult:
    """Mark laddered chains / working attacker moves from lane verdicts."""
    nn = size * size
    k = max_chains
    labels, occupied = ctx["labels"], ctx["occupied"]
    h, head_ok = ctx["h"], ctx["head_ok"]
    hdef, hlibcnt, libpts = ctx["hdef"], ctx["hlibcnt"], ctx["libpts"]
    lad_a, lad_b = results[:k], results[k:]
    chain_laddered = lad_a | lad_b

    mark = L.bincount_sum(jnp.where(head_ok & chain_laddered, h, -1), nn,
                          dtype=jnp.int32)
    laddered_mask = (L.gather_1d(mark, labels) >= 1) & occupied

    def working_mask(color):
        sel_a = head_ok & lad_a & (hdef == color) & (hlibcnt == 2)
        sel_b = head_ok & lad_b & (hdef == color)
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


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def ladder_map_chase(stones: jax.Array, size: int,
                     max_chains: int = 16, max_steps: int | None = None,
                     ko_loc: jax.Array | int = -1) -> LadderResult:
    """Chase-solver ladder planes for one board (the in-search variant).

    Same interface and result semantics as `ladder_map`; see the module
    section comment for the policy approximations. max_chains bounds the
    low-liberty chains analyzed per board (lowest flat index first;
    overflow chains are marked not-laddered) — in-search featurization
    wants this small, the action concentrates in few chains. max_steps
    bounds chase plies (default covers a corner-to-corner ladder at ~4
    plies per diagonal cell; exhaustion counts as not-captured)."""
    nn = size * size
    if max_steps is None:
        # a corner-to-corner ladder consumes ~4 plies per diagonal cell
        max_steps = 4 * size + 14
    ctx = _chase_setup(stones, size, max_chains, ko_loc)
    labels, libs = ctx["labels"], ctx["libs"]

    results = jax.vmap(
        lambda r, d, p, a: _chase_one(stones, labels, libs, r, d, p, a,
                                      size, max_steps)
    )(ctx["reps"], ctx["defenders"], ctx["premoves"],
      ctx["active"])                                           # [2K] bool
    return _chase_finish(ctx, results, size, max_chains)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 5))
def ladder_map_chase_batch(stones: jax.Array, size: int,
                           max_chains: int = 16,
                           max_steps: int | None = None,
                           ko_loc: jax.Array | None = None,
                           force_pallas: bool = False) -> LadderResult:
    """Batched chase-solver ladder planes for [G, NN] boards.

    Semantically identical to `jax.vmap(ladder_map_chase)` but the chase
    loops run in ONE Pallas kernel over all G x 2*max_chains lanes
    (ops/chase_pallas.py) — on-core state, no per-op dispatch, and
    per-128-lane-block early exit instead of the global any-lane-alive
    loop bound. The search evaluator calls this once per leaf batch
    (search/mcts.py make_nn_evaluator).

    Off-TPU this delegates to the vmapped XLA chase (the Pallas
    interpreter is orders of magnitude slower than compiled XLA on CPU);
    force_pallas=True runs the interpreted kernel anyway — the
    equality tests (tests/test_chase_pallas.py) use it."""
    g, nn = stones.shape
    if max_steps is None:
        max_steps = 4 * size + 14
    if ko_loc is None:
        ko_loc = jnp.full((g,), -1, jnp.int32)
    interpret = jax.default_backend() != "tpu"
    if interpret and not force_pallas:
        return jax.vmap(
            lambda s, k_: ladder_map_chase(s, size, max_chains, max_steps,
                                           k_))(stones, ko_loc)
    ctx = jax.vmap(
        lambda s, k_: _chase_setup(s, size, max_chains, k_))(stones, ko_loc)
    k2 = 2 * max_chains

    from katago_tpu.ops import chase_pallas as CP
    rep_l = ctx["reps"].reshape(-1)
    def_l = ctx["defenders"].reshape(-1)
    pre_l = ctx["premoves"].reshape(-1)
    act_l = ctx["active"].reshape(-1)
    stones_l = jnp.repeat(stones.astype(jnp.int32), k2, axis=0)
    labels_l = jnp.repeat(ctx["labels"], k2, axis=0)
    libs_l = jnp.repeat(ctx["libs"], k2, axis=0)
    cap = CP.chase_lanes(stones_l, labels_l, libs_l, rep_l, def_l, pre_l,
                         act_l, size=size, max_steps=max_steps,
                         interpret=interpret)
    results = cap.reshape(g, k2)
    return jax.vmap(
        lambda c, r: _chase_finish(c, r, size, max_chains))(ctx, results)
