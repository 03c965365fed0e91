"""Pallas TPU kernel for the greedy chase-ladder solver.

The chase solver (game/ladder.py `_chase_one`) is the dominant non-NN cost
of every search playout: as a vmapped `lax.while_loop` it lowers to ~170
small XLA ops per two-ply iteration, and with ~4096 lanes (128 games x 32
query lanes) the any-lane-alive loop condition makes nearly every search
batch pay the longest ladder's trip count — measured ~15.6 ms/sim of the
49 ms search step at the production 19x19 config, almost entirely per-op
dispatch overhead rather than arithmetic.

This kernel runs the IDENTICAL chase algorithm (same candidate policy,
same terminal rules — see the module comment of game/ladder.py) as one
`pallas_call`:

  * layout: board state is [NNP, LB] — board points on sublanes (NN
    padded to a multiple of 32), LB=128 lanes on the lane dimension, so
    every per-lane op vectorizes across the 8x128 VPU;
  * the whole chase loop runs on-core: state lives in vector registers /
    VMEM for the entire solve, with no HBM round-trips between plies and
    no per-op dispatch;
  * the grid partitions lanes into independent blocks of LB; each block's
    `while_loop` exits as soon as ITS 128 lanes are done, so one long
    ladder on the board no longer stalls every other game's solve (the
    XLA version's global `jnp.any` condition).

Neighbor access uses circular sublane rolls (`pltpu.roll`) with
coordinate masks instead of the pad+slice shifts of board.shift4; scalar
board reads (`stones[loc]` per lane) become one-hot compare+reduce over
the sublane axis, the same trick as ladder.py `_extract` but batched
across the lane dimension.

Reference: Board::searchIsLadderCaptured (board.cpp:1628) for the search
semantics being approximated; game/ladder.py for the exact greedy policy
this must reproduce bit-for-bit (tests/test_chase_pallas.py asserts
equality with the vmapped XLA implementation on random boards).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from katago_tpu.game import board as B

LB = 128          # lanes per grid block (the TPU lane-dim width)
_BIG = 1 << 20  # python int: jnp constants would be captured consts in the kernel
_K_ADJ = 3        # defender capture candidates per ply (ladder.py)
_C_CAP = 4        # captured stones tracked exactly per move

# shift4 direction order (board.py:109): value at p+size, p-size, p+1, p-1
_DELTAS = (None,)  # placeholder; real deltas depend on size at trace time


def _kernel_body(stones_ref, labels_ref, hlibs_ref, rep_ref, def_ref,
                 pre_ref, act_ref, out_ref, *, size: int, nnp: int,
                 max_steps: int):
    nn = size * size
    deltas = (size, -size, 1, -1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (nnp, LB), 0)
    yrow = iota // size
    xcol = iota - yrow * size
    valid = iota < nn
    WALL = jnp.int32(B.WALL)
    EMPTY = jnp.int32(B.EMPTY)

    def bad_mask(delta, y, x):
        if delta == size:
            return y == size - 1
        if delta == -size:
            return y == 0
        if delta == 1:
            return x == size - 1
        return x == 0

    def nbr(arr, delta, fill):
        """[nnp, LB] -> value at p+delta per point, `fill` off-board.
        Bool masks roll and select as int32 — Mosaic has no i1 vector
        rotate and rejects i1-select truncations."""
        isbool = arr.dtype == jnp.bool_
        a = arr.astype(jnp.int32) if isbool else arr
        r = pltpu.roll(a, (-delta) % nnp, axis=0)
        bad = bad_mask(delta, yrow, xcol) | ~valid
        if isbool:
            assert fill is False
            return jnp.where(bad, 0, r) != 0
        return jnp.where(bad, fill, r)

    def dilate(m):
        out = jnp.zeros_like(m)
        for d in deltas:
            out = out | nbr(m, d, False)
        return out & valid

    def val_at(arr, loc):
        """arr[loc] per lane: [nnp,LB], [1,LB] -> [1,LB]."""
        return jnp.sum(jnp.where(iota == loc, arr, 0), axis=0,
                       keepdims=True)

    def first_set(m):
        """Lowest set sublane index per lane (argmax-of-bool), 0 if none,
        plus an any() flag — matches jnp.argmax on bool."""
        fs = jnp.min(jnp.where(m, iota, _BIG), axis=0, keepdims=True)
        anym = fs < _BIG
        return jnp.where(anym, fs, 0), anym

    def lowest2_or_nn(m):
        """_lowest_k(m, 2, nn): two lowest set indices, nn when unset."""
        f0, a0 = first_set(m)
        l0 = jnp.where(a0, f0, nn)
        m2 = m & (iota != l0)
        f1, a1 = first_set(m2)
        l1 = jnp.where(a1, f1, nn)
        return l0, l1

    def coords(loc):
        ly = loc // size
        lx = loc - ly * size
        return ly, lx

    def nbrs_at(arr, loc, fill):
        """Values of arr at loc's 4 neighbors ([1,LB] each), fill
        off-board (the _extract(shift4(arr)[d], loc) pattern)."""
        ly, lx = coords(loc)
        outs = []
        for d in deltas:
            v = val_at(arr, loc + d)
            outs.append(jnp.where(bad_mask(d, ly, lx), fill, v))
        return outs

    def chase_apply(stones, labels, hlibs, m, player):
        """Batched port of ladder._chase_apply (exact label/liberty
        maintenance for one stone placement per lane)."""
        opp = 3 - player
        nbr_s = nbrs_at(stones, m, WALL)
        nbr_l = nbrs_at(labels, m, jnp.int32(nn))
        nbr_libs = [val_at(hlibs, jnp.clip(nbr_l[d], 0, nn - 1))
                    for d in range(4)]
        nbr_stone = [(nbr_s[d] == B.BLACK) | (nbr_s[d] == B.WHITE)
                     for d in range(4)]
        own_sel = [nbr_s[d] == player for d in range(4)]
        cap_sel = [(nbr_s[d] == opp) & (nbr_libs[d] == 1)
                   for d in range(4)]

        own_mask = jnp.zeros((nnp, LB), jnp.bool_)
        cap_mask = jnp.zeros((nnp, LB), jnp.bool_)
        merged_label = m
        for i in range(4):
            own_mask = own_mask | (own_sel[i] & (labels == nbr_l[i]))
            cap_mask = cap_mask | (cap_sel[i] & (labels == nbr_l[i]))
            merged_label = jnp.minimum(
                merged_label, jnp.where(own_sel[i], nbr_l[i], m))
        own_mask = own_mask & (stones == player)
        cap_mask = cap_mask & (stones == opp)

        target_empty = val_at(stones, m) == EMPTY
        at_m = iota == m
        new_stones = jnp.where(at_m, player,
                               jnp.where(cap_mask, EMPTY, stones))
        my_mask = own_mask | at_m
        new_labels = jnp.where(my_mask, merged_label,
                               jnp.where(cap_mask, iota, labels))
        adj = dilate(my_mask)
        my_libs = jnp.sum(((new_stones == EMPTY) & adj).astype(jnp.int32),
                          axis=0, keepdims=True)
        num_captured = jnp.sum(cap_mask.astype(jnp.int32), axis=0,
                               keepdims=True)

        h = hlibs
        # (a) surviving adjacent chains lose the liberty m
        for i in range(4):
            dup = jnp.zeros((1, LB), jnp.bool_)
            for j in range(i):
                dup = dup | ((nbr_l[j] == nbr_l[i]) & nbr_stone[j])
            sel = nbr_stone[i] & ~dup & ~own_sel[i] & ~cap_sel[i]
            h = h - jnp.where(sel & (iota == nbr_l[i]), 1, 0)
        # (b) chains bordering captured points gain those liberties
        cap_rem = cap_mask
        for _t in range(_C_CAP):
            fs, cvalid = first_set(cap_rem)
            cap_rem = cap_rem & (iota != fs)
            c = jnp.clip(jnp.where(cvalid, fs, 0), 0, nn - 1)
            cl = nbrs_at(new_labels, c, jnp.int32(nn))
            cs = nbrs_at(new_stones, c, WALL)
            cstone = [(cs[d] == B.BLACK) | (cs[d] == B.WHITE)
                      for d in range(4)]
            for i in range(4):
                dup = jnp.zeros((1, LB), jnp.bool_)
                for j in range(i):
                    dup = dup | ((cl[j] == cl[i]) & cstone[j])
                sel = (cvalid & cstone[i] & ~dup & (cl[i] != merged_label))
                h = h + jnp.where(sel & (iota == cl[i]), 1, 0)
        # (c) the mover's merged chain, recounted from its mask
        h = jnp.where(iota == merged_label, my_libs, h)

        own_any = own_sel[0]
        for i in range(1, 4):
            own_any = own_any | own_sel[i]
        is_ko = (num_captured == 1) & ~own_any & (my_libs == 1)
        cap_fs, _ = first_set(cap_mask)
        ko_loc = jnp.where(is_ko, cap_fs, -1)
        legal = target_empty & (my_libs > 0)
        overflow = num_captured > _C_CAP
        return new_stones, new_labels, h, ko_loc, legal, overflow

    # ---- load block state ------------------------------------------------
    stones0 = stones_ref[:]
    labels0 = labels_ref[:]
    hlibs0 = hlibs_ref[:]
    rep = rep_ref[:]                     # [1, LB]
    defender = def_ref[:]
    premove = pre_ref[:]
    active = act_ref[:] != 0
    attacker = 3 - defender

    def entry(stones, labels, hlibs):
        empty = stones == EMPTY
        lrep = val_at(labels, rep)
        gone = val_at(stones, rep) != defender
        def_mask = (labels == lrep) & (stones == defender)
        dlibs = jnp.where(gone, 0, val_at(hlibs, lrep))
        libpts = empty & dilate(def_mask)
        return empty, gone, def_mask, dlibs, libpts

    # ---- attacker premove ------------------------------------------------
    has_pre = premove >= 0
    ps, pl_, ph, _, plegal, pov = chase_apply(
        stones0, labels0, hlibs0, jnp.clip(premove, 0, nn - 1), attacker)
    stones1 = jnp.where(has_pre, ps, stones0)
    labels1 = jnp.where(has_pre, pl_, labels0)
    hlibs1 = jnp.where(has_pre, ph, hlibs0)
    live = active & (~has_pre | (plegal & ~pov))

    # done/captured carry as int32 rows: Mosaic rejects i1 vectors in
    # while-loop carries (i8 -> i1 truncation)
    init = (stones1, labels1, hlibs1,
            jnp.full((1, LB), -1, jnp.int32),          # ko
            (~live).astype(jnp.int32),                 # done
            jnp.zeros((1, LB), jnp.int32),             # captured
            jnp.int32(0))                              # ply

    def cond(state):
        _, _, _, _, done_i, _, ply = state
        return jnp.logical_and(ply < max_steps,
                               jnp.logical_not(jnp.all(done_i != 0)))

    def body(state):
        stones, labels, hlibs, ko, done_i, captured_i, ply = state
        done = done_i != 0
        captured = captured_i != 0

        # =============== defender ply ===============
        empty, gone, def_mask, dlibs, libpts = entry(stones, labels, hlibs)
        term_cap = gone
        term_esc = ~gone & ((ko >= 0) | (dlibs >= 2))

        ext_fs, ext_any = first_set(libpts)
        ext = ext_fs
        ext_oh = iota == ext
        est_ext = jnp.sum(((empty & ~ext_oh)
                           & dilate(def_mask | ext_oh)).astype(jnp.int32),
                          axis=0, keepdims=True)
        best_est = jnp.where(ext_any, est_ext, -1)
        best_move = ext
        rem = (stones == attacker) & dilate(def_mask)
        for _t in range(_K_ADJ):
            p_fs, any_rem = first_set(rem)
            lp = val_at(labels, p_fs)
            chain_t = (labels == lp) & (stones == attacker)
            atari = val_at(hlibs, jnp.clip(lp, 0, nn - 1)) == 1
            lone = empty & dilate(chain_t)
            ci, lone_any = first_set(lone)
            ci_oh = iota == ci
            valid_t = any_rem & atari & lone_any & (ci != ko)
            joins = jnp.sum((dilate(def_mask) & ci_oh).astype(jnp.int32),
                            axis=0, keepdims=True) > 0
            defm_t = def_mask | (ci_oh & joins)
            est_t = jnp.sum((((empty | chain_t) & ~ci_oh)
                             & dilate(defm_t)).astype(jnp.int32),
                            axis=0, keepdims=True)
            better = valid_t & (est_t >= best_est)
            best_est = jnp.where(better, est_t, best_est)
            best_move = jnp.where(better, ci, best_move)
            rem = rem & ~chain_t
        def_move = best_move
        def_has = best_est >= 0

        ns, nl, nh, nko, legal, ov = chase_apply(
            stones, labels, hlibs, def_move, defender)
        new_cap = term_cap | (~def_has | ~legal)
        new_esc = term_esc | (~new_cap & ov)
        terminal = (new_cap | new_esc) & ~done
        advance = ~terminal & ~done
        stones = jnp.where(advance, ns, stones)
        labels = jnp.where(advance, nl, labels)
        hlibs = jnp.where(advance, nh, hlibs)
        ko = jnp.where(advance, nko, ko)
        done = done | terminal
        captured = (terminal & new_cap) | (~terminal & captured)  # bool select: Mosaic rejects i1 select_n
        ply = ply + 1

        # =============== attacker ply ===============
        at_cap = ply >= max_steps
        empty, gone, def_mask, dlibs, libpts = entry(stones, labels, hlibs)
        term_cap = gone | (dlibs <= 1)
        term_esc = ~gone & (dlibs >= 3)

        l0, l1 = lowest2_or_nn(libpts)

        def refute(li_raw, lo_raw):
            li = jnp.clip(li_raw, 0, nn - 1)
            lo = jnp.clip(lo_raw, 0, nn - 1)
            valid_r = (li_raw < nn) & (li_raw != ko)
            als = nbrs_at(stones, li, WALL)
            all_ = nbrs_at(labels, li, jnp.int32(nn))
            li_oh = iota == li
            amask = li_oh
            for i in range(4):
                amask = amask | ((als[i] == attacker)
                                 & (labels == all_[i]))
            amask = amask & ((stones == attacker) | li_oh)
            a_libs = jnp.sum(((empty & ~li_oh) & dilate(amask))
                             .astype(jnp.int32), axis=0, keepdims=True)
            legal_est = a_libs >= 1
            lo_oh = iota == lo
            est_ext2 = jnp.sum(((empty & ~li_oh & ~lo_oh)
                                & dilate(def_mask | lo_oh))
                               .astype(jnp.int32), axis=0, keepdims=True)
            lone_a = (empty & ~li_oh) & dilate(amask)
            ca, _ = first_set(lone_a)
            ca_oh = iota == ca
            joins_a = jnp.sum((dilate(def_mask) & ca_oh)
                              .astype(jnp.int32), axis=0,
                              keepdims=True) > 0
            est_cap2 = jnp.sum((((empty | amask) & ~li_oh & ~ca_oh)
                                & dilate(def_mask | (ca_oh & joins_a)))
                               .astype(jnp.int32), axis=0, keepdims=True)
            est_def = jnp.maximum(est_ext2,
                                  jnp.where(a_libs == 1, est_cap2, 0))
            return (~valid_r) | (~legal_est) | (est_def >= 3), est_def

        r0, e0 = refute(l0, l1)
        r1, e1 = refute(l1, l0)
        both_ref = r0 & r1
        pick1 = (~r1) & (r0 | (e1 < e0))
        att_move = jnp.where(pick1, l1, l0)
        att_move = jnp.clip(att_move, 0, nn - 1)

        # double-ko death at the two liberty points
        def imm_at(loc):
            vs = nbrs_at(stones, loc, WALL)
            cnt = jnp.zeros((1, LB), jnp.int32)
            for d in range(4):
                cnt = cnt + (vs[d] == EMPTY).astype(jnp.int32)
            return cnt

        def kocap_at(l_raw):
            loc = jnp.clip(l_raw, 0, nn - 1)
            ns_ = nbrs_at(stones, loc, WALL)
            nl_ = nbrs_at(labels, loc, jnp.int32(nn))
            all_def = (ns_[0] == defender) | (ns_[0] == WALL)
            for i in range(1, 4):
                all_def = all_def & ((ns_[i] == defender)
                                     | (ns_[i] == WALL))
            cap_cnt = jnp.zeros((1, LB), jnp.int32)
            single_cnt = jnp.zeros((1, LB), jnp.int32)
            for i in range(4):
                dup = jnp.zeros((1, LB), jnp.bool_)
                for j in range(i):
                    dup = dup | ((nl_[j] == nl_[i]) & (ns_[j] == defender))
                isdef = (ns_[i] == defender) & ~dup
                in_atari = val_at(hlibs, jnp.clip(nl_[i], 0, nn - 1)) == 1
                chain_sz = jnp.sum(((labels == nl_[i])
                                    & (stones == defender))
                                   .astype(jnp.int32), axis=0,
                                   keepdims=True)
                hit = isdef & in_atari
                cap_cnt = cap_cnt + hit.astype(jnp.int32)
                single_cnt = single_cnt + (hit & (chain_sz == 1)
                                           ).astype(jnp.int32)
            return (l_raw < nn) & all_def & (cap_cnt == 1) \
                & (single_cnt == 1)

        both_libs = (l0 < nn) & (l1 < nn)
        double_ko = (both_libs
                     & (imm_at(jnp.clip(l0, 0, nn - 1)) == 0)
                     & (imm_at(jnp.clip(l1, 0, nn - 1)) == 0)
                     & kocap_at(l0) & kocap_at(l1))

        ns, nl, nh, nko, legal, ov = chase_apply(
            stones, labels, hlibs, att_move, attacker)
        new_cap = term_cap
        new_esc = term_esc | (~term_cap & (both_ref | ov))
        new_cap = new_cap | (~new_esc & double_ko & ~term_esc)
        terminal = (new_cap | new_esc) & ~done & ~at_cap
        advance = ~terminal & ~done & ~at_cap
        stones = jnp.where(advance, ns, stones)
        labels = jnp.where(advance, nl, labels)
        hlibs = jnp.where(advance, nh, hlibs)
        ko = jnp.where(advance, nko, ko)
        done = done | terminal
        captured = (terminal & new_cap) | (~terminal & captured)  # bool select: Mosaic rejects i1 select_n
        ply = ply + 1
        return (stones, labels, hlibs, ko, done.astype(jnp.int32),
                captured.astype(jnp.int32), ply)

    out = jax.lax.while_loop(cond, body, init)
    _, _, _, _, done_f, captured_f, _ = out
    out_ref[:] = ((captured_f != 0) & (done_f != 0) & active).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("size", "max_steps",
                                             "interpret"))
def chase_lanes(stones, labels, hlibs, rep, defender, premove, active,
                *, size: int, max_steps: int, interpret: bool = False):
    """Run the chase solver for a flat batch of lanes.

    stones/labels/hlibs: int32[Lanes, NN] initial per-lane board analysis
    (ladder._analyze of the lane's game board). rep/defender/premove:
    int32[Lanes]; active: bool[Lanes]. Returns bool[Lanes] captured.
    """
    lanes, nn = stones.shape
    assert nn == size * size
    nnp = ((nn + 31) // 32) * 32
    lpad = ((lanes + LB - 1) // LB) * LB

    def prep(arr, fill):
        a = jnp.transpose(arr.astype(jnp.int32))           # [NN, L]
        return jnp.pad(a, ((0, nnp - nn), (0, lpad - lanes)),
                       constant_values=fill)

    stones_t = prep(stones, B.WALL)
    # pad-row labels must never match a real label; their own index works
    labels_t = prep(labels, nn)
    hlibs_t = prep(hlibs, 0)

    def prep1(arr, fill):
        a = arr.astype(jnp.int32).reshape(1, lanes)
        return jnp.pad(a, ((0, 0), (0, lpad - lanes)),
                       constant_values=fill)

    rep_t = prep1(rep, 0)
    def_t = prep1(defender, B.BLACK)
    pre_t = prep1(premove, -1)
    act_t = prep1(active, 0)

    grid = (lpad // LB,)
    big_spec = pl.BlockSpec((nnp, LB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, LB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_body, size=size, nnp=nnp,
                          max_steps=max_steps),
        grid=grid,
        in_specs=[big_spec, big_spec, big_spec,
                  row_spec, row_spec, row_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((1, lpad), jnp.int8),
        interpret=interpret,
    )(stones_t, labels_t, hlibs_t, rep_t, def_t, pre_t, act_t)
    return out[0, :lanes] != 0
