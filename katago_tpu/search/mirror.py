"""Anti-mirror-Go countering — reference cpp/search/searchmirror.cpp +
search.h:470-492 (searchParams.antiMirror).

Mirror Go (the opponent point-reflecting our every move) exploits naive
MCTS; the reference (a) detects mirroring from the game's move history
(Search::updateMirroring), (b) boosts policy priors on the opponent
continuing to mirror and on our center-oriented refutations
(maybeApplyAntiMirrorPolicy), and (c) force-explores mirror replies and
center/tengen moves during PUCT so their true (bad-for-mirror) values
surface (maybeApplyAntiMirrorForcedExplore).

TPU shape: detection is host-side numpy once per search over the [G]
games' move histories; the per-game verdict ships to the device as a
small MirrorArrs pytree, and the in-tree adjustments are branchless [A]
vector math keyed off each node's last move. The whole feature is a
STATIC toggle on run_search/init_search (like with_ladders), so searches
without it — selfplay, bench — pay zero cost.

Deviations from the reference, by construction of the array tree:
  - isMirroringSinceSearchStart's full-path re-check is approximated by
    the per-node "this move mirrors the parent's last move" test;
  - isAdjacentToChain(center) / getNumLiberties(center) refinements are
    replaced by the distance<=2 test that subsumes adjacency.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B


class MirrorArrs(NamedTuple):
    """Per-game anti-mirror verdict, device-resident."""
    mirroring: jax.Array      # bool[G]: opponent of root pla is mirroring
    mirror_pla: jax.Array     # int32[G]: the mirroring player (0 if none)
    advantage: jax.Array      # f32[G] mirrorAdvantage (komi-favored-ness)
    center_err: jax.Array     # f32[G] mirrorCenterSymmetryError

    @staticmethod
    def none(g: int) -> "MirrorArrs":
        return MirrorArrs(
            mirroring=jnp.zeros((g,), bool),
            mirror_pla=jnp.zeros((g,), jnp.int32),
            advantage=jnp.zeros((g,), jnp.float32),
            center_err=jnp.full((g,), 1e10, jnp.float32))


def mirror_of(loc, size: int):
    """Point reflection (Location::getMirrorLoc); pass/invalid unchanged."""
    nn = size * size
    y, x = loc // size, loc % size
    m = (size - 1 - y) * size + (size - 1 - x)
    return jnp.where((loc >= 0) & (loc < nn), m, loc)


def center_loc(size: int) -> int:
    return (size // 2) * size + size // 2 if size % 2 == 1 else -1


def detect_game(moves: list[int], plas: list[int], root_pla: int,
                stones: np.ndarray, komi: float, scoring_area: bool,
                size: int, num_handicap: int = 0,
                handicap_bonus: int = 0) -> tuple[bool, float, float]:
    """Host-side updateMirroring for one game (searchmirror.cpp:10-83).

    moves/plas: the game's move history (flat locs, pass = size*size).
    stones: current board int[NN]. handicap_bonus: white's handicap
    compensation points under the game's whiteHandicapBonus rule.
    Returns (opponent_is_mirroring, mirror_advantage, center_symmetry_err).
    """
    nn = size * size
    mirror_count, total_count = 0, 0
    mirror_ewms, total_ewms = 0.0, 0.0
    last_was_mirror = False
    for i in range(1, len(moves)):
        if plas[i] != root_pla:
            last_was_mirror = False
            prev = moves[i - 1]
            if prev < nn and moves[i] == (
                    (size - 1 - prev // size) * size
                    + (size - 1 - prev % size)):
                mirror_count += 1
                mirror_ewms += 1
                last_was_mirror = True
            total_count += 1
            total_ewms += 1
            mirror_ewms *= 0.75
            total_ewms *= 0.75
    mirroring = (mirror_count >= 7.0 + 0.5 * total_count
                 and mirror_ewms >= 0.45 * total_ewms and last_was_mirror)

    advantage = 0.0
    mirror_pla = 3 - root_pla
    if mirroring:
        black_extra = 0.0
        if scoring_area:
            if num_handicap > 0:
                black_extra += num_handicap - 1
            black_gets_last = (size % 2 == 1) == (num_handicap == 0
                                                  or num_handicap % 2 == 1)
            if black_gets_last:
                black_extra += 1
        black_extra -= handicap_bonus
        advantage = (black_extra - komi if mirror_pla == B.BLACK
                     else komi - black_extra)

    center_err = 1e10
    if size >= 7:
        center_err = 0.0
        unmatched = 0
        half = size // 2
        for dy in range(-3, 4):
            for dx in range(-3, 4):
                y, x = half + dy, half + dx
                loc = y * size + x
                mloc = (size - 1 - y) * size + (size - 1 - x)
                if loc == mloc:
                    continue
                c0, c1 = int(stones[loc]), int(stones[mloc])
                if c0 == 3 - mirror_pla and c1 != mirror_pla:
                    center_err += 1.0
                if c0 == mirror_pla and c1 == 0:
                    unmatched += 1
        if center_err > 0.0:
            center_err += 0.2 * unmatched
        if center_err >= 1.0:
            center_err = 0.5 * center_err * (1.0 + center_err)
    return mirroring, advantage, center_err


def adjust_policy(pol, prev_loc, move_pla, depth_from_root, stones,
                  m_mirroring, m_pla, m_adv, root_pla, size: int):
    """maybeApplyAntiMirrorPolicy for one node's prior vector [A]
    (searchmirror.cpp:95-153): boost the opponent continuing the mirror
    and our center-oriented answers, discounted by sqrt depth."""
    nn = size * size
    a = pol.shape[0]
    legal = pol >= 0
    cl = center_loc(size)

    weight = jnp.zeros((a,), jnp.float32)
    actions = jnp.arange(a, dtype=jnp.int32)

    # opponent-continues-to-mirror boost
    mloc = mirror_of(prev_loc, size)
    mloc_legal = jnp.where((mloc < nn) & (mloc >= 0), legal[jnp.clip(
        mloc, 0, a - 1)], False)
    mloc_eff = jnp.where(mloc_legal, mloc, nn)  # fall back to pass
    is_difficult = jnp.bool_(False)
    if cl >= 0:
        is_difficult = (stones[cl] == m_pla) & (m_adv >= -0.5)
    opp_w = jnp.where(actions == mloc_eff,
                      jnp.where(is_difficult, 3.0, 1.0), 0.0)
    opp_active = (move_pla == m_pla) & (prev_loc < nn) & (prev_loc >= 0)

    # our center-oriented boosts
    ys, xs = actions[:nn] // size, actions[:nn] % size
    lo, hi = (size - 1) // 2, size // 2
    central = ((xs >= lo) & (xs <= hi) & (ys >= lo) & (ys <= hi))
    near_central = ((xs >= lo - 1) & (xs <= hi + 1)
                    & (ys >= lo - 1) & (ys <= hi + 1))
    our_w_sp = jnp.where(central, 0.3, jnp.where(near_central, 0.05, 0.0))
    if cl >= 0:
        cy, cx = cl // size, cl % size
        dist_sq = (ys - cy) ** 2 + (xs - cx) ** 2
        opp_holds_center = stones[cl] == (3 - move_pla)
        near = jnp.where(dist_sq <= 2, 0.05,
                         jnp.where(dist_sq <= 4, 0.03, 0.0))
        our_w_sp = jnp.maximum(our_w_sp,
                               jnp.where(opp_holds_center, near, 0.0))
    our_w = jnp.concatenate([our_w_sp, jnp.zeros((1,), jnp.float32)])
    our_active = move_pla == root_pla

    weight = jnp.where(opp_active, opp_w, jnp.where(our_active, our_w, 0.0))
    weight = weight / (1.0 + jnp.sqrt(
        jnp.maximum(depth_from_root, 0).astype(jnp.float32)))
    boosted = pol + (1.0 - pol) * weight
    out = jnp.where(legal & m_mirroring, boosted, pol)
    return out


def puct_adjust(value_comp, actions_pol, prev_loc, node_pla, cw, total_cw,
                parent_util_self, stones, is_root,
                m_mirroring, m_pla, m_adv, m_err, root_pla, size: int):
    """maybeApplyAntiMirrorForcedExplore as an [A]-vector addition to the
    self-perspective value component of PUCT (searchmirror.cpp:156-278).

    value_comp: [A] self-perspective child utilities. cw: [A] child
    weights. parent_util_self: scalar self-perspective parent utility.
    Returns the adjusted value_comp.
    """
    nn = size * size
    a = value_comp.shape[0]
    actions = jnp.arange(a, dtype=jnp.int32)
    legal = actions_pol >= 0
    cl = center_loc(size)
    if cl < 0:  # even board: no center-based anti-mirror
        return value_comp

    cy, cx = cl // size, cl % size
    is_difficult = (stones[cl] == m_pla) & (m_adv >= -0.5)

    # ---- mirroring player dumping down the mirror reply ----
    mloc = mirror_of(prev_loc, size)
    mloc_legal = jnp.where((mloc < nn) & (mloc >= 0),
                           legal[jnp.clip(mloc, 0, a - 1)], False)
    mloc_eff = jnp.where(mloc_legal, mloc, nn)
    mdist_sq = ((mloc_eff // size - cy) ** 2
                + (mloc_eff % size - cx) ** 2).astype(jnp.float32)
    dump_d = jnp.maximum(0.20, 1.0 / (0.75 + 0.5 * jnp.sqrt(mdist_sq))
                         / jnp.maximum(1.0, m_err))
    dump = jnp.where(is_difficult, dump_d,
                     jnp.where(m_adv >= 5.0, 0.15,
                               jnp.where(m_adv >= -5.0, 0.10 + m_adv,
                                         0.05)))
    bias = jnp.where(is_difficult, 0.75,
                     jnp.where(m_adv >= 5.0, 0.50,
                               jnp.where(m_adv >= -5.0, 0.30 + m_adv * 4.0,
                                         0.10)))
    pass_scale = jnp.where(
        mloc_eff == nn, 0.35 / jnp.maximum(1.0, jnp.sqrt(m_err)), 1.0)
    dump = dump * pass_scale
    err_div = jnp.where(m_err >= 1.0, m_err, 1.0)
    dump, bias = dump / err_div, bias / err_div

    pu2 = jnp.maximum(0.3, 1.0 - 0.7 * parent_util_self * parent_util_self)
    is_mirror_move = actions == mloc_eff
    opp_case = m_mirroring & (node_pla == m_pla) & (prev_loc >= 0) & (
        prev_loc < nn)
    add_opp = (jnp.where(cw < dump * total_cw, 100.0, 0.0)
               + jnp.where(cw < bias * total_cw, 0.18 * pu2, 0.0)
               + jnp.where(cw < 0.5 * bias * total_cw, 0.36 * pu2, 0.0))
    adj = jnp.where(opp_case & is_mirror_move, add_opp, 0.0)

    # ---- root player force-exploring center refutations ----
    ys, xs = actions[:nn] // size, actions[:nn] % size
    dist_sq = ((ys - cy) ** 2 + (xs - cx) ** 2).astype(jnp.float32)
    dump_r_sp = jnp.where(is_difficult,
                          jnp.where(dist_sq <= 2, 0.010,
                                    jnp.where(dist_sq <= 4, 0.005, 0.0)),
                          0.0)
    dump_r_sp = jnp.where(actions[:nn] == cl,
                          jnp.where(is_root, 0.06, 0.12), dump_r_sp)
    dump_r = jnp.concatenate([dump_r_sp, jnp.zeros((1,), jnp.float32)])
    # dampen by utility loss (searchmirror.cpp:258-260)
    util_loss = parent_util_self - value_comp
    over = (util_loss > 0) & (util_loss * dump_r > 0.03)
    dump_r = jnp.where(over,
                       dump_r + 0.5 * (0.03 / jnp.maximum(util_loss, 1e-9)
                                       - dump_r), dump_r)
    # scale down when the opponent's last move was already central
    pdist_sq = ((prev_loc // size - cy) ** 2
                + (prev_loc % size - cx) ** 2).astype(jnp.float32)
    prev_on_board = (prev_loc >= 0) & (prev_loc < nn)
    scale = jnp.where(prev_on_board & (pdist_sq <= 16), 0.900, 1.0)
    scale = scale * jnp.where(prev_on_board & (pdist_sq <= 5), 0.825, 1.0)
    scale = scale * jnp.where(prev_on_board & (pdist_sq <= 2), 0.750, 1.0)
    dump_r = dump_r * scale
    our_case = m_mirroring & (node_pla == root_pla)
    adj = adj + jnp.where(our_case & (cw < dump_r * total_cw) & legal
                          & (actions < nn), 100.0, 0.0)
    return value_comp + jnp.where(legal, adj, 0.0)
