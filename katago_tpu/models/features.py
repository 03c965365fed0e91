"""V7 input featurizer — TPU-native equivalent of NNInputs::fillRowV7.

Reference: /root/reference/cpp/neuralnet/nninputs.cpp:2300-2740 (fillRowV7),
nninputs.h:97-98 (22 spatial binary planes + 19 global floats).

Plane map (all from the perspective of the player to move, "pla"):
   0: on-board mask
   1: pla stones              2: opp stones
   3/4/5: stones with exactly 1/2/3 liberties
   6: ko-banned locations (simple ko + superko bans; encore once-only bans)
   7: encore ko-recapture-blocked locations
   8: reserved (unused by the reference's V7 fill)
   9..13: location of previous moves 1..5 (most recent first)
  14: stones in working ladders (current board)
  15: prev-board ladder stones (= plane 14 until prev boards are stored,
      the reference's own hideHistory fallback, nninputs.cpp:2586)
  16: prev-prev-board ladder stones (same fallback)
  17: working ladder-capture moves vs opp chains >1 lib
  18: pla current territory (full area / independent-life per rules)
  19: opp current territory
  20/21: second-encore starting stones (encore phase 2 only)

Global map:
   0..4: previous moves 1..5 were passes
   5: self komi / 20 (clipped to +-(area + 20))
   6,7: ko rule (simple 0,0 / positional 1,0.5 / situational 1,-0.5)
   8: multi-stone suicide legal
   9: territory scoring
  10,11: tax (seki 1,0 / all 1,1)
  12,13: encore phase >0 / >1
  14: pass would end phase
  15,16: playout-doubling-advantage flag and 0.5*pda
  17: button available
  18: komi parity triangle wave

History (planes 9-13, globals 0-4, prev-ladder planes) is hidden when the
game is over or when a pass would end the game under conservative-pass
analysis, mirroring the reference's hideHistory logic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from katago_tpu.game import benson
from katago_tpu.game import board as B
from katago_tpu.game import ladder
from katago_tpu.game import history as H
from katago_tpu.game import rules as R

NUM_SPATIAL_V7 = 22
NUM_GLOBAL_V7 = 19
KOMI_CLIP_RADIUS = 20.0


class FeatureParams(NamedTuple):
    """Dynamic per-eval knobs, reference MiscNNInputParams (nninputs.h:44-72)."""
    draw_equiv_wins_for_white: jax.Array  # f32, default 0.5
    playout_doubling_advantage: jax.Array  # f32, default 0
    conservative_pass: jax.Array  # bool: root analysis hides ending-pass history

    @staticmethod
    def default() -> "FeatureParams":
        return FeatureParams(
            draw_equiv_wins_for_white=jnp.float32(0.5),
            playout_doubling_advantage=jnp.float32(0.0),
            conservative_pass=jnp.bool_(False),
        )


def self_komi(gs: H.GameState, params: FeatureParams) -> jax.Array:
    """currentSelfKomi (boardhistory.cpp:579): komi + per-game white bonus
    (territory chill / button) from the mover's perspective, with the
    draw-utility fold."""
    komi = gs.rules.komi + gs.pos.white_bonus
    # draw parity is a STATIC rules property (rules.gameResultWillBeInteger,
    # rules.cpp): the button's eventual 0.5 flips it whether or not the
    # button has been taken yet
    komi_is_int = gs.rules.komi == jnp.round(gs.rules.komi)
    result_int = komi_is_int != gs.rules.has_button
    draw_adj = jnp.where(result_int,
                         params.draw_equiv_wins_for_white - 0.5, 0.0)
    white_komi = komi + draw_adj
    return jnp.where(gs.to_move == B.WHITE, white_komi, -white_komi)


def fill_features_v7(gs: H.GameState, size: int,
                     params: FeatureParams,
                     legal_full: jax.Array | None = None,
                     with_ladders: bool = True,
                     ladder_mode: str = "exact",
                     prev_laddered: jax.Array | None = None,
                     prev_prev_laddered: jax.Array | None = None,
                     cur_ladder=None,
                     ) -> tuple[jax.Array, jax.Array]:
    """Returns (spatial f32[NN, 22], global f32[19]) for the player to move.

    legal_full: optional precomputed H.legal_moves(gs) [NN+1] to avoid
    recomputing the superko scan (callers that need the mask anyway, like
    the search evaluator, pass it in).

    with_ladders: static switch for planes 14-17 (the ladder solver is by
    far the most expensive feature; inner-search evaluators may trade it
    off for throughput via SearchParams).

    ladder_mode: "exact" runs the reference-semantics backtracking solver
    (per-move and data-writing paths); "chase" runs the greedy forward
    chase (ladder.py section comment) — the per-playout in-search
    variant, ~2 orders of magnitude cheaper at search lane widths.

    prev_laddered / prev_prev_laddered: optional precomputed laddered-stone
    masks (bool[NN]) of the boards one and two moves ago. The search caches
    each tree node's own plane-14 mask, so a leaf eval passes its parent's
    and grandparent's masks here and only the CURRENT board is solved —
    cutting the dominant featurizer cost 3x (the solver output for a given
    board is position-deterministic, so the cache is exact). Both must be
    given together; history suppression falls back to the nearest included
    board exactly as in the 3-solve path.

    cur_ladder: optional precomputed ladder.LadderResult of the CURRENT
    board — the batched search evaluator solves all games' boards in one
    Pallas kernel call (ladder.ladder_map_chase_batch) and passes each
    game's row here, so no solve runs inside the per-game vmap at all.
    Requires prev_laddered/prev_prev_laddered too."""
    nn = size * size
    stones = gs.board.stones
    pla = gs.to_move
    opp = B.opponent(pla)

    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)

    sp = jnp.zeros((nn, NUM_SPATIAL_V7), jnp.float32)
    gl = jnp.zeros((NUM_GLOBAL_V7,), jnp.float32)

    onboard = stones != B.WALL   # static shape mask (rect boards embed
                                 # in the square grid with WALL cells)
    sp = sp.at[:, 0].set(onboard.astype(jnp.float32))
    sp = sp.at[:, 1].set((stones == pla).astype(jnp.float32))
    sp = sp.at[:, 2].set((stones == opp).astype(jnp.float32))
    occupied = stones != B.EMPTY
    sp = sp.at[:, 3].set((occupied & (libs == 1)).astype(jnp.float32))
    sp = sp.at[:, 4].set((occupied & (libs == 2)).astype(jnp.float32))
    sp = sp.at[:, 5].set((occupied & (libs == 3)).astype(jnp.float32))

    # plane 6: ko-ban locations — points legal but for ko/superko rules.
    # Computed as (basic legality with the simple-ko ban lifted) minus full
    # legality; covers both board.ko_loc and superko bans like the
    # reference's superKoBanned array.
    board_no_ko = gs.board._replace(ko_loc=jnp.int32(-1))
    basic_no_ko = B.legal_moves_basic(board_no_ko, pla,
                                      gs.rules.multi_suicide, size)
    if legal_full is None:
        legal_full = H.legal_moves(gs, size)
    full = legal_full[:nn]
    ko_banned = basic_no_ko & ~full & ~gs.game_over
    sp = sp.at[:, 6].set(ko_banned.astype(jnp.float32))
    # plane 7: encore ko-recapture-blocked locations (nninputs.cpp:2367)
    sp = sp.at[:, 7].set(gs.pos.ko_recap_blocked.astype(jnp.float32))

    # ---- pass-ending analysis (used by history masking AND global 14) ----
    # passWouldEndPhase: a pass now reaches 2 consecutive ending passes, or
    # repeats a position this player already passed from (spight-like)
    in_encore = gs.pos.encore_phase > 0
    ko = gs.rules.ko_rule
    pass_counts = in_encore | (ko != R.KO_SPIGHT)
    kh_now = H._pos_ko_hash(gs.pos, gs.rules)
    spight_phase = in_encore | (ko == R.KO_SIMPLE) | (ko == R.KO_SPIGHT)
    is_black_mover = pla == B.BLACK
    ring = jnp.where(is_black_mover, gs.pass_hash_black, gs.pass_hash_white)
    ring_n = jnp.where(is_black_mover, gs.pass_hash_black_n,
                       gs.pass_hash_white_n)
    ring_valid = jnp.arange(H.MAX_PASS_HASHES) < ring_n
    spightlike = spight_phase & jnp.any(
        jnp.all(ring == kh_now[None, :], axis=1) & ring_valid)
    pass_would_end_phase = (((pass_counts & (gs.consec_passes >= 1))
                             | spightlike) & ~gs.game_over)
    is_area_rules = gs.rules.scoring_rule == R.SCORING_AREA
    pass_would_end_game = pass_would_end_phase & (
        is_area_rules | (gs.pos.encore_phase >= 2))

    # friendly-pass end suppression (shouldSuppressEndGameFromFriendlyPass,
    # boardhistory.cpp:889-894): in area-scoring friendly-pass rulesets a
    # non-spightlike double-pass ending is treated as not ending the game
    friendly_suppress = (gs.rules.friendly_pass_ok & is_area_rules
                         & pass_counts & (gs.consec_passes == 1)
                         & ~spightlike & ~gs.game_over)

    # history masking (nninputs.cpp:2464-2486): hide ALL history when a
    # pass would end the game but the eval pretends it won't; include ONE
    # move when the game just finished; wipe across phase changes
    suppress_pass_end = pass_would_end_game & (params.conservative_pass
                                               | friendly_suppress)
    max_turns = jnp.where(suppress_pass_end, 0,
                          jnp.where(gs.game_over, 1, 5))
    amount = jnp.minimum(max_turns, gs.pos.turns_this_phase)

    # history: planes 9-13 + globals 0-4
    for k in range(5):
        mv = gs.recent_moves[k]
        have = (amount > k) & (gs.move_num > k)
        is_pass = have & (mv >= nn)
        on_board = have & (mv >= 0) & (mv < nn)
        plane = jnp.zeros((nn + 1,), jnp.float32).at[
            jnp.clip(mv, 0, nn)].set(jnp.where(on_board, 1.0, 0.0))[:nn]
        sp = sp.at[:, 9 + k].set(plane)
        gl = gl.at[k].set(is_pass.astype(jnp.float32))

    # planes 14-17: ladders (iterLadders, nninputs.cpp:815; feature apply
    # nninputs.cpp:2548-2580). Planes 15/16 mark the laddered stones of
    # the boards one and two moves ago (getRecentBoard(1/2),
    # nninputs.cpp:1125-1143); history suppression falls back to the
    # nearest included board.
    if with_ladders:
        if ladder_mode == "chase":
            solve = lambda s, k: ladder.ladder_map_chase(s, size, ko_loc=k)
        else:
            solve = lambda s, k: ladder.ladder_map(s, size, ko_loc=k)
        if prev_laddered is not None:
            # cached-prev path (in-search): solve only the current board;
            # planes 15/16 come from the caller's cached masks with the
            # same history-suppression fallback as the 3-solve path
            lad = cur_ladder if cur_ladder is not None \
                else solve(stones, gs.pos.simple_ko_loc)
            lad15 = jnp.where(amount >= 1, prev_laddered, lad.laddered)
            lad16 = jnp.where(amount >= 2, prev_prev_laddered, lad15)
        else:
            prev = jnp.where(amount >= 1,
                             gs.pos.prev_stones.astype(stones.dtype), stones)
            prev_ko = jnp.where(amount >= 1, gs.pos.prev_ko_loc,
                                gs.pos.simple_ko_loc)
            pp = jnp.where(amount >= 2,
                           gs.pos.prev_prev_stones.astype(stones.dtype), prev)
            pp_ko = jnp.where(amount >= 2, gs.pos.prev_prev_ko_loc, prev_ko)
            # one vmapped solve over {current, prev, prevprev}: the solver
            # compiles once and the three boards batch onto the device
            lad3 = jax.vmap(solve)(
                jnp.stack([stones, prev, pp]),
                jnp.stack([gs.pos.simple_ko_loc, prev_ko, pp_ko]))
            lad = jax.tree.map(lambda x: x[0], lad3)
            lad15 = lad3.laddered[1]
            lad16 = lad3.laddered[2]
        sp = sp.at[:, 14].set(lad.laddered.astype(jnp.float32))
        sp = sp.at[:, 15].set(lad15.astype(jnp.float32))
        sp = sp.at[:, 16].set(lad16.astype(jnp.float32))
        working = jnp.where(opp == B.BLACK, lad.working_vs_black,
                            lad.working_vs_white)
        sp = sp.at[:, 17].set(working.astype(jnp.float32))

    # planes 18/19: current territory (nninputs.cpp:2374-2460):
    #   area+TAX_NONE  -> full area (pass-alive + big territories + stones)
    #   area+tax       -> independent-life area keeping stones
    #   territory      -> only in encore >= 2: independent-life area
    #                     (keep territories iff TAX_NONE) + stones surviving
    #                     since the second-encore start
    is_area_scoring = gs.rules.scoring_rule == R.SCORING_AREA
    tax_none = gs.rules.tax_rule == R.TAX_NONE
    in_encore2 = gs.pos.encore_phase >= 2
    area_plain = benson.calculate_area(
        stones, size, jnp.bool_(True), jnp.bool_(True), jnp.bool_(True),
        gs.rules.multi_suicide)
    keep_territories = ~is_area_scoring & tax_none
    keep_stones = is_area_scoring & ~tax_none
    area_il, _ = benson.calculate_independent_life_area(
        stones, size, keep_territories=keep_territories,
        keep_stones=keep_stones, suicide_legal=gs.rules.multi_suicide)
    area = jnp.where(is_area_scoring & tax_none, area_plain, area_il)
    has_area = is_area_scoring | in_encore2
    ses = gs.pos.second_encore_start.astype(jnp.int32)
    pla_terr = (area == pla) | (~is_area_scoring & (area == B.EMPTY) &
                                (stones == pla) & (ses == pla))
    opp_terr = (area == opp) | (~is_area_scoring & (area == B.EMPTY) &
                                (stones == opp) & (ses == opp))
    sp = sp.at[:, 18].set((has_area & pla_terr).astype(jnp.float32))
    sp = sp.at[:, 19].set((has_area & opp_terr).astype(jnp.float32))
    # planes 20/21: second-encore starting stones (nninputs.cpp:2583)
    sp = sp.at[:, 20].set((in_encore2 & (ses == pla)).astype(jnp.float32))
    sp = sp.at[:, 21].set((in_encore2 & (ses == opp)).astype(jnp.float32))

    # ---- globals ----
    sk = self_komi(gs, params)
    b_area = jnp.sum(onboard.astype(jnp.float32))
    sk = jnp.clip(sk, -b_area - KOMI_CLIP_RADIUS, b_area + KOMI_CLIP_RADIUS)
    gl = gl.at[5].set(sk / 20.0)

    ko = gs.rules.ko_rule
    is_pos_like = (ko == R.KO_POSITIONAL) | (ko == R.KO_SPIGHT)
    is_sit = ko == R.KO_SITUATIONAL
    gl = gl.at[6].set((is_pos_like | is_sit).astype(jnp.float32))
    gl = gl.at[7].set(jnp.where(is_pos_like, 0.5,
                                jnp.where(is_sit, -0.5, 0.0)))
    gl = gl.at[8].set(gs.rules.multi_suicide.astype(jnp.float32))
    gl = gl.at[9].set((gs.rules.scoring_rule == R.SCORING_TERRITORY)
                      .astype(jnp.float32))
    tax = gs.rules.tax_rule
    gl = gl.at[10].set(((tax == R.TAX_SEKI) | (tax == R.TAX_ALL))
                       .astype(jnp.float32))
    gl = gl.at[11].set((tax == R.TAX_ALL).astype(jnp.float32))
    gl = gl.at[12].set((gs.pos.encore_phase > 0).astype(jnp.float32))
    gl = gl.at[13].set((gs.pos.encore_phase > 1).astype(jnp.float32))

    # passWouldEndPhase, hidden under the same suppression as history
    # (nninputs.cpp:2476-2478,2653)
    gl = gl.at[14].set((pass_would_end_phase
                        & ~suppress_pass_end).astype(jnp.float32))

    pda = params.playout_doubling_advantage
    gl = gl.at[15].set((pda != 0.0).astype(jnp.float32))
    gl = gl.at[16].set(0.5 * pda)

    button_avail = gs.rules.has_button & ~gs.button_taken
    gl = gl.at[17].set(button_avail.astype(jnp.float32))

    # parity wave (nninputs.cpp:2667-2728): triangle wave of selfKomi vs the
    # nearest drawable komi parity; area scoring only (or encore >= 2)
    area_scoring = (gs.rules.scoring_rule == R.SCORING_AREA) | in_encore2
    drawable_even = (jnp.sum(onboard.astype(jnp.int32)) % 2) == 0
    komi_floor = jnp.where(
        drawable_even,
        jnp.floor(sk / 2.0) * 2.0,
        jnp.floor((sk - 1.0) / 2.0) * 2.0 + 1.0)
    delta = jnp.clip(sk - komi_floor, 0.0, 2.0)
    wave = jnp.where(delta < 0.5, delta,
                     jnp.where(delta < 1.5, 1.0 - delta, delta - 2.0))
    gl = gl.at[18].set(jnp.where(area_scoring, wave, 0.0))

    return sp, gl


# ---------------------------------------------------------------------------
# Older input-feature versions (modelversion.cpp getInputsVersion):
# model v3/v4 -> inputs V3, v5 -> V4, v6 -> V5, v7 -> V6, v8+ -> V7.
# V3/V4/V6 share V7's 22-plane spatial layout with different territory
# semantics on planes 18/19 (fillRowV3 nninputs.cpp:1145, fillRowV4
# "pass-alive only" nninputs.cpp:1490, fillRowV6 nninputs.cpp:1935);
# V5 is the reduced "no fancy features" 13-plane set (fillRowV5
# nninputs.cpp:1649: no ko-ban or ladder planes, history at 6-10,
# second-encore stones at 11/12). Globals are subsets/permutations of
# V7's with komi scaled /15 before V6.
# ---------------------------------------------------------------------------

NUM_SPATIAL_BY_VERSION = {3: 22, 4: 22, 5: 13, 6: 22, 7: NUM_SPATIAL_V7}
NUM_GLOBAL_BY_VERSION = {3: 14, 4: 14, 5: 12, 6: 16, 7: NUM_GLOBAL_V7}


def fill_features(gs: H.GameState, size: int, params: FeatureParams,
                  legal: jax.Array, *, version: int = 7,
                  with_ladders: bool = True, ladder_mode: str = "exact",
                  prev_laddered: jax.Array | None = None,
                  prev_prev_laddered: jax.Array | None = None,
                  cur_ladder=None):
    """Versioned featurizer: V3..V7 spatial/global rows."""
    if version == 7:
        return fill_features_v7(gs, size, params, legal,
                                with_ladders=with_ladders,
                                ladder_mode=ladder_mode,
                                prev_laddered=prev_laddered,
                                prev_prev_laddered=prev_prev_laddered,
                                cur_ladder=cur_ladder)
    if version not in NUM_SPATIAL_BY_VERSION:
        raise ValueError(f"unsupported input-features version {version}")
    sp, gl = fill_features_v7(gs, size, params, legal,
                              with_ladders=(with_ladders and version != 5),
                              ladder_mode=ladder_mode,
                              prev_laddered=prev_laddered,
                              prev_prev_laddered=prev_prev_laddered,
                              cur_ladder=cur_ladder)

    if version in (3, 4):
        # planes 18/19: V3 = scoring-dependent plain area
        # (area: all-stones+all-territories; territory: pass-alive + safe
        # big territories only); V4 = always the pass-alive recipe
        pla = gs.pos.to_move
        opp = B.opponent(pla)
        is_area = gs.rules.scoring_rule == R.SCORING_AREA
        non_pass_alive = jnp.bool_(False) if version == 4 \
            else is_area
        unsafe_big = non_pass_alive
        area = benson.calculate_area(
            gs.pos.board.stones, size, non_pass_alive, jnp.bool_(True),
            unsafe_big, gs.rules.multi_suicide)
        sp = sp.at[:, 18].set((area == pla).astype(jnp.float32))
        sp = sp.at[:, 19].set((area == opp).astype(jnp.float32))

    if version == 5:
        # [0-5 board/libs][6-10 prev moves 1-5][11,12 second-encore]
        sp = jnp.concatenate(
            [sp[:, 0:6], sp[:, 9:14], sp[:, 20:22]], axis=1)

    # ---- global remaps ----
    komi15 = gl[5] * 20.0 / 15.0    # V3/V4/V5 scale selfKomi by /15
    if version in (3, 4):
        out = jnp.concatenate([
            gl[0:5], komi15[None], gl[6:10],
            gl[12:14],            # encore phase flags
            gl[14:15],            # passWouldEndPhase
            gl[18:19],            # komi parity wave
        ])
    elif version == 5:
        out = jnp.concatenate([gl[0:5], komi15[None], gl[6:10],
                               gl[12:14]])
    else:  # version 6: V7 minus pda(15,16)/button(17), wave at 15
        out = jnp.concatenate([gl[0:15], gl[18:19]])
    return sp, out
