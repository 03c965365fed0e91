"""Game history layer: superko, passes, game end, scoring — cpp/game/boardhistory equivalent.

The reference's BoardHistory (/root/reference/cpp/game/boardhistory.h:13-107)
tracks move history, a ko-hash list for superko, encore phases for
territory scoring, and final-score computation. Here the same state is a
fixed-shape GameState pytree, one per game, vmapped over the batch.

The state splits in two, because the search stores thousands of positions
per game in its node pool and must not replicate the hash history:

  * PosState — everything a single position needs (board, mover, pass/button
    bookkeeping, recent moves). Cheap; stored per MCTS node.
  * GameState — PosState + rules + the superko ko-hash history buffer.
    The search reconstitutes a GameState for any tree node by appending the
    path's hashes to the root game's history.

Superko: a candidate move is illegal if its post-move ko-hash (positional:
position hash; situational: position ^ player-to-move key) appears in the
history. Full 361-way legality computes every candidate's post-move hash
analytically from per-chain Zobrist keys (segment XOR) with capture and
legal-suicide XOR deltas, then one [NN, MAX_HIST] compare.

Game end: two consecutive phase-ending passes end the current phase.
Area scoring ends the game at the first phase end; territory scoring
proceeds through the reference's encore phases 0 -> 1 -> 2 (Spight-like
territory rules, boardhistory.h:66-90), with per-move score chill, encore
ko-recapture blocks (pass-for-ko lifts a block without touching the
board), once-only encore ko captures, and second-encore start colors for
final territory counting. Scoring handles tax rules via independent-life
(seki-excluding) area analysis. Long-cycle no-results (3-fold repetition
in encore / simple-ko) are detected at the GameState level.

Spight-like phase endings triggered by repeated-position passes
(hashesBeforeBlackPass/WhitePass, boardhistory.cpp:866) are tracked in
GameState pass-hash rings; the history-free PosState stepping used inside
the search approximates them by consecutive-pass counting only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import benson
from katago_tpu.game import board as B
from katago_tpu.game import rules as R
from katago_tpu.game import zobrist
from katago_tpu.ops import lookup as L

# Fixed capacity of the once-only encore ko-capture record
# (koCapturesInEncore, boardhistory.h:85 — unbounded there; a ring here.
# Encore phases rarely see more than a couple of ko captures alive at once.)
MAX_ENCORE_KO_CAPS = 8
# Capacity of the per-player pass-hash rings for Spight-like phase endings
MAX_PASS_HASHES = 16


class RulesArr(NamedTuple):
    """Per-game dynamic rules, so one compiled program plays mixed rules."""
    ko_rule: jax.Array            # int32: R.KO_*
    scoring_rule: jax.Array       # int32: R.SCORING_*
    tax_rule: jax.Array           # int32: R.TAX_*
    multi_suicide: jax.Array      # bool
    has_button: jax.Array         # bool
    friendly_pass_ok: jax.Array   # bool (rules.h friendlyPassOk: premature
                                  # double-pass endings are suppressed from
                                  # the net's view, boardhistory.cpp:889)
    komi: jax.Array               # float32 (includes white handicap bonus,
                                  # folded in at game init like the reference
                                  # does via whiteKomiAdjustment)

    @staticmethod
    def from_rules(rules: R.Rules, num_handicap: int = 0) -> "RulesArr":
        komi = rules.komi
        if rules.white_handicap_bonus_rule == R.WHB_N:
            komi += num_handicap
        elif rules.white_handicap_bonus_rule == R.WHB_N_MINUS_ONE and num_handicap > 0:
            komi += num_handicap - 1
        return RulesArr(
            ko_rule=jnp.int32(rules.ko_rule),
            scoring_rule=jnp.int32(rules.scoring_rule),
            tax_rule=jnp.int32(rules.tax_rule),
            multi_suicide=jnp.bool_(rules.multi_stone_suicide_legal),
            has_button=jnp.bool_(rules.has_button),
            friendly_pass_ok=jnp.bool_(rules.friendly_pass_ok),
            komi=jnp.float32(komi),
        )


class PosState(NamedTuple):
    """One position + per-position bookkeeping; storable per search node."""
    board: B.BoardState           # stones, ko_loc, pos_hash
    to_move: jax.Array            # int32 1/2
    move_num: jax.Array           # int32
    consec_passes: jax.Array      # int32 (phase-ending passes)
    button_taken: jax.Array       # bool
    button_for: jax.Array         # int32 0/1/2
    game_over: jax.Array          # bool
    recent_moves: jax.Array       # int32[8], most recent first, NN=pass,
                                  # -1=none (featurizer reads 5; root
                                  # useless-move pruning inspects the
                                  # opponent's last 4, indices 0/2/4/6)
    turns_this_phase: jax.Array   # int32: moves since the last phase start
    #   (numApproxValidTurnsThisPhase, boardhistory.cpp:1051 — the V7
    #   featurizer wipes move history across phase changes)
    simple_ko_loc: jax.Array      # int32: the raw Board::ko_loc the
    #   reference board carries (set on any ko-shaped capture, even in
    #   encore where our board absorbs it into ko_recap_blocked) — the
    #   ladder featurizer consults it (iterLadders runs on the raw board)
    # --- previous two board snapshots for ladder planes 15/16
    #     (BoardHistory::getRecentBoard, boardhistory.h:153; V7 featurizer
    #     nninputs.cpp:1125-1143) ---
    prev_stones: jax.Array        # int8[NN] board before the last move
    prev_prev_stones: jax.Array   # int8[NN] board two moves ago
    prev_ko_loc: jax.Array        # int32 simple ko loc on prev board
    prev_prev_ko_loc: jax.Array   # int32
    # --- territory-scoring encore state (boardhistory.h:66-90) ---
    encore_phase: jax.Array       # int32 0/1/2
    ko_recap_blocked: jax.Array   # bool[NN]
    ko_recap_block_hash: jax.Array  # uint32[2]
    second_encore_start: jax.Array  # int8[NN] colors at start of encore 2
    white_bonus: jax.Array        # f32: territory chill per move
    is_no_result: jax.Array       # bool: game over with no result
    # once-only encore ko captures (ring; koCapturesInEncore)
    ko_cap_hash: jax.Array        # uint32[MAX_ENCORE_KO_CAPS, 2] pos hash before
    ko_cap_loc: jax.Array         # int32[MAX_ENCORE_KO_CAPS]
    ko_cap_pla: jax.Array         # int32[MAX_ENCORE_KO_CAPS]
    ko_cap_n: jax.Array           # int32 total recorded (ring writes mod cap)


class GameState(NamedTuple):
    pos: PosState
    rules: RulesArr
    ko_hash_hist: jax.Array       # uint32[MAX_HIST, 2]
    hist_len: jax.Array           # int32 (number of valid entries)
    # ko hashes at which each player has passed (Spight-like phase endings;
    # hashesBeforeBlackPass/WhitePass, boardhistory.h:63-64)
    pass_hash_black: jax.Array    # uint32[MAX_PASS_HASHES, 2]
    pass_hash_black_n: jax.Array  # int32
    pass_hash_white: jax.Array    # uint32[MAX_PASS_HASHES, 2]
    pass_hash_white_n: jax.Array  # int32

    # convenience pass-throughs so call sites read naturally
    @property
    def board(self):
        return self.pos.board

    @property
    def to_move(self):
        return self.pos.to_move

    @property
    def move_num(self):
        return self.pos.move_num

    @property
    def consec_passes(self):
        return self.pos.consec_passes

    @property
    def button_taken(self):
        return self.pos.button_taken

    @property
    def button_for(self):
        return self.pos.button_for

    @property
    def game_over(self):
        return self.pos.game_over

    @property
    def recent_moves(self):
        return self.pos.recent_moves

    @property
    def encore_phase(self):
        return self.pos.encore_phase


def replace_pos(gs: GameState, **kw) -> GameState:
    """Replace PosState fields through the GameState wrapper (tests, setup)."""
    return gs._replace(pos=gs.pos._replace(**kw))


def setup_board(gs: GameState, stones, size: int) -> GameState:
    """Replace the whole starting board in one shot (vectorized
    setup_stone): recomputes the zobrist pos_hash by xor-folding the
    stone keys, seeds the prev-board snapshots, and refreshes the
    recorded starting ko-hash. Only valid before any moves are played."""
    st = jnp.asarray(zobrist.stone_table(size))[:, :size * size]  # [2,NN,2]
    stones = jnp.asarray(stones, jnp.int32)
    keysel = (jnp.where((stones == B.BLACK)[:, None], st[0], jnp.uint32(0))
              ^ jnp.where((stones == B.WHITE)[:, None], st[1],
                          jnp.uint32(0)))
    h = jax.lax.reduce(keysel, jnp.uint32(0), jax.lax.bitwise_xor,
                       dimensions=(0,))
    board = gs.pos.board._replace(stones=stones, pos_hash=h)
    gs = gs._replace(pos=gs.pos._replace(
        board=board,
        prev_stones=stones.astype(jnp.int8),
        prev_prev_stones=stones.astype(jnp.int8)))
    return gs._replace(
        ko_hash_hist=gs.ko_hash_hist.at[0].set(_pos_ko_hash(gs.pos,
                                                            gs.rules)))


def setup_stone(gs: GameState, loc, color, size: int) -> GameState:
    """Place (or clear, color=EMPTY) a pre-game setup stone: updates the
    zobrist pos_hash, seeds the prev-board snapshots (getRecentBoard
    clamps to the earliest board), and refreshes the recorded starting
    ko-hash (Board::setStone + BoardHistory::clear, boardhistory.cpp:122).
    Only valid before any moves are played."""
    st = jnp.asarray(zobrist.stone_table(size))      # [2, NN, 2]
    loc = jnp.int32(loc)
    color = jnp.int32(color)
    old = gs.pos.board.stones[loc]
    h = gs.pos.board.pos_hash
    h = jnp.where(old > 0, h ^ st[jnp.clip(old, 1, 2) - 1, loc], h)
    h = jnp.where(color > 0, h ^ st[jnp.clip(color, 1, 2) - 1, loc], h)
    stones = gs.pos.board.stones.at[loc].set(color)
    board = gs.pos.board._replace(stones=stones, pos_hash=h)
    gs = gs._replace(pos=gs.pos._replace(
        board=board,
        prev_stones=stones.astype(jnp.int8),
        prev_prev_stones=stones.astype(jnp.int8)))
    # re-record the starting position's ko hash in slot 0
    return gs._replace(
        ko_hash_hist=gs.ko_hash_hist.at[0].set(_pos_ko_hash(gs.pos,
                                                            gs.rules)))


def _ko_hash(pos_hash: jax.Array, to_move_next: jax.Array,
             ko_rule: jax.Array, encore_phase=None,
             ko_recap_block_hash=None) -> jax.Array:
    """Hash used for superko / repetition comparisons (getKoHash,
    boardhistory.cpp): position hash, the mover key under situational ko,
    plus the encore phase key and ko-recap-block marks when in encore."""
    zpl = jnp.asarray(zobrist.player_table())  # uint32[2,2]
    situational = ko_rule == R.KO_SITUATIONAL
    h = jnp.where(situational, pos_hash ^ zpl[to_move_next - 1], pos_hash)
    if encore_phase is not None:
        zen = jnp.asarray(zobrist.encore_table())  # uint32[3,2]
        h = h ^ zen[jnp.clip(encore_phase, 0, 2)]
    if ko_recap_block_hash is not None:
        h = h ^ ko_recap_block_hash
    return h


def _pos_ko_hash(pos: PosState, rules: RulesArr) -> jax.Array:
    """Full ko hash of a position for its player to move."""
    return _ko_hash(pos.board.pos_hash, pos.to_move, rules.ko_rule,
                    pos.encore_phase, pos.ko_recap_block_hash)


def new_pos(size: int, shape_mask=None) -> PosState:
    """shape_mask: optional bool[NN] on-board mask for rectangular or
    irregular boards. Off-shape cells hold B.WALL stones, which behave
    exactly like the board edge everywhere (shift4 pads edges with WALL,
    so every neighbor rule already treats them as walls): they are
    unplayable, have no liberties, can't be captured, score nothing, and
    carry no zobrist keys. A 17x13 game is a 17x17 grid with 4 WALL
    rows (the TPU-native form of the reference's x_size/y_size boards,
    board.h:14-16)."""
    nn = size * size
    e = MAX_ENCORE_KO_CAPS
    board = B.empty_board(size)
    if shape_mask is not None:
        board = board._replace(stones=jnp.where(
            jnp.asarray(shape_mask), board.stones, jnp.int32(B.WALL)))
    return PosState(
        board=board,
        to_move=jnp.int32(B.BLACK),
        move_num=jnp.int32(0),
        consec_passes=jnp.int32(0),
        button_taken=jnp.bool_(False),
        button_for=jnp.int32(0),
        game_over=jnp.bool_(False),
        recent_moves=jnp.full((8,), -1, jnp.int32),
        turns_this_phase=jnp.int32(0),
        simple_ko_loc=jnp.int32(-1),
        prev_stones=board.stones.astype(jnp.int8),
        prev_prev_stones=board.stones.astype(jnp.int8),
        prev_ko_loc=jnp.int32(-1),
        prev_prev_ko_loc=jnp.int32(-1),
        encore_phase=jnp.int32(0),
        ko_recap_blocked=jnp.zeros((nn,), bool),
        ko_recap_block_hash=jnp.zeros((2,), jnp.uint32),
        second_encore_start=jnp.zeros((nn,), jnp.int8),
        white_bonus=jnp.float32(0.0),
        is_no_result=jnp.bool_(False),
        ko_cap_hash=jnp.zeros((e, 2), jnp.uint32),
        ko_cap_loc=jnp.full((e,), -1, jnp.int32),
        ko_cap_pla=jnp.zeros((e,), jnp.int32),
        ko_cap_n=jnp.int32(0),
    )


def new_game(size: int, rules: RulesArr, max_hist: int,
             shape_mask=None) -> GameState:
    pos = new_pos(size, shape_mask=shape_mask)
    hist = jnp.zeros((max_hist, 2), jnp.uint32)
    # record the empty starting position (black to move)
    h0 = _pos_ko_hash(pos, rules)
    hist = hist.at[0].set(h0)
    p = MAX_PASS_HASHES
    return GameState(pos=pos, rules=rules, ko_hash_hist=hist,
                     hist_len=jnp.int32(1),
                     pass_hash_black=jnp.zeros((p, 2), jnp.uint32),
                     pass_hash_black_n=jnp.int32(0),
                     pass_hash_white=jnp.zeros((p, 2), jnp.uint32),
                     pass_hash_white_n=jnp.int32(0))


def _ko_capture_loc(stones, labels, libs, chain_size, loc, player,
                    size) -> jax.Array:
    """Board::getKoCaptureLoc (board.cpp:544): if playing loc for player
    would be a ko-shaped capture (all on-board neighbors are opponent's,
    exactly one of them a lone stone in atari), return that stone's loc,
    else -1. loc must be in [0, NN)."""
    nn = size * size
    neigh = jnp.asarray(B.neighbor_table(size))[loc]            # [4]
    opp = B.opponent(player)
    on = neigh < nn
    spad = B._pad(stones, B.WALL)
    libspad = B._pad(libs, 0)
    szpad = B._pad(chain_size, 0)
    nbr_s = spad[neigh]
    all_opp_or_wall = jnp.all(~on | (nbr_s == opp))
    capturable = on & (nbr_s == opp) & (libspad[neigh] == 1)
    one_cap = jnp.sum(capturable.astype(jnp.int32)) == 1
    cap = neigh[jnp.argmax(capturable)]
    ok = ((stones[loc] == B.EMPTY) & all_opp_or_wall & one_cap &
          (szpad[cap] == 1))
    return jnp.where(ok, cap, jnp.int32(-1))


def _chain_sizes(stones, labels, nn) -> jax.Array:
    occupied = stones != B.EMPTY
    counts = L.bincount_sum(jnp.where(occupied, labels, -1), nn,
                            dtype=jnp.int32)
    return jnp.where(occupied, L.gather_1d(counts, labels), 0)


def step_pos(pos: PosState, rules: RulesArr, loc: jax.Array,
             size: int,
             spightlike_ending_pass=None) -> tuple[PosState, B.MoveInfo, jax.Array]:
    """Play loc (NN = pass) for the player to move; assumed legal.

    History-free core of `step` (makeBoardMoveAssumeLegal,
    boardhistory.cpp:932): returns the new position, move info, and the new
    position's ko-hash. Stepping a finished game is a no-op (masked) so
    lockstep batches can keep stepping until all games end.

    spightlike_ending_pass: optional bool from the GameState layer — this
    pass ends the phase because the player already passed from this ko hash
    (wouldBeSpightlikeEndingPass). The history-free caller leaves it None.
    """
    nn = size * size
    kmt = jnp.asarray(zobrist.ko_mark_table(size))              # [NN+1, 2]
    was_over = pos.game_over
    loc_eff = jnp.where(was_over, jnp.int32(nn), loc)
    player = pos.to_move
    opp = B.opponent(player)
    in_encore = pos.encore_phase > 0
    is_pass_move = loc_eff >= nn
    lc = jnp.clip(loc_eff, 0, nn - 1)
    if spightlike_ending_pass is None:
        spightlike_ending_pass = jnp.bool_(False)

    # ---- pass-for-ko detection (encore only; boardhistory.cpp:999-1019):
    # a nominally-illegal recapture of a blocked ko is interpreted as a
    # pass that lifts the block, leaving the board untouched.
    stones = pos.board.stones
    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    sizes = _chain_sizes(stones, labels, nn)
    case_a = (in_encore & ~is_pass_move & ~was_over &
              (stones[lc] == opp) & pos.ko_recap_blocked[lc] &
              (sizes[lc] == 1) & (libs[lc] == 1))
    kcl = _ko_capture_loc(stones, labels, libs, sizes, lc, player, size)
    kcl_c = jnp.clip(kcl, 0, nn - 1)
    case_b = (in_encore & ~is_pass_move & ~was_over & ~case_a & (kcl >= 0) &
              pos.ko_recap_blocked[kcl_c] & (stones[kcl_c] == opp))
    pass_for_ko = case_a | case_b
    lift_loc = jnp.where(case_a, lc, jnp.where(case_b, kcl_c, jnp.int32(nn)))

    # ---- board update (skipped for pass-for-ko) ----
    play_loc = jnp.where(pass_for_ko, jnp.int32(nn), loc_eff)
    new_board, info = B.play_move(pos.board, play_loc, player, size)
    info = info._replace(is_pass=is_pass_move)  # pass-for-ko is not a pass

    # encore ko-recap block bookkeeping
    recap = pos.ko_recap_blocked
    recap_hash = pos.ko_recap_block_hash
    # lift on pass-for-ko
    recap = recap.at[jnp.minimum(lift_loc, nn - 1)].set(
        jnp.where(pass_for_ko, False, recap[jnp.minimum(lift_loc, nn - 1)]))
    recap_hash = recap_hash ^ jnp.where(pass_for_ko, kmt[lift_loc],
                                        jnp.zeros((2,), jnp.uint32))
    # new block on an encore ko capture; record it in the once-only ring
    was_ko_cap = (in_encore & ~pass_for_ko & ~is_pass_move & ~was_over &
                  (new_board.ko_loc >= 0))
    recap = recap.at[lc].set(jnp.where(was_ko_cap, True, recap[lc]))
    recap_hash = recap_hash ^ jnp.where(was_ko_cap, kmt[lc],
                                        jnp.zeros((2,), jnp.uint32))
    e = MAX_ENCORE_KO_CAPS
    slot = pos.ko_cap_n % e
    ko_cap_hash = pos.ko_cap_hash.at[slot].set(
        jnp.where(was_ko_cap, pos.board.pos_hash, pos.ko_cap_hash[slot]))
    ko_cap_loc = pos.ko_cap_loc.at[slot].set(
        jnp.where(was_ko_cap, lc, pos.ko_cap_loc[slot]))
    ko_cap_pla = pos.ko_cap_pla.at[slot].set(
        jnp.where(was_ko_cap, player, pos.ko_cap_pla[slot]))
    ko_cap_n = pos.ko_cap_n + was_ko_cap.astype(jnp.int32)
    # the raw board's ko point, kept for ladder featurization even where
    # our legality layer absorbs it (pass-for-ko leaves the board as-is ->
    # raw ko cleared like a pass would clear it)
    simple_ko_loc = jnp.where(pass_for_ko, jnp.int32(-1), new_board.ko_loc)
    # in encore, the simple-ko loc plays no further role (absorbed above)
    new_board = new_board._replace(
        ko_loc=jnp.where(in_encore, jnp.int32(-1), new_board.ko_loc))
    # unmark blocks no longer on stones (captures freed them)
    now_empty = new_board.stones == B.EMPTY
    to_unmark = recap & now_empty & in_encore
    recap_hash = recap_hash ^ B._xor_reduce_masked(kmt[:nn], to_unmark)
    recap = recap & ~to_unmark

    # ---- pass / button / phase-ending bookkeeping ----
    claims_button = (rules.has_button &
                     (rules.scoring_rule == R.SCORING_AREA) &
                     is_pass_move & ~pos.button_taken & ~was_over &
                     ~in_encore)
    button_taken = pos.button_taken | claims_button
    button_for = jnp.where(claims_button, player, pos.button_for)

    # consecutiveEndingPasses (newConsecutiveEndingPassesAfterPass):
    # encore passes always count; SPIGHT main-phase passes never do
    pass_counts = in_encore | (rules.ko_rule != R.KO_SPIGHT)
    consec = jnp.where(is_pass_move & ~claims_button,
                       jnp.where(pass_counts, pos.consec_passes + 1,
                                 jnp.int32(0)),
                       jnp.int32(0))

    ending = (~was_over) & is_pass_move & ~claims_button & \
        ((consec >= 2) | spightlike_ending_pass)

    # ---- territory chill: 1 point per non-pass move in phases 0/1 ----
    chill = ((rules.scoring_rule == R.SCORING_TERRITORY) &
             (pos.encore_phase <= 1) & ~is_pass_move & ~pass_for_ko &
             ~was_over)
    white_bonus = pos.white_bonus + jnp.where(
        chill, jnp.where(player == B.BLACK, 1.0, -1.0), 0.0)
    # taking the button scores its 0.5 immediately (boardhistory.cpp:960-962)
    white_bonus = white_bonus + jnp.where(
        claims_button, jnp.where(player == B.WHITE, 0.5, -0.5), 0.0)

    # ---- phase transition / game end ----
    is_area = rules.scoring_rule == R.SCORING_AREA
    end_now = ending & (is_area | (pos.encore_phase >= 2))
    advance = ending & ~is_area & (pos.encore_phase < 2)
    encore2 = pos.encore_phase + advance.astype(jnp.int32)
    # entering a new phase clears encore ko state
    recap = jnp.where(advance, jnp.zeros_like(recap), recap)
    recap_hash = jnp.where(advance, jnp.zeros((2,), jnp.uint32), recap_hash)
    ko_cap_n = jnp.where(advance, jnp.int32(0), ko_cap_n)
    ko_cap_loc = jnp.where(advance, jnp.full((e,), -1, jnp.int32), ko_cap_loc)
    consec = jnp.where(advance, jnp.int32(0), consec)
    entered_2 = advance & (encore2 == 2)
    second_start = jnp.where(entered_2, new_board.stones.astype(jnp.int8),
                             pos.second_encore_start)

    game_over = was_over | end_now
    recent = jnp.where(was_over, pos.recent_moves,
                       jnp.concatenate([loc_eff[None], pos.recent_moves[:-1]]))

    new_pos_state = PosState(
        board=jax.tree.map(lambda a, b: jnp.where(was_over, a, b),
                           pos.board, new_board),
        to_move=jnp.where(was_over, pos.to_move, opp),
        move_num=jnp.where(was_over, pos.move_num, pos.move_num + 1),
        consec_passes=jnp.where(was_over, pos.consec_passes, consec),
        button_taken=button_taken,
        button_for=button_for,
        game_over=game_over,
        recent_moves=recent,
        # moves since phase start; the ending pass itself is wiped by the
        # phase reset (boardhistory.cpp:1040-1051). Game end is not a
        # phase reset: the featurizer still shows the final pass
        # (nninputs.cpp:2479-2481).
        turns_this_phase=jnp.where(
            was_over, pos.turns_this_phase,
            jnp.where(advance, jnp.int32(0), pos.turns_this_phase + 1)),
        simple_ko_loc=jnp.where(was_over, pos.simple_ko_loc, simple_ko_loc),
        prev_stones=jnp.where(was_over, pos.prev_stones,
                              pos.board.stones.astype(jnp.int8)),
        prev_prev_stones=jnp.where(was_over, pos.prev_prev_stones,
                                   pos.prev_stones),
        prev_ko_loc=jnp.where(was_over, pos.prev_ko_loc, pos.simple_ko_loc),
        prev_prev_ko_loc=jnp.where(was_over, pos.prev_prev_ko_loc,
                                   pos.prev_ko_loc),
        encore_phase=jnp.where(was_over, pos.encore_phase, encore2),
        ko_recap_blocked=jnp.where(was_over, pos.ko_recap_blocked, recap),
        ko_recap_block_hash=jnp.where(was_over, pos.ko_recap_block_hash,
                                      recap_hash),
        second_encore_start=second_start,
        white_bonus=jnp.where(was_over, pos.white_bonus, white_bonus),
        is_no_result=pos.is_no_result,
        ko_cap_hash=ko_cap_hash,
        ko_cap_loc=ko_cap_loc,
        ko_cap_pla=ko_cap_pla,
        ko_cap_n=jnp.where(was_over, pos.ko_cap_n, ko_cap_n),
    )
    hk = _pos_ko_hash(new_pos_state, rules)
    return new_pos_state, info, hk


def step(gs: GameState, loc: jax.Array, size: int) -> tuple[GameState, B.MoveInfo]:
    """Play loc (NN = pass); the full-history layer over step_pos.

    Adds what the reference's makeBoardMoveAssumeLegal does with history:
    Spight-like phase-ending passes (same player passed from this ko hash
    before), pass-hash recording, ko-history clearing on passes in
    spight-like phases / button claims / encore transitions, and long-cycle
    no-results (3-fold repetition on a non-pass move in encore or under
    simple ko, boardhistory.cpp:1155-1161)."""
    nn = size * size
    was_over = gs.pos.game_over
    player = gs.pos.to_move
    is_pass_req = (loc >= nn) & ~was_over
    kh_before = _pos_ko_hash(gs.pos, gs.rules)

    spight_phase = (gs.pos.encore_phase > 0) | \
        (gs.rules.ko_rule == R.KO_SIMPLE) | (gs.rules.ko_rule == R.KO_SPIGHT)

    claims_button = (gs.rules.has_button &
                     (gs.rules.scoring_rule == R.SCORING_AREA) &
                     is_pass_req & ~gs.pos.button_taken &
                     (gs.pos.encore_phase == 0))

    # wouldBeSpightlikeEndingPass: same player passed from this hash before
    is_black = player == B.BLACK
    ring = jnp.where(is_black, gs.pass_hash_black, gs.pass_hash_white)
    ring_n = jnp.where(is_black, gs.pass_hash_black_n, gs.pass_hash_white_n)
    p = MAX_PASS_HASHES
    ring_valid = jnp.arange(p) < ring_n
    seen = jnp.any(jnp.all(ring == kh_before[None, :], axis=1) & ring_valid)
    spightlike = spight_phase & is_pass_req & ~claims_button & seen

    pos2, info, hk = step_pos(gs.pos, gs.rules, loc, size, spightlike)
    advanced = pos2.encore_phase != gs.pos.encore_phase

    # record the pass hash into the mover's ring (non-button passes)
    record = is_pass_req & ~claims_button
    def push(ring_arr, n, mine):
        do = record & mine & (n < p)
        slot = jnp.minimum(n, p - 1)
        arr = ring_arr.at[slot].set(jnp.where(do, kh_before, ring_arr[slot]))
        return arr, n + (do & (n < p)).astype(jnp.int32)

    phb, phbn = push(gs.pass_hash_black, gs.pass_hash_black_n, is_black)
    phw, phwn = push(gs.pass_hash_white, gs.pass_hash_white_n, ~is_black)
    # phase transitions and button claims clear the pass rings
    clear_rings = advanced | claims_button
    phbn = jnp.where(clear_rings, jnp.int32(0), phbn)
    phwn = jnp.where(clear_rings, jnp.int32(0), phwn)

    # ko-hash history: reset on button claim, spight-phase pass, or phase
    # transition; else append
    reset_hist = (~was_over) & (claims_button | (is_pass_req & spight_phase) |
                                advanced)
    max_hist = gs.ko_hash_hist.shape[0]
    write_idx = jnp.where(reset_hist, jnp.int32(0),
                          jnp.minimum(gs.hist_len, max_hist - 1))
    hist = jnp.where(reset_hist[..., None, None],
                     jnp.zeros_like(gs.ko_hash_hist), gs.ko_hash_hist)
    hist = hist.at[write_idx].set(
        jnp.where(was_over, gs.ko_hash_hist[write_idx], hk))
    hist_len = jnp.where(was_over, gs.hist_len,
                         jnp.where(reset_hist, jnp.int32(1),
                                   jnp.minimum(gs.hist_len + 1, max_hist)))

    # long-cycle no-result: 3 occurrences of the post-move hash
    cyc_check = (~was_over) & ~is_pass_req & \
        ((gs.pos.encore_phase > 0) | (gs.rules.ko_rule == R.KO_SIMPLE))
    valid = jnp.arange(max_hist) < hist_len
    occurrences = jnp.sum(
        (jnp.all(hist == hk[None, :], axis=1) & valid).astype(jnp.int32))
    no_result = cyc_check & (occurrences >= 3)
    pos2 = pos2._replace(
        game_over=pos2.game_over | no_result,
        is_no_result=pos2.is_no_result | no_result)

    return GameState(pos=pos2, rules=gs.rules, ko_hash_hist=hist,
                     hist_len=hist_len,
                     pass_hash_black=phb, pass_hash_black_n=phbn,
                     pass_hash_white=phw, pass_hash_white_n=phwn), info


def legal_moves(gs: GameState, size: int) -> jax.Array:
    """bool[NN+1] full legality for the player to move, incl. superko.

    Index NN is pass (always legal while the game is live). Mirrors
    BoardHistory::isLegal (reference boardhistory.cpp): basic board
    legality, then ko-hash recurrence per ko rule. SPIGHT is treated as
    SITUATIONAL for now (spight's pass-hash subtleties come with the
    encore milestone).
    """
    nn = size * size
    zst = jnp.asarray(zobrist.stone_table(size))  # [2, NN+1, 2]
    stones = gs.board.stones
    player = gs.to_move
    opp = B.opponent(player)

    basic = B.legal_moves_basic(gs.board, player, gs.rules.multi_suicide, size)

    # --- analytic post-move hash for every candidate point ---
    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    # per-chain XOR of stone zobrist keys (keyed by chain root label)
    own_keys = jnp.where((stones == B.BLACK)[:, None],
                         zst[0, :nn], zst[1, :nn])
    own_keys = jnp.where(((stones == B.BLACK) | (stones == B.WHITE))[:, None],
                         own_keys, 0)
    # one-hot parity form on accelerators (the sort+scatter segment_xor
    # serializes on TPU; ops/lookup.py xor_gather_rows docstring)
    chain_key = L.segment_xor_onehot(own_keys, labels, nn)  # uint32[NN, 2]

    nbr_s = B.shift4(stones, size, B.WALL)            # [4,NN]
    nbr_lab = B.shift4(labels, size, jnp.int32(nn))
    nbr_libs = B.shift4(libs, size, jnp.int32(0))

    def xor_adjacent_chains(match: jax.Array) -> jax.Array:
        """XOR chain keys of distinct neighbor chains where match[4,NN]."""
        cand = [jnp.where(match[d], nbr_lab[d], nn) for d in range(4)]
        for k in range(1, 4):
            dup = jnp.zeros_like(cand[k], dtype=bool)
            for j in range(k):
                dup = dup | (cand[k] == cand[j])
            cand[k] = jnp.where(dup, nn, cand[k])
        # XOR-gather in one-hot parity form: the [4, NN]-index point
        # gather serializes on TPU (~1ms/call in-search)
        return L.xor_gather_rows(chain_key,
                                  jnp.stack(cand, axis=-1))  # [NN, 2]

    # captures: adjacent opp chains in atari
    delta_cap = xor_adjacent_chains((nbr_s == opp) & (nbr_libs == 1))

    # legal multi-stone suicide: all own adjacent chains die with the stone
    has_empty_nbr = jnp.any(nbr_s == B.EMPTY, axis=0)
    own_safe = jnp.any((nbr_s == player) & (nbr_libs >= 2), axis=0)
    captures_any = jnp.any((nbr_s == opp) & (nbr_libs == 1), axis=0)
    own_any = jnp.any(nbr_s == player, axis=0)
    is_suicide_move = (stones == B.EMPTY) & ~has_empty_nbr & ~own_safe & ~captures_any & own_any
    delta_own = xor_adjacent_chains((nbr_s == player) & (nbr_libs == 1))

    place_key = zst[player - 1, :nn]
    new_hash = gs.board.pos_hash[None, :] ^ place_key ^ delta_cap
    # suicide removes own adjacent chains AND the placed stone (which cancels)
    suicide_hash = gs.board.pos_hash[None, :] ^ delta_own
    post_hash = jnp.where(is_suicide_move[:, None], suicide_hash, new_hash)

    ko_after = _ko_hash(post_hash, opp, gs.rules.ko_rule)  # [NN, 2]

    # compare against history (only valid entries)
    max_hist = gs.ko_hash_hist.shape[0]
    valid = jnp.arange(max_hist) < gs.hist_len
    eq = jnp.all(ko_after[:, None, :] == gs.ko_hash_hist[None, :, :], axis=-1)
    repeats = jnp.any(eq & valid[None, :], axis=1)  # [NN]

    in_encore = gs.pos.encore_phase > 0
    use_superko = ((gs.rules.ko_rule == R.KO_POSITIONAL) |
                   (gs.rules.ko_rule == R.KO_SITUATIONAL) |
                   (gs.rules.ko_rule == R.KO_SPIGHT)) & ~in_encore
    legal = basic & ~(use_superko & repeats)

    # ---- encore legality (BoardHistory::isLegal, boardhistory.cpp:791) ----
    # once-only encore ko captures: ban repeating a recorded (position,
    # player, loc) ko capture
    e = MAX_ENCORE_KO_CAPS
    cap_valid = (jnp.arange(e) < jnp.minimum(gs.pos.ko_cap_n, e)) & \
        (gs.pos.ko_cap_pla == player)
    cap_match = cap_valid & jnp.all(
        gs.pos.ko_cap_hash == gs.board.pos_hash[None, :], axis=1)
    encore_ban = jnp.zeros((nn + 1,), bool).at[
        jnp.where(cap_match, jnp.clip(gs.pos.ko_cap_loc, 0, nn), nn)].max(
        cap_match)[:nn]
    legal = legal & ~(in_encore & encore_ban)

    # pass-for-ko moves are legal (they lift a recap block, no board change)
    chain_sz = _chain_sizes(stones, labels, nn)
    pfk_a = (stones == opp) & gs.pos.ko_recap_blocked & (chain_sz == 1) & \
        (libs == 1)
    idxs = jnp.arange(nn, dtype=jnp.int32)
    kcls = jax.vmap(
        lambda m: _ko_capture_loc(stones, labels, libs, chain_sz, m, player,
                                  size))(idxs)
    kcls_c = jnp.clip(kcls, 0, nn - 1)
    pfk_b = (kcls >= 0) & gs.pos.ko_recap_blocked[kcls_c] & \
        (stones[kcls_c] == opp)
    legal = jnp.where(in_encore, legal | pfk_a | pfk_b, legal)

    legal = legal & ~gs.game_over
    # pass always legal while game is live
    return jnp.concatenate([legal, (~gs.game_over)[None]])


def _area_score_board(stones, rules: RulesArr, size: int):
    """(area int32[NN], board score white-minus-black f32) under area
    scoring (countAreaScoreWhiteMinusBlack, boardhistory.cpp:591)."""
    tax_none = rules.tax_rule == R.TAX_NONE
    area_plain = benson.calculate_area(
        stones, size, jnp.bool_(True), jnp.bool_(True), jnp.bool_(True),
        rules.multi_suicide)
    area_il, wmb_regions = benson.calculate_independent_life_area(
        stones, size, keep_territories=jnp.bool_(False),
        keep_stones=jnp.bool_(True), suicide_legal=rules.multi_suicide)
    area = jnp.where(tax_none, area_plain, area_il)
    score = jnp.sum(jnp.where(area == B.WHITE, 1,
                    jnp.where(area == B.BLACK, -1, 0))).astype(jnp.float32)
    score = score - jnp.where(rules.tax_rule == R.TAX_ALL,
                              2.0 * wmb_regions, 0.0)
    return area, score


def _territory_score_board(stones, second_encore_start, encore_phase,
                           rules: RulesArr, size: int):
    """(area int32[NN], board score white-minus-black f32) under territory
    scoring (countTerritoryAreaScoreWhiteMinusBlack,
    boardhistory.cpp:632): independent-life territory plus stones that
    survived since the second-encore start."""
    keep_territories = rules.tax_rule == R.TAX_NONE
    area, wmb_regions = benson.calculate_independent_life_area(
        stones, size, keep_territories=keep_territories,
        keep_stones=jnp.bool_(False), suicide_legal=rules.multi_suicide)
    ses = second_encore_start.astype(jnp.int32)
    unclaimed = area == B.EMPTY
    white_stone = unclaimed & (stones == B.WHITE) & \
        ((encore_phase < 2) | (ses == B.WHITE))
    black_stone = unclaimed & (stones == B.BLACK) & \
        ((encore_phase < 2) | (ses == B.BLACK))
    area = jnp.where(white_stone, B.WHITE,
                     jnp.where(black_stone, B.BLACK, area))
    score = jnp.sum(jnp.where(area == B.WHITE, 1,
                    jnp.where(area == B.BLACK, -1, 0))).astype(jnp.float32)
    score = score - jnp.where(rules.tax_rule == R.TAX_ALL,
                              2.0 * wmb_regions, 0.0)
    return area, score


def final_score_pos(pos: PosState, rules: RulesArr,
                    size: int) -> tuple[jax.Array, jax.Array]:
    """(ownership int32[NN], white_minus_black float32) for a finished (or
    hypothetically-ended-now) position under its scoring rule.

    Sign convention matches the reference's finalWhiteMinusBlackScore
    (endAndScoreGameNow, boardhistory.cpp:701): positive means white wins.
    Komi (already including any handicap bonus), territory chill
    (white_bonus), and the button's 0.5 are added."""
    stones = pos.board.stones
    is_territory = rules.scoring_rule == R.SCORING_TERRITORY
    area_a, score_a = _area_score_board(stones, rules, size)
    area_t, score_t = _territory_score_board(
        stones, pos.second_encore_start, pos.encore_phase, rules, size)
    area = jnp.where(is_territory, area_t, area_a)
    board_score = jnp.where(is_territory, score_t, score_a)
    # a taken button is already inside white_bonus (step_pos); an untaken
    # button at game end goes to the player who would move next
    # (endAndScoreGameNow, boardhistory.cpp:710-712)
    button = jnp.where(rules.has_button & ~pos.button_taken
                       & (pos.encore_phase == 0),
                       jnp.where(pos.to_move == B.WHITE, 0.5, -0.5),
                       0.0)
    own = jnp.where(area == B.BLACK, 1, jnp.where(area == B.WHITE, -1, 0))
    score = board_score + rules.komi + pos.white_bonus + button
    # ownership output convention: +1 black / -1 white (as the old
    # area_score_tromp_taylor did), for the selfplay data writer
    return own.astype(jnp.int32), score


def final_score(gs: GameState, size: int) -> tuple[jax.Array, jax.Array]:
    return final_score_pos(gs.pos, gs.rules, size)


# Backward-compatible names (pre-territory-scoring API)
final_score_area = final_score
final_score_area_pos = final_score_pos
