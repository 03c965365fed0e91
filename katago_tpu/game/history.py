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

Game end (area scoring): two consecutive passes end the game; score is
Tromp-Taylor area + komi + white handicap bonus, with button-Go's 0.5
awarded to the first passer when enabled. Territory scoring / encore phases
(boardhistory.h:66-90) are a later milestone.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import rules as R
from katago_tpu.game import zobrist
from katago_tpu.utils.segment_ops import segment_xor


class RulesArr(NamedTuple):
    """Per-game dynamic rules, so one compiled program plays mixed rules."""
    ko_rule: jax.Array            # int32: R.KO_*
    scoring_rule: jax.Array       # int32: R.SCORING_*
    tax_rule: jax.Array           # int32: R.TAX_*
    multi_suicide: jax.Array      # bool
    has_button: jax.Array         # bool
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
            komi=jnp.float32(komi),
        )


class PosState(NamedTuple):
    """One position + per-position bookkeeping; storable per search node."""
    board: B.BoardState           # stones, ko_loc, pos_hash
    to_move: jax.Array            # int32 1/2
    move_num: jax.Array           # int32
    consec_passes: jax.Array      # int32
    button_taken: jax.Array       # bool
    button_for: jax.Array         # int32 0/1/2
    game_over: jax.Array          # bool
    recent_moves: jax.Array       # int32[5], most recent first, NN=pass, -1=none


class GameState(NamedTuple):
    pos: PosState
    rules: RulesArr
    ko_hash_hist: jax.Array       # uint32[MAX_HIST, 2]
    hist_len: jax.Array           # int32 (number of valid entries)

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


def replace_pos(gs: GameState, **kw) -> GameState:
    """Replace PosState fields through the GameState wrapper (tests, setup)."""
    return gs._replace(pos=gs.pos._replace(**kw))


def _ko_hash(pos_hash: jax.Array, to_move_next: jax.Array,
             ko_rule: jax.Array) -> jax.Array:
    """Hash used for superko comparisons, per ko rule."""
    zpl = jnp.asarray(zobrist.player_table())  # uint32[2,2]
    situational = ko_rule == R.KO_SITUATIONAL
    return jnp.where(situational, pos_hash ^ zpl[to_move_next - 1], pos_hash)


def new_pos(size: int) -> PosState:
    return PosState(
        board=B.empty_board(size),
        to_move=jnp.int32(B.BLACK),
        move_num=jnp.int32(0),
        consec_passes=jnp.int32(0),
        button_taken=jnp.bool_(False),
        button_for=jnp.int32(0),
        game_over=jnp.bool_(False),
        recent_moves=jnp.full((5,), -1, jnp.int32),
    )


def new_game(size: int, rules: RulesArr, max_hist: int) -> GameState:
    pos = new_pos(size)
    hist = jnp.zeros((max_hist, 2), jnp.uint32)
    # record the empty starting position (black to move)
    h0 = _ko_hash(pos.board.pos_hash, jnp.int32(B.BLACK), rules.ko_rule)
    hist = hist.at[0].set(h0)
    return GameState(pos=pos, rules=rules, ko_hash_hist=hist,
                     hist_len=jnp.int32(1))


def step_pos(pos: PosState, rules: RulesArr, loc: jax.Array,
             size: int) -> tuple[PosState, B.MoveInfo, jax.Array]:
    """Play loc (NN = pass) for the player to move; assumed legal.

    History-free core of `step`: returns the new position, move info, and
    the new position's ko-hash (for the caller to record / check).
    Stepping a finished game is a no-op (masked) so lockstep batches can
    keep stepping until all games end.
    """
    nn = size * size
    was_over = pos.game_over
    loc_eff = jnp.where(was_over, jnp.int32(nn), loc)
    player = pos.to_move

    new_board, info = B.play_move(pos.board, loc_eff, player, size)

    is_pass = info.is_pass
    consec = jnp.where(is_pass, pos.consec_passes + 1, 0)

    # button go (area scoring): first pass claims the 0.5-point button
    claims_button = (rules.has_button &
                     (rules.scoring_rule == R.SCORING_AREA) &
                     is_pass & ~pos.button_taken & ~was_over)
    button_taken = pos.button_taken | claims_button
    button_for = jnp.where(claims_button, player, pos.button_for)

    game_over = was_over | (consec >= 2)
    opp = B.opponent(player)
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
    )
    hk = _ko_hash(new_pos_state.board.pos_hash, new_pos_state.to_move,
                  rules.ko_rule)
    return new_pos_state, info, hk


def step(gs: GameState, loc: jax.Array, size: int) -> tuple[GameState, B.MoveInfo]:
    """Play loc (NN = pass); appends the new position hash to the history."""
    was_over = gs.pos.game_over
    pos2, info, hk = step_pos(gs.pos, gs.rules, loc, size)
    max_hist = gs.ko_hash_hist.shape[0]
    write_idx = jnp.minimum(gs.hist_len, max_hist - 1)
    hist = gs.ko_hash_hist.at[write_idx].set(
        jnp.where(was_over, gs.ko_hash_hist[write_idx], hk))
    hist_len = jnp.where(was_over, gs.hist_len,
                         jnp.minimum(gs.hist_len + 1, max_hist))
    return GameState(pos=pos2, rules=gs.rules, ko_hash_hist=hist,
                     hist_len=hist_len), info


def legal_moves(gs: GameState, size: int) -> jax.Array:
    """bool[NN+1] full legality for the player to move, incl. superko.

    Index NN is pass (always legal while the game is live). Mirrors
    BoardHistory::isLegal (reference boardhistory.cpp): basic board
    legality, then ko-hash recurrence per ko rule. SPIGHT is treated as
    SITUATIONAL for now (spight's pass-hash subtleties come with the
    encore milestone).
    """
    nn = size * size
    neigh = jnp.asarray(B.neighbor_table(size))
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
    own_keys = jnp.where((stones != B.EMPTY)[:, None], own_keys, 0)
    chain_key = segment_xor(own_keys, labels, nn)  # uint32[NN, 2]

    spad = B._pad(stones, B.WALL)
    lpad = B._pad(labels, jnp.int32(nn))
    libspad = B._pad(libs, 0)
    nbr_s = spad[neigh]        # [NN,4]
    nbr_lab = lpad[neigh]
    nbr_libs = libspad[neigh]

    def xor_adjacent_chains(match: jax.Array) -> jax.Array:
        """XOR chain keys of distinct neighbor chains where match[NN,4]."""
        cand = jnp.where(match, nbr_lab, nn)
        for k in range(1, 4):
            dup = jnp.zeros_like(cand[:, k], dtype=bool)
            for j in range(k):
                dup = dup | (cand[:, k] == cand[:, j])
            cand = cand.at[:, k].set(jnp.where(dup, nn, cand[:, k]))
        ckpad = jnp.concatenate([chain_key, jnp.zeros((1, 2), jnp.uint32)])
        keys = ckpad[cand]                      # [NN,4,2]
        return keys[:, 0] ^ keys[:, 1] ^ keys[:, 2] ^ keys[:, 3]

    # captures: adjacent opp chains in atari
    delta_cap = xor_adjacent_chains((nbr_s == opp) & (nbr_libs == 1))

    # legal multi-stone suicide: all own adjacent chains die with the stone
    has_empty_nbr = jnp.any(nbr_s == B.EMPTY, axis=1)
    own_safe = jnp.any((nbr_s == player) & (nbr_libs >= 2), axis=1)
    captures_any = jnp.any((nbr_s == opp) & (nbr_libs == 1), axis=1)
    own_any = jnp.any(nbr_s == player, axis=1)
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

    use_superko = (gs.rules.ko_rule == R.KO_POSITIONAL) | \
                  (gs.rules.ko_rule == R.KO_SITUATIONAL) | \
                  (gs.rules.ko_rule == R.KO_SPIGHT)
    legal = basic & ~(use_superko & repeats)
    legal = legal & ~gs.game_over
    # pass always legal while game is live
    return jnp.concatenate([legal, (~gs.game_over)[None]])


def final_score_area(gs: GameState, size: int) -> tuple[jax.Array, jax.Array]:
    """(ownership int32[NN], white_minus_black float32) under area scoring.

    Sign convention matches the reference's finalWhiteMinusBlackScore
    (boardhistory.h): positive means white wins. Komi (already including any
    handicap bonus) is added to white; the button adds 0.5 to its claimant.
    Tax rules require pass-alive analysis and join the Benson milestone.
    """
    own, black_minus_white = B.area_score_tromp_taylor(gs.board.stones, size)
    score = -black_minus_white + gs.rules.komi
    button = jnp.where(gs.button_taken,
                       jnp.where(gs.button_for == B.WHITE, 0.5,
                                 jnp.where(gs.button_for == B.BLACK, -0.5, 0.0)),
                       0.0)
    return own, score + button


def final_score_area_pos(pos: PosState, rules: RulesArr,
                         size: int) -> tuple[jax.Array, jax.Array]:
    """History-free final scoring for search-node positions."""
    own, black_minus_white = B.area_score_tromp_taylor(pos.board.stones, size)
    score = -black_minus_white + rules.komi
    button = jnp.where(pos.button_taken,
                       jnp.where(pos.button_for == B.WHITE, 0.5,
                                 jnp.where(pos.button_for == B.BLACK, -0.5, 0.0)),
                       0.0)
    return own, score + button
