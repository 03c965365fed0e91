"""Selfplay driver: batched MCTS games producing training data.

Replaces cpp/command/selfplay.cpp + cpp/program/play.cpp's thread-per-game
architecture: here a whole batch of games advances one move per iteration
in lockstep — each move runs one batched array-MCTS (every NN eval inside
the search is a [G]-batch), then all games step their chosen moves.

Data recording mirrors the reference's FinishedGameData rows
(dataio/trainingwrite.h:183-290 schema, minimum slice): per position the
V7 features, the root visit-distribution policy target, the side to move;
per game the final winner/score and final ownership, broadcast back over
the game's positions at the end (value/ownership targets come from the
game result, as in Play::runGame).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import features as F
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams


@dataclasses.dataclass
class GameBatchData:
    """Host-side recorded training rows for a finished batch of games."""
    spatial: np.ndarray        # [rows, N, N, 22] f32
    global_in: np.ndarray      # [rows, 19] f32
    policy_target: np.ndarray  # [rows, NN+1] f32 (normalized visit dist)
    to_move: np.ndarray        # [rows] i32
    value_target: np.ndarray   # [rows, 3] f32 (win/loss/noresult, mover persp)
    score_target: np.ndarray   # [rows] f32 (mover perspective final score)
    ownership_target: np.ndarray  # [rows, NN] f32 (+1 mover, -1 opp)
    game_idx: np.ndarray       # [rows] i32
    move_num: np.ndarray       # [rows] i32
    mcts_winloss_white: np.ndarray  # [rows] f32 root MCTS winloss (white persp)
    mcts_lead_white: np.ndarray     # [rows] f32 root MCTS lead (white persp)
    visits: np.ndarray              # [rows] i32 search visits for the row

    def to_npz_arrays(self, size: int, final_score_white: np.ndarray) -> dict:
        """Reference-schema arrays (dataio.trainingwrite.pack_rows), with
        next-turn policy and td-value targets derived across each game."""
        from katago_tpu.dataio import trainingwrite as TW

        n = self.spatial.shape[0]
        area = size * size
        is_white = (self.to_move == B.WHITE)
        sign = np.where(is_white, 1.0, -1.0)

        # next-turn policy: the following row of the same game
        next_pol = np.zeros_like(self.policy_target)
        same_game_next = np.zeros(n, bool)
        same_game_next[:-1] = (self.game_idx[:-1] == self.game_idx[1:]) & \
                              (self.move_num[:-1] + 1 == self.move_num[1:])
        next_pol[np.flatnonzero(same_game_next)] = \
            self.policy_target[np.flatnonzero(same_game_next) + 1]

        # td targets per game (white persp), then flip to mover persp
        td = np.zeros((n, 4), np.float32)
        for g in np.unique(self.game_idx):
            rows = np.flatnonzero(self.game_idx == g)
            final_wl = float(np.sign(final_score_white[g]))
            td[rows] = TW.td_value_targets(
                self.mcts_winloss_white[rows], final_wl, area)
        td_mover = td * sign[:, None]

        lead_mover = self.mcts_lead_white * sign
        komi_mover = np.zeros(n, np.float32)  # filled by caller if needed
        return TW.pack_rows(
            spatial=self.spatial, global_in=self.global_in,
            policy_target=self.policy_target, next_policy_target=next_pol,
            value_target=self.value_target, td_targets=td_mover,
            score_target=self.score_target, lead_target=lead_mover,
            ownership_target=self.ownership_target, self_komi=komi_mover,
            turn_idx=self.move_num.astype(np.float32),
            visits=self.visits.astype(np.float32), size=size)


def play_games(model_apply: Callable, model_params: Any, *,
               size: int, num_games: int, visits: int,
               rules: R.Rules | None = None,
               search_params: SearchParams | None = None,
               max_moves: int | None = None,
               rng: jax.Array | None = None,
               record: bool = True) -> tuple[GameBatchData | None, dict]:
    """Play a batch of selfplay games to completion. Returns recorded data
    and summary stats (moves, scores, winners)."""
    nn = size * size
    rules = rules or R.Rules.tromp_taylorish()
    sp = (search_params or SearchParams.for_selfplay()).to_arr()
    max_moves = max_moves or int(nn * 1.6) + 20
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    gs = H.new_game(size, H.RulesArr.from_rules(rules), max_hist=max_moves + 8)
    games = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_games,) + x.shape).copy(), gs)

    search_fn = jax.jit(lambda roots, key: mcts.run_search(
        model_apply, model_params, roots, sp, key, size=size,
        num_sims=visits, max_nodes=visits + 3))
    choose_fn = jax.jit(lambda res, mn, key: mcts.choose_moves(res, sp, mn, key))
    step_fn = jax.jit(jax.vmap(H.step, in_axes=(0, 0, None)), static_argnums=2)
    feat_fn = jax.jit(jax.vmap(F.fill_features_v7, in_axes=(0, None, None)),
                      static_argnums=1)
    score_fn = jax.jit(jax.vmap(H.final_score_area, in_axes=(0, None)),
                       static_argnums=1)

    feat_params = F.FeatureParams(
        draw_equiv_wins_for_white=sp.draw_equivalent_wins_for_white,
        playout_doubling_advantage=sp.playout_doubling_advantage,
        conservative_pass=sp.conservative_pass,
    )

    rows = []  # host-side per-move records
    total_playouts = 0
    for move_i in range(max_moves):
        done = np.asarray(games.pos.game_over)
        if done.all():
            break
        rng, k1, k2 = jax.random.split(rng, 3)
        res = search_fn(games, k1)
        moves = choose_fn(res, games.pos.move_num, k2)
        total_playouts += int((~done).sum()) * visits

        if record:
            sp_feat, gl_feat = feat_fn(games, size, feat_params)
            cvis = np.asarray(res.child_visits, np.float32)
            denom = np.maximum(cvis.sum(axis=1, keepdims=True), 1.0)
            rows.append({
                "spatial": np.asarray(sp_feat, np.float32).reshape(
                    num_games, size, size, F.NUM_SPATIAL_V7),
                "global_in": np.asarray(gl_feat, np.float32),
                "policy_target": cvis / denom,
                "to_move": np.asarray(games.pos.to_move, np.int32),
                "move_num": np.asarray(games.pos.move_num, np.int32),
                "mcts_winloss_white": np.asarray(res.root_winloss, np.float32),
                "mcts_lead_white": np.asarray(res.root_lead, np.float32),
                "live": ~done,
            })
        games, _ = step_fn(games, moves, size)

    own, score_w = score_fn(games, size)
    own = np.asarray(own, np.float32)        # +1 black / -1 white
    score_w = np.asarray(score_w, np.float32)  # white minus black
    stats = {
        "moves_per_game": np.asarray(games.pos.move_num, np.int32),
        "white_minus_black": score_w,
        "white_wins": (score_w > 0).sum(),
        "black_wins": (score_w < 0).sum(),
        "all_finished": bool(np.asarray(games.pos.game_over).all()),
        "total_playouts": total_playouts,
    }
    if not record:
        return None, stats

    # assemble rows with game-outcome targets from the mover's perspective
    out = {k: [] for k in ("spatial", "global_in", "policy_target", "to_move",
                           "value_target", "score_target", "ownership_target",
                           "game_idx", "move_num", "mcts_winloss_white",
                           "mcts_lead_white", "visits")}
    for rec in rows:
        live = rec["live"]
        idxs = np.flatnonzero(live)
        if len(idxs) == 0:
            continue
        tm = rec["to_move"][idxs]
        is_white = (tm == B.WHITE).astype(np.float32)
        sw = score_w[idxs]
        score_mover = np.where(is_white > 0, sw, -sw)
        win = (score_mover > 0).astype(np.float32)
        loss = (score_mover < 0).astype(np.float32)
        draw = 1.0 - win - loss
        value_t = np.stack([win + 0.5 * draw, loss + 0.5 * draw,
                            np.zeros_like(win)], axis=-1)
        own_mover = np.where(is_white[:, None] > 0, -own[idxs], own[idxs])
        out["spatial"].append(rec["spatial"][idxs])
        out["global_in"].append(rec["global_in"][idxs])
        out["policy_target"].append(rec["policy_target"][idxs])
        out["to_move"].append(tm)
        out["value_target"].append(value_t)
        out["score_target"].append(score_mover)
        out["ownership_target"].append(own_mover)
        out["game_idx"].append(idxs.astype(np.int32))
        out["move_num"].append(rec["move_num"][idxs])
        out["mcts_winloss_white"].append(rec["mcts_winloss_white"][idxs])
        out["mcts_lead_white"].append(rec["mcts_lead_white"][idxs])
        out["visits"].append(np.full(len(idxs), visits, np.int32))

    data = GameBatchData(**{k: np.concatenate(v, axis=0) for k, v in out.items()})
    return data, stats
