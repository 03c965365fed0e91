"""GTP engine — the interactive-play API surface (reference cpp/command/gtp.cpp).

Speaks standard GTP plus the reference's kata-* extensions
(/root/reference/docs/GTP_Extensions.md): rules get/set, kata-raw-nn,
streaming kata-analyze / lz-analyze (interval info lines with multi-move
PVs and ownership, interrupted by the next command), the
genmove_analyze family, time-managed search via the chunked
SearchDriver, pondering (AsyncSearch between moves), and resignation.
Drives the batched array-MCTS with batch size 1; board-size changes
recompile (cached per size).

Usage: python -m katago_tpu.cli.gtp -model <path.bin.gz> [-config <cfg>]
       [-override-config k=v,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import select
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search import mcts
from katago_tpu.search import timecontrols as TC
from katago_tpu.search.driver import AsyncSearch, SearchDriver
from katago_tpu.search.params import SearchParams
from katago_tpu.utils.config_parser import ConfigParser

GTP_COLS = "ABCDEFGHJKLMNOPQRSTUVWXYZ"  # no I

KNOWN_COMMANDS = [
    "protocol_version", "name", "version", "known_command", "list_commands",
    "quit", "boardsize", "rectangular_boardsize", "clear_board", "komi",
    "get_komi", "kata-get-komi", "play", "genmove", "undo", "showboard",
    "final_score",
    "final_status_list", "fixed_handicap", "place_free_handicap",
    "set_free_handicap", "time_settings", "time_left",
    "kgs-time_settings", "kgs-rules", "cputime", "gomill-cpu_time",
    "kata-get-rules", "kata-set-rules", "kata-set-rule", "kata-get-param",
    "kata-set-param", "kata-get-params", "kata-set-params",
    "kata-list-params", "kata-get-models",
    "kata-raw-nn", "kata-raw-human-nn", "kata-analyze", "lz-analyze",
    "genmove_analyze", "lz-genmove_analyze", "kata-genmove_analyze",
    "genmove_debug",
    "kata-search", "kata-search_cancellable", "kata-search_debug",
    "kata-search_analyze", "kata-search_analyze_cancellable",
    "clear_cache", "loadsgf", "printsgf", "showboard", "kata-benchmark",
    "kata-time_settings", "kata-list-time-settings",
    "kata-list_time_settings", "kata-set-position",
    "set_position", "stop", "debug_moves",
]


def loc_to_gtp(loc: int, size: int, x_size: int | None = None,
               y_size: int | None = None) -> str:
    """Rect boards embed at rows 0..y_size-1 / cols 0..x_size-1 of the
    square grid; vertex row numbers count from the rect's bottom."""
    ys = y_size or size
    if loc >= size * size:
        return "pass"
    x, y = loc % size, loc // size
    return f"{GTP_COLS[x]}{ys - y}"


def gtp_to_loc(s: str, size: int, x_size: int | None = None,
               y_size: int | None = None) -> int:
    xs = x_size or size
    ys = y_size or size
    s = s.strip().upper()
    if s in ("PASS", "RESIGN"):
        return size * size
    col = GTP_COLS.index(s[0])
    row = int(s[1:])
    y = ys - row
    if not (0 <= col < xs and 0 <= y < ys):
        raise ValueError(f"vertex {s} off board")
    return y * size + col


class GTPEngine:
    def __init__(self, model_path: str | None = None, size: int = 19,
                 rules: R.Rules | None = None, visits: int = 100,
                 search_params: SearchParams | None = None,
                 allow_resignation: bool = False,
                 resign_threshold: float = -0.90,
                 resign_consec_turns: int = 3,
                 ponder: bool = False,
                 anti_mirror: bool = True,
                 human_sl_profile: str | None = None,
                 ladder_mode: str = "chase"):
        self.size = size
        self.x_size = size
        self.y_size = size
        self.rules = rules or R.Rules.tromp_taylorish()
        self.visits = visits
        base = search_params or SearchParams(
            root_noise_enabled=False, cpuct_exploration=1.0,
            cpuct_exploration_log=0.45,
            static_score_utility_factor=0.1,
            dynamic_score_utility_factor=0.3,
            use_lcb_for_selection=True,
            # setup.cpp defaults for GTP/analysis (setup.cpp:589,641)
            root_symmetry_pruning=True,
            root_ending_bonus_points=0.5,
            root_prune_useless_moves=True)
        self.search_params = base
        # in-search leaf ladder featurization: "chase" (exact board
        # mechanics, greedy policy — the throughput default) or "exact"
        # (reference-semantics backtracking solver). Per-move data paths
        # (kata-raw-nn, writetrainingdata) always use the exact solver;
        # this knob covers the train/inference input mismatch the chase
        # approximation introduces on branchy multi-ladder positions.
        self.ladder_mode = ladder_mode
        self._drivers: dict[tuple, SearchDriver] = {}
        self._rng = jax.random.PRNGKey(int(time.time() * 1000) % (2**31))
        # per-player clocks (None = visit-limited); GTP lag buffer seconds
        self.time_controls: dict[int, TC.TimeControls | None] = {
            B.BLACK: None, B.WHITE: None}
        self.lag_buffer = 1.0
        # resignation (gtp.cpp:276-324: recent winloss below the threshold
        # for resignConsecTurns consecutive own turns, and not too early)
        self.allow_resignation = allow_resignation
        self.resign_threshold = resign_threshold
        self.resign_consec_turns = resign_consec_turns
        self.resign_min_moves_per_board_area = 0.4
        self._recent_winloss: list[tuple[int, float]] = []  # (player, wl)
        # pondering (asyncbot.h ponder after each genmove)
        self.ponder_enabled = ponder
        self._ponder: AsyncSearch | None = None
        # anti-mirror countering (searchParams.antiMirror, on by default
        # like gtp_example.cfg; detection reruns before every search)
        self.anti_mirror = anti_mirror

        # humanSL profile conditioning (humanSLProfile config): evals of
        # a metadata-encoder net are conditioned on a named rank/pro
        # profile's 192-float row (models/sgfmetadata.py)
        self.sgf_meta = None
        if human_sl_profile:
            from katago_tpu.models.sgfmetadata import get_profile
            self.sgf_meta = get_profile(human_sl_profile)
        if model_path:
            from katago_tpu.models import desc as D
            self.desc = D.load_model(model_path)
            if self.sgf_meta is not None:
                if self.desc.trunk.get("meta_encoder") is None:
                    raise ValueError(
                        "humanSLProfile requires a metadata-encoder net")
                net = self.desc
                self.model_apply = (
                    lambda p, sp_, gl_, metadata=None:
                    D.apply_desc_model(net, sp_, gl_, metadata=metadata))
            else:
                self.model_apply = D.make_desc_apply(self.desc)
            self.model_name = self.desc.name
        else:
            from katago_tpu.models import config as MC
            from katago_tpu.models.model import KataGoModel
            cfg = MC.get_config("b2c16")
            model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
            params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, size, size, 22)),
                                jnp.zeros((1, 19)))
            self.model_apply = lambda p, s, g: model.apply(params, s, g)
            self.model_name = "random-init-b2c16"
            self.desc = None
        self.clear_board()

    # -- game state -------------------------------------------------------

    def clear_board(self):
        self.stop_ponder()
        max_hist = 2 * self.size * self.size + 64
        shape = None
        if self.x_size != self.size or self.y_size != self.size:
            import numpy as _np
            m = _np.zeros((self.size, self.size), bool)
            m[:self.y_size, :self.x_size] = True
            shape = jnp.asarray(m.reshape(-1))
        self.gs = H.new_game(self.size, H.RulesArr.from_rules(self.rules),
                             max_hist, shape_mask=shape)
        self.history: list = [self.gs]
        self.moves: list[tuple[int, int]] = []
        self._reuse_tree = None   # Search::makeMove-style tree carry-over
        self._recent_winloss = []

    def set_size(self, size: int, y_size: int | None = None):
        """Square or rectangular (board.h:14-16): a rect board plays on
        the max(x,y)-square engine grid with WALL-filled off-board rows
        (see H.new_pos shape_mask)."""
        self.x_size = size
        self.y_size = y_size or size
        self.size = max(self.x_size, self.y_size)
        self.clear_board()

    def set_rules(self, rules: R.Rules):
        """Change rules/komi mid-game, preserving the position (the
        reference allows komi and rule changes without clearing)."""
        self.rules = rules
        rarr = H.RulesArr.from_rules(rules)
        self.gs = self.gs._replace(rules=rarr)
        self.history = [g._replace(rules=rarr) for g in self.history]

    def play(self, player: int, loc: int):
        self.stop_ponder()
        gs = H.replace_pos(self.gs, to_move=jnp.int32(player))
        legal = np.asarray(H.legal_moves(gs, self.size))
        if not legal[min(loc, self.size * self.size)]:
            raise ValueError("illegal move")
        self.gs, _ = H.step(gs, jnp.int32(loc), self.size)
        self.history.append(self.gs)
        self.moves.append((player, loc))
        # incrementally re-root the carried search tree at the played move
        if self._reuse_tree is not None:
            self._reuse_tree = jax.jit(jax.vmap(mcts.extract_subtree))(
                self._reuse_tree, jnp.asarray([loc], jnp.int32))

    def undo(self):
        self.stop_ponder()
        if len(self.history) <= 1:
            raise ValueError("cannot undo")
        self.history.pop()
        self.moves.pop()
        self.gs = self.history[-1]
        self._reuse_tree = None   # re-rooting cannot go backwards

    # -- search ------------------------------------------------------------

    def _get_driver(self) -> SearchDriver:
        max_nodes = 2 * self.visits + 8   # roomy pool so reuse retains value
        key = (self.size, max_nodes)
        if key not in self._drivers:
            self._drivers[key] = SearchDriver(
                self.model_apply, None, self.search_params.to_arr(),
                size=self.size, max_nodes=max_nodes,
                chunk_size=max(4, min(32, self.visits // 4)),
                sgf_meta=self.sgf_meta,
                ladder_mode=self.ladder_mode,
                root_num_symmetries=self.search_params.root_num_symmetries,
                feature_version=(self.desc.input_version
                                 if self.desc is not None else 7))
        return self._drivers[key]

    def _mirror_arrs(self, root_pla: int):
        """Host-side anti-mirror detection over this game's move history
        (Search::updateMirroring); None when off or not mirroring, so the
        mirror-free search executable is reused."""
        if not self.anti_mirror or len(self.moves) < 14:
            return None
        from katago_tpu.search import mirror as MIR
        moves = [loc for _, loc in self.moves]
        plas = [p for p, _ in self.moves]
        stones = np.asarray(self.gs.pos.board.stones)
        mirroring, adv, err = MIR.detect_game(
            moves, plas, root_pla=root_pla, stones=stones,
            komi=self.rules.komi,
            scoring_area=self.rules.scoring_rule == R.SCORING_AREA,
            size=self.size)
        if not mirroring:
            return None
        return MIR.MirrorArrs(
            mirroring=jnp.asarray([True]),
            mirror_pla=jnp.asarray([3 - root_pla], jnp.int32),
            advantage=jnp.asarray([adv], jnp.float32),
            center_err=jnp.asarray([err], jnp.float32))

    def _pattern_bonus_arrs(self, root_pla: int):
        """avoidRepeatedPatternUtility table from this game's own moves
        (search.cpp:715-727); None when off (table stays compiled out)."""
        u = self.search_params.avoid_repeated_pattern_utility
        if u == 0.0 or not self.moves:
            return None
        from katago_tpu.search import patternbonus as PB
        boards_before = [np.asarray(g.pos.board.stones)
                         for g in self.history[:-1]]
        moves = [loc for _, loc in self.moves]
        plas = [p for p, _ in self.moves]
        return PB.build_avoid_repeat_table(boards_before, moves, plas,
                                           self.size, root_pla, u)

    def search_root(self, player: int, visits: int | None = None,
                    max_time: float | None = None,
                    time_rec: float | None = None,
                    time_max: float | None = None,
                    callback=None, callback_interval: float = 1.0,
                    should_stop=None, root_allowed_mask=None):
        self.stop_ponder()
        visits = visits or self.visits
        gs = H.replace_pos(self.gs, to_move=jnp.int32(player))
        roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(), gs)
        self._rng, sub = jax.random.split(self._rng)
        driver = self._get_driver()
        prev = self._reuse_tree
        if prev is not None and not (prev.visits.shape[1] <=
                                     driver.max_nodes and
                                     int(prev.num_nodes[0]) > 0):
            prev = None
        # pattern bonus: reuse would keep a playout distribution matched to
        # the other side's penalties — clear on player change
        # (search.cpp:684-686)
        if (self.search_params.avoid_repeated_pattern_utility != 0
                and self.last_search_player not in (None, player)):
            prev = None
        if root_allowed_mask is not None:
            root_allowed_mask = jnp.asarray(root_allowed_mask)[None, :]
        res = driver.search(roots, sub, max_visits=visits,
                            root_allowed_mask=root_allowed_mask,
                            max_time=max_time, prev_tree=prev,
                            time_rec=time_rec, time_max=time_max,
                            turn_number=len(self.moves),
                            host_params=self.search_params,
                            callback=callback,
                            callback_interval=callback_interval,
                            should_stop=should_stop,
                            mirror=self._mirror_arrs(player),
                            pattern_bonus=self._pattern_bonus_arrs(player))
        self._reuse_tree = res.ss.tree
        self.last_search_result = res
        self.last_search_player = player
        return res

    def genmove(self, player: int, callback=None,
                callback_interval: float = 1.0) -> int | None:
        """Search and play. Returns the move, or None for resign
        (gtp.cpp:276-324 resignation conditions)."""
        tc = self.time_controls[player]
        max_time = None
        time_rec = time_max = None
        if tc is not None and not tc.is_effectively_unlimited():
            st = np.asarray(self.gs.pos.board.stones)
            stones = int(((st == B.BLACK) | (st == B.WHITE)).sum())
            _, rec, max_t = tc.get_time(self.x_size * self.y_size, stones,
                                        lag_buffer=self.lag_buffer)
            # dynamic time management (recomputeSearchTimeLimit): the
            # driver refines the planned limit between chunks
            time_rec, time_max = rec, max_t
        t0 = time.time()
        res = self.search_root(player, visits=self.visits,
                               time_rec=time_rec, time_max=time_max,
                               max_time=max_time, callback=callback,
                               callback_interval=callback_interval)
        dt = max(time.time() - t0, 1e-3)
        cv = np.asarray(res.child_visits[0])
        loc = int(cv.argmax())

        # resignation: expected winloss (mover persp) below threshold for
        # the last resign_consec_turns of this player's turns, not too
        # early in the game
        wl_white = float(np.asarray(res.root_winloss[0]))
        wl_mover = wl_white if player == B.WHITE else -wl_white
        self._recent_winloss.append((player, wl_mover))
        if self._should_resign(player):
            return None
        self.play(player, loc)
        if self.time_controls[player] is not None:
            tc = self.time_controls[player]
            if not tc.in_overtime:
                tc.main_time_left -= dt
                tc.main_time_left += tc.increment
        self.maybe_start_ponder()
        return loc

    def _should_resign(self, player: int) -> bool:
        if not self.allow_resignation:
            return False
        min_turns = self.resign_min_moves_per_board_area * \
            self.size * self.size
        if len(self.moves) < min_turns:
            return False
        own = [wl for p, wl in self._recent_winloss if p == player]
        if len(own) < self.resign_consec_turns:
            return False
        return all(wl < self.resign_threshold
                   for wl in own[-self.resign_consec_turns:])

    # -- pondering ---------------------------------------------------------

    def maybe_start_ponder(self):
        """Background search on the current position (opponent to move) —
        AsyncBot::ponder (asyncbot.h:84)."""
        if not self.ponder_enabled or self._ponder is not None:
            return
        roots = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(), self.gs)
        self._rng, sub = jax.random.split(self._rng)
        driver = self._get_driver()
        prev = self._reuse_tree
        if prev is not None and int(prev.num_nodes[0]) == 0:
            prev = None
        self._ponder = AsyncSearch(driver, roots, sub,
                                   max_visits=4 * self.visits,
                                   prev_tree=prev)

    def stop_ponder(self):
        if self._ponder is not None:
            ponder, self._ponder = self._ponder, None
            res = ponder.stop()
            if res is not None:
                self._reuse_tree = res.ss.tree

    last_search_result = None
    last_search_player: int | None = None

    def debug_moves_str(self, branch: list[int],
                        raw_stats: bool = False) -> str:
        """debug_moves (gtp.cpp:3612-3658): the board after a branch of
        moves from the current position, plus the last search tree's
        one-level child statistics at that branch node (printTree with
        maxDepth 1); `rawstats` appends symmetry-averaged raw NN values
        of the branch position (rawNNBrief)."""
        gs = self.gs
        pla = int(gs.pos.to_move)
        for loc in branch:
            gs = H.replace_pos(gs, to_move=jnp.int32(pla))
            gs, _ = H.step(gs, jnp.int32(loc), self.size)
            pla = B.BLACK if pla == B.WHITE else B.WHITE
        lines = [B.board_to_string(np.asarray(gs.pos.board.stones),
                                   self.size)]

        tree = self._reuse_tree
        node = 0
        in_tree = tree is not None and int(tree.num_nodes[0]) > 0
        if in_tree:
            children = np.asarray(tree.children[0])
            for loc in branch:
                nxt = int(children[node, loc])
                if nxt < 0:
                    in_tree = False
                    break
                node = nxt
        if not in_tree:
            lines.append("(branch not in last search tree)")
            if not raw_stats:
                return "\n".join(lines)
        else:
            visits = np.asarray(tree.visits[0])
            weight = np.asarray(tree.weight_sum[0])
            wl = np.asarray(tree.winloss_sum[0])
            sc = np.asarray(tree.score_mean_sum[0])
            prior = np.asarray(tree.policy[0, node], np.float32)
            w0 = max(float(weight[node]), 1e-9)
            lines.append(
                f"root visits {int(visits[node])} "
                f"winrate {0.5 * (1 + float(wl[node]) / w0):.4f} "
                f"scoreMean {float(sc[node]) / w0:.2f}")
            ch = children[node]
            cv = np.where(ch >= 0, visits[np.maximum(ch, 0)], 0)
            for a in np.argsort(cv)[::-1]:
                if cv[a] <= 0:
                    break
                c = int(ch[a])
                w = max(float(weight[c]), 1e-9)
                lines.append(
                    f"{loc_to_gtp(int(a), self.size, self.x_size, self.y_size)}"
                    f" : visits {int(cv[a])}"
                    f" winrate {0.5 * (1 + float(wl[c]) / w):.4f}"
                    f" scoreMean {float(sc[c]) / w:.2f}"
                    f" prior {max(float(prior[a]), 0.0):.4f}")
        if raw_stats:
            # symmetry-averaged raw values (rawNNBrief, SYMMETRY_ALL)
            from katago_tpu.models import features as F
            from katago_tpu.ops import symmetry as SYM
            fp = F.FeatureParams.default()
            spf, glf = F.fill_features_v7(gs, self.size, fp)
            nn = self.size * self.size
            wins, scores = [], []
            for sym in range(8):
                sp_s = SYM.transform_spatial(
                    jnp.asarray(spf).reshape(nn, -1), jnp.int32(sym),
                    self.size)
                raw = self.model_apply(
                    None, sp_s.reshape(1, self.size, self.size, -1),
                    jnp.asarray(glf).reshape(1, -1))
                v = np.asarray(jax.nn.softmax(raw["value_logits"][0]))
                wins.append(float(v[0] - v[1]))
                scores.append(float(raw["miscvalue"][0][0]) * 20.0)
            lines.append(f"raw winloss {np.mean(wins):+.4f} "
                         f"+/- {np.std(wins):.4f} "
                         f"raw score {np.mean(scores):+.2f} "
                         f"+/- {np.std(scores):.2f} (8 symmetries)")
        return "\n".join(lines)

    def analyze_info(self, res, top_k: int = 10, pv_len: int = 12,
                     include_ownership: bool = False,
                     player: int | None = None,
                     min_moves: int = 1,
                     include_pv_visits: bool = False,
                     include_root_info: bool = False,
                     include_ownership_stdev: bool = False) -> str:
        """kata-analyze info lines from a SearchResult (batch idx 0), with
        greedy-descent PVs per candidate (searchresults.cpp appendPV) and
        optional tree-averaged ownership. Device arrays are pulled once per
        call (not per child) to keep host syncs O(1)."""
        cv = np.asarray(res.child_visits[0])
        prior = np.asarray(res.root_policy_prior[0])
        tree = res.ss.tree
        children = np.asarray(tree.children[0])          # [N, A]
        visits = np.asarray(tree.visits[0])              # [N]
        weight = np.asarray(tree.weight_sum[0])
        util_sum = np.asarray(tree.utility_sum[0])
        wl_sum = np.asarray(tree.winloss_sum[0])
        sc_sum = np.asarray(tree.score_mean_sum[0])
        # rank by visits, prior-tiebroken (minmoves padding then walks
        # legal unvisited moves in prior order; illegal sink to the end)
        order = np.lexsort((prior, cv))[::-1]
        if player is None:
            player = int(self.gs.pos.to_move)
        infos = []

        def pv_from(node: int, first_move: int):
            moves = [first_move]
            vis = [int(visits[node])]
            for _ in range(pv_len - 1):
                ch = children[node]
                valid = ch >= 0
                w = np.where(valid, visits[np.maximum(ch, 0)], -1)
                a = int(w.argmax())
                if w[a] <= 0:
                    break
                moves.append(a)
                node = int(ch[a])
                vis.append(int(visits[node]))
            return moves, vis

        # minmoves: pad the report with 0-visit prior-ranked moves
        # (GTP_Extensions.md kata-analyze minmoves)
        top_k = max(top_k, min_moves)
        for rank, a in enumerate(order[:top_k]):
            if cv[a] <= 0 and rank >= min_moves:
                break
            if cv[a] <= 0 and prior[a] < 0:
                break
            child = int(children[0, a])
            if cv[a] > 0 and child >= 0:
                w = max(float(weight[child]), 1e-9)
                util = float(util_sum[child]) / w
                winloss = float(wl_sum[child]) / w
                score = float(sc_sum[child]) / w
                pv_moves, pv_vis = pv_from(child, int(a))
            else:
                # minmoves-padded unvisited move: root values + prior only
                w0 = max(float(weight[0]), 1e-9)
                util = float(util_sum[0]) / w0
                winloss = float(wl_sum[0]) / w0
                score = float(sc_sum[0]) / w0
                pv_moves, pv_vis = [int(a)], [0]
            if player == B.BLACK:
                util, winloss, score = -util, -winloss, -score
            winrate = 0.5 * (1.0 + winloss)
            pv = " ".join(loc_to_gtp(m, self.size, self.x_size, self.y_size)
                          for m in pv_moves)
            info = (
                f"info move {loc_to_gtp(int(a), self.size, self.x_size, self.y_size)} visits {int(cv[a])} "
                f"utility {util:.6f} winrate {winrate:.6f} "
                f"scoreMean {score:.2f} scoreLead {score:.2f} "
                f"prior {max(prior[a], 0):.6f} order {rank} "
                f"pv {pv}")
            if include_pv_visits:
                info += " pvVisits " + " ".join(str(v) for v in pv_vis)
            infos.append(info)
        out = " ".join(infos)
        if include_root_info:
            # root properties line (GTP_Extensions.md rootInfo) —
            # preferred over summing per-move visits by remote frontends
            rw = max(float(weight[0]), 1e-9)
            rwl = float(np.asarray(res.root_winloss[0]))
            rsc = float(np.asarray(res.root_score_mean[0]))
            rut = float(np.asarray(res.root_utility[0]))
            if player == B.BLACK:
                rwl, rsc, rut = -rwl, -rsc, -rut
            out += (f" rootInfo visits {int(visits[0])} "
                    f"winrate {0.5 * (1.0 + rwl):.6f} "
                    f"scoreMean {rsc:.2f} scoreLead {rsc:.2f} "
                    f"utility {rut:.6f} weight {rw:.2f}")
        if include_ownership:
            own = np.asarray(res.root_ownership[0])       # white persp
            if player == B.BLACK:
                own = -own
            out += " ownership " + " ".join(f"{v:.4f}" for v in own)
        if include_ownership_stdev:
            ostd = np.asarray(res.root_ownership_stdev[0])
            out += " ownershipStdev " + " ".join(f"{v:.4f}" for v in ostd)
        return out

    def param_table(self):
        """kata-get/set-param surface: name -> (getter, setter). A small
        live-tunable subset of the reference's kata-set-param params
        (gtp.cpp kata-set-param; full config keys load at startup via
        utils/setup.py)."""
        def fset(name, conv):
            def set_(v):
                setattr(self, name, conv(v))
            return set_

        def as_bool(v):
            return v if isinstance(v, bool) else str(v).lower() == "true"

        def spget(field):
            return lambda: getattr(self.search_params, field)

        def spset(field, conv):
            # SearchParams ride the compiled searches as traced
            # arguments (SearchDriver.search(sp=...)), so value changes
            # need no recompile — update the live drivers' params in
            # place. Only root_num_symmetries is compiled-in (it is a
            # static loop count); changing it rebuilds the drivers.
            def set_(v):
                self.search_params = dataclasses.replace(
                    self.search_params, **{field: conv(v)})
                if field == "root_num_symmetries":
                    self._drivers.clear()
                else:
                    arr = self.search_params.to_arr()
                    for d in self._drivers.values():
                        d.sp = arr
            return set_

        return {
            "maxVisits": (lambda: self.visits, fset("visits", int)),
            "ponderingEnabled": (lambda: self.ponder_enabled,
                                 fset("ponder_enabled", as_bool)),
            "allowResignation": (lambda: self.allow_resignation,
                                 fset("allow_resignation", as_bool)),
            "resignThreshold": (lambda: self.resign_threshold,
                                fset("resign_threshold", float)),
            "resignConsecTurns": (lambda: self.resign_consec_turns,
                                  fset("resign_consec_turns", int)),
            "lagBuffer": (lambda: self.lag_buffer,
                          fset("lag_buffer", float)),
            "antiMirror": (lambda: self.anti_mirror,
                           fset("anti_mirror", as_bool)),
            # live-tunable search knobs (kata-set-param surface,
            # gtp.cpp; each rebuilds the compiled search)
            "playoutDoublingAdvantage":
                (spget("playout_doubling_advantage"),
                 spset("playout_doubling_advantage", float)),
            "analysisWideRootNoise": (spget("wide_root_noise"),
                                      spset("wide_root_noise", float)),
            "wideRootNoise": (spget("wide_root_noise"),
                              spset("wide_root_noise", float)),
            "rootNoiseEnabled": (spget("root_noise_enabled"),
                                 spset("root_noise_enabled", as_bool)),
            "policyOptimism": (spget("policy_optimism"),
                               spset("policy_optimism", float)),
            "rootPolicyOptimism": (spget("root_policy_optimism"),
                                   spset("root_policy_optimism", float)),
            "chosenMoveTemperature":
                (spget("chosen_move_temperature"),
                 spset("chosen_move_temperature", float)),
            "staticScoreUtilityFactor":
                (spget("static_score_utility_factor"),
                 spset("static_score_utility_factor", float)),
            "dynamicScoreUtilityFactor":
                (spget("dynamic_score_utility_factor"),
                 spset("dynamic_score_utility_factor", float)),
            "cpuctExploration": (spget("cpuct_exploration"),
                                 spset("cpuct_exploration", float)),
            "cpuctExplorationLog": (spget("cpuct_exploration_log"),
                                    spset("cpuct_exploration_log", float)),
            "rootSymmetryPruning": (spget("root_symmetry_pruning"),
                                    spset("root_symmetry_pruning",
                                          as_bool)),
            "rootEndingBonusPoints":
                (spget("root_ending_bonus_points"),
                 spset("root_ending_bonus_points", float)),
            "useLcbForSelection": (spget("use_lcb_for_selection"),
                                   spset("use_lcb_for_selection",
                                         as_bool)),
            "fpuReductionMax": (spget("fpu_reduction_max"),
                                spset("fpu_reduction_max", float)),
            "conservativePass": (spget("conservative_pass"),
                                 spset("conservative_pass", as_bool)),
        }

    def policy_top_move(self, player: int) -> int | None:
        """Raw-policy argmax over legal moves for `player` (the
        placeFreeHandicap placement policy, playutils.cpp)."""
        from katago_tpu.models import features as F
        gs = H.replace_pos(self.gs, to_move=jnp.int32(player))
        legal = H.legal_moves(gs, self.size)
        sp_feat, gl_feat = F.fill_features_v7(gs, self.size,
                                              F.FeatureParams.default(),
                                              legal)
        sp_in = jnp.asarray(sp_feat).reshape(1, self.size, self.size, 22)
        gl_in = jnp.asarray(gl_feat).reshape(1, 19)
        raw = self.model_apply(None, sp_in, gl_in)
        pol = np.asarray(jax.nn.softmax(raw["policy_logits"][0, 0]))
        pol = np.where(np.asarray(legal), pol, -1.0)
        loc = int(pol[:self.size * self.size].argmax())
        if pol[loc] <= 0:
            return None
        return loc

    def raw_nn(self, use_human_profile: bool = False) -> str:
        from katago_tpu.models import features as F
        gs = self.gs
        sp_feat, gl_feat = F.fill_features_v7(gs, self.size,
                                              F.FeatureParams.default())
        sp_in = jnp.asarray(sp_feat).reshape(1, self.size, self.size, 22)
        gl_in = jnp.asarray(gl_feat).reshape(1, 19)
        if use_human_profile:
            # kata-raw-human-nn: condition on the configured humanSL
            # profile's metadata row (gtp.cpp kata-raw-human-nn)
            if self.sgf_meta is None:
                raise ValueError("kata-raw-human-nn requires humanSLProfile")
            from katago_tpu.models.sgfmetadata import fill_metadata_row
            row = jnp.asarray(fill_metadata_row(
                self.sgf_meta,
                next_player_is_white=int(gs.pos.to_move) == B.WHITE,
                board_area=self.size * self.size))[None, :]
            raw = self.model_apply(None, sp_in, gl_in, metadata=row)
        else:
            raw = self.model_apply(None, sp_in, gl_in)
        pol = np.asarray(jax.nn.softmax(raw["policy_logits"][0, 0]))
        val = np.asarray(jax.nn.softmax(raw["value_logits"][0]))
        lines = [f"whiteWin {val[1] if int(gs.pos.to_move)==B.BLACK else val[0]:.6f}",
                 f"whiteLoss {val[0] if int(gs.pos.to_move)==B.BLACK else val[1]:.6f}",
                 f"noResult {val[2]:.6f}",
                 "policy"]
        for y in range(self.size):
            lines.append(" ".join(f"{pol[y*self.size+x]:.6f}"
                                  for x in range(self.size)))
        lines.append(f"policyPass {pol[self.size*self.size]:.6f}")
        return "\n".join(lines)


def run_gtp(engine: GTPEngine, infile=sys.stdin, outfile=sys.stdout,
            logfile=None):
    def respond(msg: str, cmd_id: str, ok: bool = True):
        prefix = "=" if ok else "?"
        head = f"{prefix}{cmd_id}" if cmd_id else prefix
        outfile.write(f"{head} {msg}\n\n")
        outfile.flush()

    def log(s):
        if logfile:
            logfile.write(s + "\n")
            logfile.flush()

    player_of = {"b": B.BLACK, "black": B.BLACK, "w": B.WHITE, "white": B.WHITE}

    for line in infile:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        log(f"<< {line}")
        parts = line.split()
        cmd_id = ""
        if parts[0].isdigit():
            cmd_id = parts[0]
            parts = parts[1:]
        if not parts:
            continue
        cmd, args = parts[0].lower(), parts[1:]
        try:
            if cmd == "protocol_version":
                respond("2", cmd_id)
            elif cmd == "name":
                respond("katago_tpu", cmd_id)
            elif cmd == "version":
                respond(f"0.1.0 ({engine.model_name})", cmd_id)
            elif cmd == "known_command":
                respond("true" if args and args[0] in KNOWN_COMMANDS else "false", cmd_id)
            elif cmd == "list_commands":
                respond("\n".join(sorted(set(KNOWN_COMMANDS))), cmd_id)
            elif cmd == "quit":
                respond("", cmd_id)
                return
            elif cmd in ("boardsize", "rectangular_boardsize"):
                xs = int(args[0])
                ys = int(args[1]) if len(args) > 1 else xs
                if not (2 <= xs <= 19 and 2 <= ys <= 19):
                    respond(f"unacceptable size {xs} {ys}", cmd_id,
                            ok=False)
                    continue
                # re-setting the current size preserves the position
                # (gtp.cpp / tests/gtp/set_boardsize_twice.txt)
                if (xs, ys) != (engine.x_size, engine.y_size):
                    engine.set_size(xs, ys)
                respond("", cmd_id)
            elif cmd == "clear_board":
                engine.clear_board()
                respond("", cmd_id)
            elif cmd == "komi":
                engine.set_rules(R.Rules(**{**engine.rules.__dict__,
                                            "komi": float(args[0])}))
                respond("", cmd_id)
            elif cmd in ("kata-get-komi", "get_komi"):
                respond(str(engine.rules.komi), cmd_id)
            elif cmd in ("cputime", "gomill-cpu_time"):
                respond(f"{time.process_time():.3f}", cmd_id)
            elif cmd == "kgs-rules":
                # chinese | japanese | aga | new_zealand (gtp.cpp:2540);
                # KGS chinese uses positional superko ("chinese-kgs"), and
                # the current komi is preserved (parseRulesWithoutKomi)
                name = args[0].lower().replace("_", "-")
                if name == "chinese":
                    name = "chinese-kgs"
                parsed = R.Rules.parse(name)
                engine.set_rules(dataclasses.replace(
                    parsed, komi=engine.rules.komi))
                respond("", cmd_id)
            elif cmd == "kgs-time_settings":
                kind = args[0].lower()
                def mk_kgs():
                    if kind == "none":
                        return None
                    if kind == "absolute":
                        return TC.TimeControls.absolute_time(float(args[1]))
                    if kind == "byoyomi":
                        # main_time byo_yomi_time byo_yomi_periods
                        return TC.TimeControls.canadian_or_byo_yomi_time(
                            float(args[1]), float(args[2]), int(args[3]), 1)
                    if kind == "canadian":
                        return TC.TimeControls.canadian_or_byo_yomi_time(
                            float(args[1]), float(args[2]), 1, int(args[3]))
                    raise ValueError(f"unknown kgs time kind {kind}")
                engine.time_controls[B.BLACK] = mk_kgs()
                engine.time_controls[B.WHITE] = mk_kgs()
                respond("", cmd_id)
            elif cmd == "play":
                player = player_of[args[0].lower()]
                loc = gtp_to_loc(args[1], engine.size, engine.x_size, engine.y_size)
                engine.play(player, loc)
                respond("", cmd_id)
            elif cmd == "undo":
                engine.undo()
                respond("", cmd_id)
            elif cmd == "genmove":
                player = player_of[args[0].lower()]
                loc = engine.genmove(player)
                respond("resign" if loc is None
                        else loc_to_gtp(loc, engine.size, engine.x_size, engine.y_size), cmd_id)
            elif cmd in ("genmove_analyze", "lz-genmove_analyze",
                         "kata-genmove_analyze", "kata-search_analyze",
                         "kata-search_analyze_cancellable"):
                # stream info lines during the search, then the move
                # (gtp.cpp:1748 genmove_analyze family)
                player = int(engine.gs.pos.to_move)
                interval = 1.0
                for i, a in enumerate(args):
                    al = a.lower()
                    if al in player_of:
                        player = player_of[al]
                    elif al.replace(".", "").isdigit():
                        interval = float(al) / 100.0  # centiseconds
                outfile.write(f"={cmd_id}\n" if cmd_id else "=\n")
                outfile.flush()

                def emit(res, elapsed):
                    outfile.write(engine.analyze_info(res) + "\n")
                    outfile.flush()

                if cmd.startswith("kata-search"):
                    # search_analyze variants report without playing
                    res = engine.search_root(player, callback=emit,
                                             callback_interval=interval)
                    cv = np.asarray(res.child_visits[0])
                    loc = int(cv.argmax())
                else:
                    loc = engine.genmove(player, callback=emit,
                                         callback_interval=interval)
                # final summary info line from the completed search's tree
                final_res = engine.last_search_result
                if final_res is not None:
                    outfile.write(engine.analyze_info(
                        final_res, player=engine.last_search_player) + "\n")
                move_s = "resign" if loc is None \
                    else loc_to_gtp(loc, engine.size, engine.x_size, engine.y_size)
                outfile.write(f"play {move_s}\n\n")
                outfile.flush()
            elif cmd == "showboard":
                stones = np.asarray(engine.gs.pos.board.stones)
                respond("\n" + B.board_to_string(stones, engine.size), cmd_id)
            elif cmd == "debug_moves":
                raw = "rawstats" in args
                verts = [a for a in args if a.lower() != "rawstats"]
                try:
                    branch = [gtp_to_loc(v, engine.size, engine.x_size,
                                         engine.y_size) for v in verts]
                except Exception:  # noqa: BLE001
                    respond("Invalid move sequence", cmd_id, ok=False)
                else:
                    respond("\n" + engine.debug_moves_str(branch, raw),
                            cmd_id)
            elif cmd == "final_score":
                own, score = H.final_score_area(engine.gs, engine.size)
                s = float(score)
                if s > 0:
                    respond(f"W+{s:g}", cmd_id)
                elif s < 0:
                    respond(f"B+{-s:g}", cmd_id)
                else:
                    respond("0", cmd_id)
            elif cmd == "final_status_list":
                # alive/dead/seki from final area ownership (the reference's
                # PlayUtils::computeAnticipatedStatuses, playutils.h): a
                # stone is dead iff the final area assigns its point to the
                # opponent; seki iff its point ends up unowned
                kind = args[0].lower() if args else "alive"
                own, _ = H.final_score_area(engine.gs, engine.size)
                own = np.asarray(own)                  # +1 black / -1 white
                stones = np.asarray(engine.gs.pos.board.stones)
                out_locs = []
                for loc in range(engine.size * engine.size):
                    s = stones[loc]
                    if s != B.BLACK and s != B.WHITE:
                        continue   # empty or off-board WALL
                    mine = 1 if s == B.BLACK else -1
                    status = ("alive" if own[loc] == mine else
                              "dead" if own[loc] == -mine else "seki")
                    if status == kind:
                        out_locs.append(loc_to_gtp(loc, engine.size, engine.x_size, engine.y_size))
                respond(" ".join(out_locs), cmd_id)
            elif cmd in ("kata-set-position", "set_position"):
                # alternating color/vertex pairs on an empty board
                # (gtp.cpp kata-set-position): overlapping placements and
                # zero-liberty stones are illegal, pass is not a vertex
                if len(args) % 2 != 0:
                    respond("Expected a space-separated sequence of "
                            "<COLOR> <VERTEX> pairs", cmd_id, ok=False)
                    continue
                nn_b = engine.size * engine.size
                placements = []
                seen: set[int] = set()
                err = None
                for i in range(0, len(args), 2):
                    color = player_of.get(args[i].lower())
                    if color is None:
                        err = ("Expected a space-separated sequence of "
                               "<COLOR> <VERTEX> pairs")
                        break
                    try:
                        loc = gtp_to_loc(args[i + 1], engine.size,
                                         engine.x_size, engine.y_size)
                    except ValueError as e:
                        err = str(e)
                        break
                    if loc >= nn_b or loc in seen:
                        err = ("Illegal stone placements - overlapping "
                               "stones or stones with no liberties?")
                        break
                    seen.add(loc)
                    placements.append((color, loc))
                if err is None and placements:
                    # zero-liberty groups are illegal setups
                    grid = {}
                    for color, loc in placements:
                        grid[loc] = color
                    size_ = engine.size

                    def group_has_lib(start):
                        color = grid[start]
                        stack, visited = [start], {start}
                        while stack:
                            p = stack.pop()
                            x, y = p % size_, p // size_
                            for dx, dy in ((1, 0), (-1, 0), (0, 1),
                                           (0, -1)):
                                q, qx, qy = (y + dy) * size_ + x + dx, \
                                    x + dx, y + dy
                                if not (0 <= qx < engine.x_size
                                        and 0 <= qy < engine.y_size):
                                    continue
                                if q not in grid:
                                    return True
                                if grid[q] == color and q not in visited:
                                    visited.add(q)
                                    stack.append(q)
                        return False

                    if any(not group_has_lib(loc) for loc in grid):
                        err = ("Illegal stone placements - overlapping "
                               "stones or stones with no liberties?")
                if err is not None:
                    respond(err, cmd_id, ok=False)
                    continue
                engine.clear_board()
                for color, loc in placements:
                    engine.gs = H.setup_stone(engine.gs, loc, color,
                                              engine.size)
                engine.history = [engine.gs]
                respond("", cmd_id)
            elif cmd == "kata-benchmark":
                n_visits = int(args[0]) if args else engine.visits
                t0 = time.time()
                res = engine.search_root(int(engine.gs.pos.to_move),
                                         visits=n_visits)
                v = int(np.asarray(res.root_visits[0]))
                dt = max(time.time() - t0, 1e-6)
                respond(f"visits {v} time {dt:.3f}s visits/s {v/dt:.1f}",
                        cmd_id)
            elif cmd == "stop":
                engine.stop_ponder()
                respond("", cmd_id)
            elif cmd == "fixed_handicap":
                n = int(args[0])
                locs = _fixed_handicap_locs(engine.size, n)
                for l in locs:
                    engine.play(B.BLACK, l)
                engine.gs = H.replace_pos(engine.gs, to_move=jnp.int32(B.WHITE))
                respond(" ".join(loc_to_gtp(l, engine.size, engine.x_size, engine.y_size) for l in locs), cmd_id)
            elif cmd == "place_free_handicap":
                # policy-greedy placement (PlayUtils::placeFreeHandicap
                # plays the net's top move repeatedly with black to move)
                n = int(args[0])
                locs = []
                for _ in range(n):
                    l = engine.policy_top_move(B.BLACK)
                    if l is None or l >= engine.size * engine.size:
                        break
                    engine.play(B.BLACK, l)
                    locs.append(l)
                engine.gs = H.replace_pos(engine.gs,
                                          to_move=jnp.int32(B.WHITE))
                respond(" ".join(loc_to_gtp(l, engine.size, engine.x_size,
                                            engine.y_size) for l in locs),
                        cmd_id)
            elif cmd == "set_free_handicap":
                for v in args:
                    engine.play(B.BLACK, gtp_to_loc(v, engine.size,
                                                    engine.x_size,
                                                    engine.y_size))
                engine.gs = H.replace_pos(engine.gs,
                                          to_move=jnp.int32(B.WHITE))
                respond("", cmd_id)
            elif cmd in ("kata-search", "kata-search_cancellable",
                         "kata-search_debug", "genmove_debug"):
                # kata-search family reports the move WITHOUT playing it;
                # genmove_debug plays through the normal genmove path
                # (resignation + clock bookkeeping). _debug variants dump
                # the analysis to stderr — the reference prints debug to
                # the log and responds with only the vertex (gtp.cpp).
                player = player_of[args[0].lower()] if args \
                    else int(engine.gs.pos.to_move)
                if cmd == "genmove_debug":
                    loc = engine.genmove(player)
                    res = engine.last_search_result
                    if res is not None:
                        sys.stderr.write(
                            engine.analyze_info(res, player=player) + "\n")
                        sys.stderr.flush()
                    respond("resign" if loc is None
                            else loc_to_gtp(loc, engine.size, engine.x_size,
                                            engine.y_size), cmd_id)
                else:
                    res = engine.search_root(player)
                    cv = np.asarray(res.child_visits[0])
                    loc = int(cv.argmax())
                    move_s = loc_to_gtp(loc, engine.size, engine.x_size,
                                        engine.y_size)
                    if cmd.endswith("_debug"):
                        sys.stderr.write(
                            engine.analyze_info(res, player=player) + "\n")
                        sys.stderr.flush()
                    respond(move_s, cmd_id)
            elif cmd == "time_settings":
                # GTP: main_time byo_yomi_time byo_yomi_stones
                mt, byo_t, byo_s = float(args[0]), float(args[1]), int(args[2])
                if byo_s == 0 and byo_t > 0:
                    tc_new = lambda: TC.TimeControls.absolute_time(mt)
                elif byo_t <= 0:
                    tc_new = lambda: TC.TimeControls.absolute_time(mt)
                else:
                    tc_new = lambda: TC.TimeControls.canadian_or_byo_yomi_time(
                        mt, byo_t, 1, byo_s)
                engine.time_controls[B.BLACK] = tc_new()
                engine.time_controls[B.WHITE] = tc_new()
                respond("", cmd_id)
            elif cmd == "kata-time_settings":
                # kind args...: none | absolute MT | byoyomi MT PT NP |
                # canadian MT PT NS | fischer MT INC |
                # fischer-capped MT INC LIMIT MAXPERMOVE (neg = unlimited)
                kind = args[0].lower()
                def mk():
                    if kind == "none":
                        return None
                    if kind == "absolute":
                        return TC.TimeControls.absolute_time(float(args[1]))
                    if kind == "fischer":
                        return TC.TimeControls.fischer_time(float(args[1]),
                                                            float(args[2]))
                    if kind == "fischer-capped":
                        return TC.TimeControls.fischer_capped_time(
                            float(args[1]), float(args[2]),
                            float(args[3]), float(args[4]))
                    if kind == "byoyomi":
                        return TC.TimeControls.canadian_or_byo_yomi_time(
                            float(args[1]), float(args[2]), int(args[3]), 1)
                    if kind == "canadian":
                        return TC.TimeControls.canadian_or_byo_yomi_time(
                            float(args[1]), float(args[2]), 1, int(args[3]))
                    raise ValueError(f"unknown time settings kind {kind}")
                engine.time_controls[B.BLACK] = mk()
                engine.time_controls[B.WHITE] = mk()
                respond("", cmd_id)
            elif cmd == "time_left":
                player = player_of[args[0].lower()]
                tc = engine.time_controls[player]
                if tc is None:
                    tc = TC.TimeControls.absolute_time(float(args[1]))
                    engine.time_controls[player] = tc
                tc.update_from_gtp_time_left(float(args[1]), int(args[2]))
                respond("", cmd_id)
            elif cmd in ("kata-list-time-settings",
                         "kata-list_time_settings"):
                respond("none absolute byoyomi canadian fischer "
                        "fischer-capped", cmd_id)
            elif cmd == "kata-debug-print-tc":
                tcs = engine.time_controls[int(engine.gs.pos.to_move)]
                respond(str(tcs), cmd_id)
            elif cmd == "kata-get-rules":
                respond(engine.rules.to_json_string(), cmd_id)
            elif cmd == "kata-set-rules":
                engine.set_rules(R.Rules.parse(" ".join(args)))
                respond("", cmd_id)
            elif cmd == "kata-set-rule":
                engine.set_rules(R.Rules.from_json({args[0]: args[1]},
                                                   default=engine.rules))
                respond("", cmd_id)
            elif cmd == "kata-get-param":
                getter = engine.param_table().get(args[0])
                if getter:
                    v = getter[0]()
                    # booleans print lowercase (Global::boolToString), like
                    # the JSON of kata-get-params
                    respond(str(v).lower() if isinstance(v, (bool, np.bool_))
                            else str(v), cmd_id)
                else:
                    respond(f"unknown param {args[0]}", cmd_id, ok=False)
            elif cmd == "kata-set-param":
                setter = engine.param_table().get(args[0])
                if setter:
                    setter[1](args[1])
                    respond("", cmd_id)
                else:
                    respond(f"unknown param {args[0]}", cmd_id, ok=False)
            elif cmd == "kata-list-params":
                respond(" ".join(sorted(engine.param_table())), cmd_id)
            elif cmd == "kata-get-params":
                import json as _json
                respond(_json.dumps({k: g() for k, (g, _)
                                     in engine.param_table().items()}),
                        cmd_id)
            elif cmd == "kata-set-params":
                import json as _json
                d = _json.loads(" ".join(args))
                table = engine.param_table()
                for k, v in d.items():
                    if k not in table:
                        raise ValueError(f"unknown param {k}")
                    table[k][1](v)
                respond("", cmd_id)
            elif cmd == "kata-get-models":
                import json as _json
                respond(_json.dumps([{"name": engine.model_name,
                                      "internalName": engine.model_name,
                                      "maxBatchSize": 1,
                                      "usesHumanSLProfile":
                                          engine.sgf_meta is not None}]),
                        cmd_id)
            elif cmd == "kata-raw-nn":
                respond(engine.raw_nn(), cmd_id)
            elif cmd == "kata-raw-human-nn":
                respond(engine.raw_nn(use_human_profile=True), cmd_id)
            elif cmd in ("kata-analyze", "lz-analyze"):
                # streaming analysis: info lines every `interval`
                # centiseconds until the next GTP command arrives
                # (docs/GTP_Extensions.md kata-analyze)
                player = int(engine.gs.pos.to_move)
                interval = 1.0
                include_own = False
                min_moves, max_moves = 1, 10
                include_pvv = include_root = include_ostd = False
                # per-player root restriction masks (bool[A], True =
                # allowed); directives for the same player AND together,
                # directives for the other player don't touch the mover's
                avoid_masks = {B.BLACK: None, B.WHITE: None}
                bad_syntax = False
                i = 0
                while i < len(args):
                    al = args[i].lower()
                    if al in player_of:
                        player = player_of[al]
                    elif al == "interval" and i + 1 < len(args):
                        i += 1
                        interval = float(args[i]) / 100.0
                    elif al == "ownership" and i + 1 < len(args):
                        i += 1
                        include_own = args[i].lower() == "true"
                    elif al == "pvvisits" and i + 1 < len(args):
                        i += 1
                        include_pvv = args[i].lower() == "true"
                    elif al == "rootinfo" and i + 1 < len(args):
                        i += 1
                        include_root = args[i].lower() == "true"
                    elif al == "ownershipstdev" and i + 1 < len(args):
                        i += 1
                        include_ostd = args[i].lower() == "true"
                    elif al == "minmoves" and i + 1 < len(args):
                        i += 1
                        min_moves = int(args[i])
                    elif al == "maxmoves" and i + 1 < len(args):
                        i += 1
                        max_moves = int(args[i])
                    elif al in ("avoid", "allow") and i + 3 < len(args):
                        # avoid|allow PLAYER VERTEX,... UNTILDEPTH
                        # (GTP_Extensions.md); applied at the root when
                        # PLAYER is the mover and UNTILDEPTH >= 1
                        apl = player_of.get(args[i + 1].lower())
                        if apl is None:
                            bad_syntax = True
                            break
                        verts = args[i + 2].split(",")
                        until = int(args[i + 3])
                        locs = [gtp_to_loc(v, engine.size, engine.x_size,
                                           engine.y_size) for v in verts]
                        nn_a = engine.size * engine.size + 1
                        if until >= 1:
                            m = np.ones((nn_a,), bool) if al == "avoid" \
                                else np.zeros((nn_a,), bool)
                            for lc in locs:
                                m[lc] = (al == "allow")
                            if avoid_masks[apl] is None:
                                avoid_masks[apl] = m
                            else:
                                avoid_masks[apl] &= m
                        i += 3
                    elif al.replace(".", "").isdigit():
                        interval = float(al) / 100.0
                    i += 1
                if bad_syntax:
                    respond("invalid avoid/allow player", cmd_id, ok=False)
                    continue
                # root-level restriction: only the mover's mask applies
                avoid_mask = avoid_masks[player]

                def stdin_ready():
                    try:
                        r, _, _ = select.select([infile], [], [], 0)
                        return bool(r)
                    except (ValueError, OSError, TypeError):
                        return True   # non-selectable input: one chunk only

                outfile.write(f"={cmd_id}\n" if cmd_id else "=\n")
                outfile.flush()

                def emit(res, elapsed):
                    outfile.write(engine.analyze_info(
                        res, top_k=max_moves, min_moves=min_moves,
                        include_ownership=include_own,
                        include_pv_visits=include_pvv,
                        include_root_info=include_root,
                        include_ownership_stdev=include_ostd) + "\n")
                    outfile.flush()

                res = engine.search_root(
                    player, visits=1 << 24, callback=emit,
                    callback_interval=interval, should_stop=stdin_ready,
                    root_allowed_mask=avoid_mask)
                outfile.write(engine.analyze_info(
                    res, top_k=max_moves, min_moves=min_moves,
                    include_ownership=include_own,
                    include_pv_visits=include_pvv,
                    include_root_info=include_root,
                    include_ownership_stdev=include_ostd) + "\n\n")
                outfile.flush()
            elif cmd == "clear_cache":
                respond("", cmd_id)
            elif cmd == "loadsgf":
                from katago_tpu.dataio import sgf as S
                games = S.parse_sgf(open(args[0]).read())
                game = games[0]
                xs, ys = game.size
                engine.rules = R.Rules(**{**engine.rules.__dict__,
                                          "komi": game.komi})
                engine.set_size(xs, ys)
                for color, loc in game.setup_stones():
                    engine.gs = H.setup_stone(
                        engine.gs, S.remap_to_grid(loc, xs, ys,
                                                   engine.size),
                        color, engine.size)
                upto = int(args[1]) if len(args) > 1 else None
                for i, (player, loc) in enumerate(game.moves()):
                    if upto is not None and i + 1 >= upto:
                        break
                    engine.play(player,
                                S.remap_to_grid(loc, xs, ys, engine.size))
                respond("", cmd_id)
            elif cmd == "printsgf":
                from katago_tpu.dataio import sgf as S
                grid = engine.size
                xs, ys = engine.x_size, engine.y_size
                sgf_moves = [
                    (p, xs * ys if l >= grid * grid
                     else (l // grid) * xs + (l % grid))
                    for p, l in engine.moves]
                text = S.write_sgf(sgf_moves, xs, ys,
                                   komi=engine.rules.komi)
                if args:
                    open(args[0], "w").write(text)
                    respond("", cmd_id)
                else:
                    respond(text, cmd_id)
            else:
                respond(f"unknown command", cmd_id, ok=False)
        except Exception as e:  # noqa: BLE001 — GTP must answer, not die
            respond(f"{type(e).__name__}: {e}", cmd_id, ok=False)


from katago_tpu.selfplay.gameinit import fixed_handicap_locs as \
    _fixed_handicap_locs


def main(argv=None):
    ap = argparse.ArgumentParser(description="katago_tpu GTP engine")
    ap.add_argument("-model", default=None, help=".bin.gz model file")
    ap.add_argument("-config", default=None, help="gtp config file")
    ap.add_argument("-override-config", default=None, dest="override")
    ap.add_argument("-visits", type=int, default=None)
    ap.add_argument("-boardsize", type=int, default=19)
    args = ap.parse_args(argv)

    visits = 100
    rules = R.Rules.tromp_taylorish()
    search_params = None
    lag_buffer = None
    allow_resignation = False
    resign_threshold = -0.90
    resign_consec_turns = 3
    ponder = False
    anti_mirror = True
    human_sl_profile = None
    ladder_mode = "chase"
    if args.config:
        from katago_tpu.utils.setup import (load_search_params,
                                            search_limits, warn_unused)
        cfg = ConfigParser(args.config)
        if args.override:
            cfg.apply_overrides(args.override)
        visits = cfg.get_int("maxVisits", default=visits)
        if cfg.contains("rules"):
            rules = R.Rules.parse(cfg.get_string("rules"))
        if cfg.contains("komi"):
            rules = R.Rules(**{**rules.__dict__,
                               "komi": cfg.get_float("komi")})
        # Setup::loadSingleParams: the full reference search-knob surface
        search_params = load_search_params(cfg)
        limits = search_limits(cfg)
        lag_buffer = limits.get("lag_buffer")
        # resignation + pondering (gtp.cpp:276-324, gtp_example.cfg keys)
        if cfg.contains("allowResignation"):
            allow_resignation = cfg.get_bool("allowResignation")
        if cfg.contains("resignThreshold"):
            resign_threshold = cfg.get_float("resignThreshold")
        if cfg.contains("resignConsecTurns"):
            resign_consec_turns = cfg.get_int("resignConsecTurns")
        if cfg.contains("ponderingEnabled"):
            ponder = cfg.get_bool("ponderingEnabled")
        if cfg.contains("antiMirror"):
            anti_mirror = cfg.get_bool("antiMirror")
        if cfg.contains("humanSLProfile"):
            human_sl_profile = cfg.get_string("humanSLProfile")
        if cfg.contains("ladderMode"):
            ladder_mode = cfg.get_string("ladderMode",
                                         allowed=["chase", "exact"])
        warn_unused(cfg, log=lambda s: print(s, file=sys.stderr))
    if args.visits:
        visits = args.visits

    engine = GTPEngine(model_path=args.model, size=args.boardsize,
                       rules=rules, visits=visits,
                       search_params=search_params,
                       allow_resignation=allow_resignation,
                       resign_threshold=resign_threshold,
                       resign_consec_turns=resign_consec_turns,
                       ponder=ponder, anti_mirror=anti_mirror,
                       human_sl_profile=human_sl_profile,
                       ladder_mode=ladder_mode)
    if lag_buffer is not None:
        engine.lag_buffer = lag_buffer
    run_gtp(engine)


if __name__ == "__main__":
    main()
