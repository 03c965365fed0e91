"""JSON-lines analysis engine — reference cpp/command/analysis.cpp.

Protocol per /root/reference/docs/Analysis_Engine.md: one JSON object per
stdin line with "id", "moves" ([[player,"gtpvertex"],...]), "rules",
"komi", "boardXSize"/"boardYSize", "analyzeTurns", "maxVisits", ...;
responses are JSON lines matched by id with moveInfos (move, visits,
winrate, scoreMean, scoreLead, prior, order, pv), rootInfo, and optional
ownership. Special actions: query_version, clear_cache, terminate.

The reference runs N analysis threads over an AsyncBot pool; here requests
are processed in order, each as one batched search (turn positions of one
request are analyzed as a single batch — batching across positions like
the reference's shared NNEvaluator).
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.cli.gtp import gtp_to_loc, loc_to_gtp
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams

VERSION = "0.1.0"


class AnalysisEngine:
    def __init__(self, model_path: str | None, default_visits: int = 100,
                 ladder_mode: str = "chase",
                 report_winrates_as: str = "SIDETOMOVE"):
        self.default_visits = default_visits
        self.report_winrates_as = report_winrates_as.upper()
        # in-search ladder featurization: "chase" (throughput default) or
        # "exact" (reference-parity backtracking solver; slow in-search).
        # The per-query reporting paths always featurize exactly.
        self.ladder_mode = ladder_mode
        if model_path:
            from katago_tpu.models import desc as D
            self.desc = D.load_model(model_path)
            self.model_apply = D.make_desc_apply(self.desc)
            self.model_name = self.desc.name
        else:
            self.desc = None
            self.model_apply = None
            self.model_name = "none"
        self._search_cache: dict = {}
        self._rng = jax.random.PRNGKey(0)

    def _search_fn(self, size: int, visits: int, masked: bool = False):
        key = (size, visits, masked)
        if key not in self._search_cache:
            sp = SearchParams(
                root_noise_enabled=False, cpuct_exploration_log=0.45,
                static_score_utility_factor=0.1,
                dynamic_score_utility_factor=0.3,
                root_symmetry_pruning=True,
                root_ending_bonus_points=0.5,
                root_prune_useless_moves=True).to_arr()
            if masked:
                self._search_cache[key] = jax.jit(
                    lambda roots, k, m: mcts.run_search(
                        self.model_apply, None, roots, sp, k, size=size,
                        num_sims=visits, max_nodes=visits + 3,
                        root_allowed_mask=m))
            else:
                self._search_cache[key] = jax.jit(
                    lambda roots, k: mcts.run_search(
                        self.model_apply, None, roots, sp, k, size=size,
                        num_sims=visits, max_nodes=visits + 3))
        return self._search_cache[key]

    def handle(self, req: dict, emit=None) -> list[dict]:
        """emit: optional callable(resp_dict) for streaming partial
        reports (reportDuringSearchEvery, Analysis_Engine.md) — partial
        responses carry isDuringSearch=true, the returned final ones
        isDuringSearch=false."""
        action = req.get("action")
        if action == "query_version":
            return [{"id": req.get("id"), "action": "query_version",
                     "version": VERSION, "git_hash": ""}]
        if action == "clear_cache":
            return [{"id": req.get("id"), "action": "clear_cache"}]
        if action == "terminate":
            return [{"id": req.get("id"), "action": "terminate"}]
        if action == "query_models":
            return [{"id": req.get("id"), "action": "query_models",
                     "models": [{"name": self.model_name,
                                 "internalName": self.model_name,
                                 "maxBatchSize": -1,
                                 "usesHumanSLProfile": False}]}]

        rid = req.get("id")
        if rid is None:
            return [{"error": "request has no id"}]
        warnings = self._field_warnings(req)
        if self.model_apply is None:
            return warnings + [{"id": rid, "error":
                                "no model loaded (start with -model "
                                "<file>)"}]
        try:
            return warnings + self._analyze(req, emit)
        except Exception as e:  # noqa: BLE001 — protocol answers, not dies
            return warnings + [{"id": rid,
                                "error": f"{type(e).__name__}: {e}"}]

    KNOWN_FIELDS = {
        "id", "action", "boardXSize", "boardYSize", "moves",
        "initialStones", "initialPlayer", "rules", "komi", "analyzeTurns",
        "maxVisits", "includeOwnership", "includePolicy", "avoidMoves",
        "allowMoves", "reportDuringSearchEvery", "overrideSettings",
        "priority", "whiteHandicapBonus", "includePVVisits",
        "includeOwnershipStdev",
    }
    KNOWN_OVERRIDES = {"maxVisits"}

    def _field_warnings(self, req: dict) -> list[dict]:
        """Typo protection per the reference (analysis.cpp /
        tests/analysis/badoverride.txt): unknown top-level fields and
        unknown overrideSettings keys come back as warning responses
        ahead of the result."""
        rid = req.get("id")
        out = []
        unknown_over = [k for k in (req.get("overrideSettings") or {})
                        if k not in self.KNOWN_OVERRIDES]
        if unknown_over:
            out.append({"id": rid, "field": "overrideSettings",
                        "warning": "Unknown config params: "
                        + ",".join(sorted(unknown_over))})
        for k in sorted(req):
            if k not in self.KNOWN_FIELDS:
                out.append({"id": rid, "field": k,
                            "warning": "Unexpected or unused field, do "
                            "you have a typo? (set warnUnusedFields="
                            "false in the config to disable this "
                            "warning)"})
        return out

    def _driver(self, size: int, visits: int):
        key = ("driver", size)
        if key not in self._search_cache:
            from katago_tpu.search.driver import SearchDriver
            sp = SearchParams(
                root_noise_enabled=False, cpuct_exploration_log=0.45,
                static_score_utility_factor=0.1,
                dynamic_score_utility_factor=0.3,
                root_symmetry_pruning=True,
                root_ending_bonus_points=0.5,
                root_prune_useless_moves=True).to_arr()
            self._search_cache[key] = SearchDriver(
                self.model_apply, None, sp, size=size,
                max_nodes=visits + 3, chunk_size=max(visits // 8, 4),
                ladder_mode=self.ladder_mode,
                feature_version=(self.desc.input_version
                                 if self.desc is not None else 7))
        d = self._search_cache[key]
        if d.max_nodes < visits + 3:   # bigger budget: rebuild
            del self._search_cache[key]
            return self._driver(size, visits)
        return d

    def _analyze(self, req: dict, emit=None) -> list[dict]:
        rid = req["id"]
        xs = int(req.get("boardXSize", 19))
        ys = int(req.get("boardYSize", xs))
        size = max(xs, ys)
        nn = size * size
        rules = R.Rules.parse(req["rules"]) if isinstance(req.get("rules"), str) \
            else (R.Rules.from_json(req["rules"]) if req.get("rules")
                  else R.Rules.tromp_taylorish())
        if "komi" in req:
            rules = R.Rules(**{**rules.__dict__, "komi": float(req["komi"])})
        visits = int(req.get("maxVisits", self.default_visits))
        # overrideSettings: the per-query knob bag (Analysis_Engine.md);
        # the limits subset is honored here, search-shape knobs are
        # engine-level in this implementation
        override = req.get("overrideSettings", {}) or {}
        if "maxVisits" in override:
            visits = int(override["maxVisits"])
        moves = req.get("moves", [])
        initial = req.get("initialStones", [])
        want_ownership = bool(req.get("includeOwnership", False))
        want_own_stdev = bool(req.get("includeOwnershipStdev", False))
        want_policy = bool(req.get("includePolicy", False))

        # avoidMoves / allowMoves (Analysis_Engine.md): lists of
        # {player, moves, untilDepth}; applied at the root (depth >= 1)
        allowed = None
        def vertex_set(entries, pla_char):
            locs = set()
            for e in entries or []:
                if str(e.get("player", "")).upper()[:1] not in ("", pla_char):
                    continue
                for v in e.get("moves", []):
                    locs.add(gtp_to_loc(v, size, xs, ys))
            return locs

        player_of = {"B": B.BLACK, "W": B.WHITE,
                     "b": B.BLACK, "w": B.WHITE}
        max_hist = 2 * nn + 64 + len(moves)
        shape = None
        if xs != ys:
            m = np.zeros((size, size), bool)
            m[:ys, :xs] = True
            shape = jnp.asarray(m.reshape(-1))
        gs = H.new_game(size, H.RulesArr.from_rules(rules), max_hist,
                        shape_mask=shape)
        for color, vert in initial:
            loc = gtp_to_loc(vert, size, xs, ys)
            gs = H.setup_stone(gs, loc, player_of[color], size)

        # initialPlayer: who moves first from the initial position
        # (matters for turn-0 analysis and setup positions)
        ip = str(req.get("initialPlayer", "")).upper()[:1]
        if ip in ("B", "W"):
            gs = H.replace_pos(gs, to_move=jnp.int32(player_of[ip]))

        analyze_turns = req.get("analyzeTurns", [len(moves)])
        states: dict[int, H.GameState] = {}
        if 0 in analyze_turns:
            states[0] = gs
        for i, (color, vert) in enumerate(moves):
            player = player_of[color]
            gs = H.replace_pos(gs, to_move=jnp.int32(player))
            gs, _ = H.step(gs, jnp.int32(gtp_to_loc(vert, size, xs, ys)),
                           size)
            if (i + 1) in analyze_turns:
                states[i + 1] = gs

        out = []
        for turn, state in sorted(states.items()):
            roots = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(), state)
            self._rng, sub = jax.random.split(self._rng)
            pla_char = "B" if int(state.pos.to_move) == B.BLACK else "W"
            avoid = vertex_set(req.get("avoidMoves"), pla_char)
            allow = vertex_set(req.get("allowMoves"), pla_char)
            mask = None
            if avoid or allow:
                mask = np.ones((1, nn + 1), bool)
                if allow:
                    mask[:] = False
                    for l in allow:
                        mask[0, l] = True
                for l in avoid:
                    mask[0, l] = False
            report_every = req.get("reportDuringSearchEvery")
            if report_every is not None and emit is not None:
                # streaming partial reports through the chunked driver
                driver = self._driver(size, visits)

                def cb(partial, elapsed, _turn=turn, _state=state):
                    resp = self._response(rid, _turn, _state, partial,
                                          size, xs, ys, want_ownership,
                                          want_policy)
                    resp["isDuringSearch"] = True
                    emit(resp)

                res = driver.search(
                    roots, sub, max_visits=visits,
                    root_allowed_mask=(jnp.asarray(mask)
                                       if mask is not None else None),
                    callback=cb,
                    callback_interval=float(report_every))
            elif mask is not None:
                res = self._search_fn(size, visits, masked=True)(
                    roots, sub, jnp.asarray(mask))
            else:
                res = self._search_fn(size, visits)(roots, sub)
            resp = self._response(rid, turn, state, res, size, xs, ys,
                                  want_ownership, want_policy,
                                  bool(req.get("includePVVisits", False)),
                                  want_own_stdev)
            if report_every is not None:
                resp["isDuringSearch"] = False
            out.append(resp)
        return out

    def _response(self, rid, turn, state, res, size, xs, ys, want_ownership,
                  want_policy=False, want_pv_visits=False,
                  want_own_stdev=False) -> dict:
        cv = np.asarray(res.child_visits[0])
        prior = np.asarray(res.root_policy_prior[0])
        tree = res.ss.tree
        player = int(state.pos.to_move)
        # winrate/score perspective (reportAnalysisWinratesAs,
        # analysis_example.cfg:19): SIDETOMOVE (default), BLACK, or WHITE
        persp = getattr(self, "report_winrates_as", "SIDETOMOVE")
        if persp == "BLACK":
            sign = -1.0
        elif persp == "WHITE":
            sign = 1.0
        else:
            sign = 1.0 if player == B.WHITE else -1.0

        move_infos = []
        order = np.argsort(cv)[::-1]
        # continuation PVs for the top candidates in one vmapped descent
        top = np.asarray([a for rank, a in enumerate(order)
                          if cv[a] > 0 and rank < 15], np.int32)
        pv_moves = pv_lens = None
        if top.size:
            from katago_tpu.search import mcts as _mcts
            tree1 = jax.tree.map(lambda x: x[0], tree)
            starts = jnp.asarray(
                np.asarray(tree.children[0, 0, top], np.int32))
            pv_moves, pv_lens = jax.vmap(
                lambda st: _mcts.extract_pv(tree1, max_len=14, start=st)
            )(starts)
            pv_moves = np.asarray(pv_moves)
            pv_lens = np.asarray(pv_lens)
        # hoist whole arrays to the host once: per-scalar reads cost a
        # device round trip each (painful over a tunneled accelerator)
        children_h = np.asarray(tree.children[0, 0, :])
        children_all_h = np.asarray(tree.children[0])
        visits_h = np.asarray(tree.visits[0])
        weight_h = np.asarray(tree.weight_sum[0])
        winloss_h = np.asarray(tree.winloss_sum[0])
        score_h = np.asarray(tree.score_mean_sum[0])
        util_h = np.asarray(tree.utility_sum[0])
        def pv_visits_of(start, moves):
            """Visit counts along a PV's nodes (includePVVisits)."""
            out, node = [], int(start)
            for mv in moves:
                out.append(int(visits_h[node]))
                nxt = int(children_all_h[node, mv]) if mv >= 0 else -1
                if nxt < 0:
                    break
                node = nxt
            return out
        for rank, a in enumerate(order):
            if cv[a] <= 0 or rank >= 15:
                break
            child = int(children_h[a])
            w = max(float(weight_h[child]), 1e-9)
            winloss = sign * float(winloss_h[child]) / w
            score = sign * float(score_h[child]) / w
            util = sign * float(util_h[child]) / w
            move_infos.append({
                "move": loc_to_gtp(int(a), size, xs, ys),
                "visits": int(cv[a]),
                "winrate": 0.5 * (1.0 + winloss),
                "scoreMean": score,
                "scoreLead": score,
                "scoreSelfplay": score,
                "utility": util,
                "prior": float(max(prior[a], 0.0)),
                "order": rank,
                "pv": [loc_to_gtp(int(a), size, xs, ys)] + [
                    loc_to_gtp(int(m), size, xs, ys)
                    for m in pv_moves[rank][:pv_lens[rank]]],
            })
            if want_pv_visits:
                move_infos[-1]["pvVisits"] = pv_visits_of(
                    child, list(pv_moves[rank][:pv_lens[rank]]))

        root_winloss = sign * float(np.asarray(res.root_winloss[0]))
        root_score = sign * float(np.asarray(res.root_score_mean[0]))
        resp = {
            "id": rid,
            "turnNumber": turn,
            "moveInfos": move_infos,
            "rootInfo": {
                "currentPlayer": "B" if player == B.BLACK else "W",
                "visits": int(np.asarray(res.root_visits[0])),
                "winrate": 0.5 * (1.0 + root_winloss),
                "scoreLead": root_score,
                "scoreSelfplay": root_score,
                "utility": sign * float(np.asarray(res.root_utility[0])),
            },
        }
        if want_ownership:
            from katago_tpu.models import features as F
            sp_feat, gl_feat = F.fill_features_v7(state, size,
                                                  F.FeatureParams.default())
            raw = self.model_apply(None,
                                   jnp.asarray(sp_feat).reshape(1, size, size, 22),
                                   jnp.asarray(gl_feat).reshape(1, 19))
            own = np.tanh(np.asarray(raw["ownership_pretanh"][0])).reshape(-1)
            resp["ownership"] = [round(sign * float(v), 4) for v in own]
        if want_own_stdev:
            ostd = np.asarray(res.root_ownership_stdev[0])
            resp["ownershipStdev"] = [round(float(v), 4) for v in ostd]
        if want_policy:
            resp["policy"] = [round(float(max(p, -1.0)), 6) for p in prior]
        return resp


def main(argv=None):
    ap = argparse.ArgumentParser(description="katago_tpu analysis engine")
    ap.add_argument("-model", default=None)
    ap.add_argument("-analysis-threads", type=int, default=1)
    ap.add_argument("-ladder-mode", default="chase",
                    choices=["chase", "exact"])
    ap.add_argument("-report-winrates-as", default="SIDETOMOVE",
                    choices=["SIDETOMOVE", "BLACK", "WHITE"],
                    help="perspective of winrate/score outputs "
                         "(reportAnalysisWinratesAs)")
    args = ap.parse_args(argv)

    engine = AnalysisEngine(args.model, ladder_mode=args.ladder_mode,
                            report_winrates_as=args.report_winrates_as)
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad json: {e}"}), flush=True)
            continue
        responses = engine.handle(
            req, emit=lambda r: print(json.dumps(r), flush=True))
        for resp in responses:
            print(json.dumps(resp), flush=True)
        if req.get("action") == "terminate":
            return


if __name__ == "__main__":
    main()
