"""JSON-lines analysis engine — reference cpp/command/analysis.cpp.

Protocol per /root/reference/docs/Analysis_Engine.md: one JSON object per
stdin line with "id", "moves" ([[player,"gtpvertex"],...]), "rules",
"komi", "boardXSize"/"boardYSize", "analyzeTurns", "maxVisits", ...;
responses are JSON lines matched by id with moveInfos (move, visits,
winrate, scoreMean, scoreLead, lcb, utilityLcb, scoreStdev, prior,
order, pv, ...), rootInfo, and optional ownership / policy /
per-move ownership. Special actions: query_version, clear_cache,
terminate, terminate_all, query_models.

Scheduling: the reference runs N analysis threads over an AsyncBot pool
with a priority queue (analysis.cpp). Here requests split into per-turn
tasks ordered by (priority desc, arrival asc); the stdin main loop
drains every already-available request line before starting the next
task, so later higher-priority queries and terminate actions overtake
queued work exactly as the reference's queue does (single-lane — each
task is itself one batched device search).

Per-query `overrideSettings` maps arbitrary SearchParams keys through
utils/setup.apply_overrides (the reference accepts any config key per
query); SearchParams ride the compiled searches as traced arguments, so
overrides never recompile.
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
from katago_tpu.utils import setup as SETUP

VERSION = "0.1.0"


def _default_params() -> SearchParams:
    return SearchParams(
        root_noise_enabled=False, cpuct_exploration_log=0.45,
        static_score_utility_factor=0.1,
        dynamic_score_utility_factor=0.3,
        root_symmetry_pruning=True,
        root_ending_bonus_points=0.5,
        root_prune_useless_moves=True)


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
        self.base_params = _default_params()
        self._search_cache: dict = {}
        self._profile_cache: dict = {}
        self._rng = jax.random.PRNGKey(0)
        self._seq = 0
        # Cross-search eval cache, TPU-native form: the reference keeps a
        # persistent per-position table of prior-search values that seeds
        # unexplored moves in later searches (search/evalcache.{h,cpp},
        # searchparams.h:120-122). In the batched array engine the search
        # TREE is that table — so the cache holds recent searches' device
        # trees keyed by root position hash, and a repeat query warm
        # starts from the cached tree (its visits count toward maxVisits,
        # so an exact repeat returns without new playouts). LRU-bounded;
        # cleared by the clear_cache action.
        self.tree_cache_size = 8
        self._tree_cache: dict = {}   # (hash, size, pool) -> Tree
        self._tree_cache_hits = 0
        self._tree_cache_misses = 0

    # -- compiled searches -------------------------------------------------

    def _sgf_meta(self, profile: str | None):
        """SGFMetadata row for an overrideSettings humanSLProfile
        (analysis.cpp humanSLProfile; models/sgfmetadata.py profiles)."""
        if not profile:
            return None
        if profile not in self._profile_cache:
            from katago_tpu.models.sgfmetadata import get_profile
            if self.desc is not None and \
                    self.desc.trunk.get("meta_encoder") is None:
                raise ValueError(
                    "humanSLProfile requires a metadata-encoder net")
            self._profile_cache[profile] = get_profile(profile)
        return self._profile_cache[profile]

    def _search_fn(self, size: int, visits: int, masked: bool = False,
                   mo: bool = False, profile: str | None = None):
        key = (size, visits, masked, mo, profile)
        if key not in self._search_cache:
            meta = self._sgf_meta(profile)

            def f(sp, roots, k, m):
                # maxVisits counts the root's own eval (searchparams.h:131):
                # run `visits` sims under a root-visit cap of `visits` so
                # the reported root visits equal maxVisits exactly
                return mcts.run_search(
                    self.model_apply, None, roots, sp, k, size=size,
                    num_sims=visits, max_nodes=visits + 3,
                    max_visits=visits,
                    root_allowed_mask=m, sgf_meta=meta,
                    track_moves_ownership=mo)

            if masked:
                self._search_cache[key] = jax.jit(f)
            else:
                self._search_cache[key] = jax.jit(
                    lambda sp, roots, k: f(sp, roots, k, None))
        return self._search_cache[key]

    def _driver(self, size: int, visits: int):
        key = ("driver", size)
        if key not in self._search_cache:
            from katago_tpu.search.driver import SearchDriver
            self._search_cache[key] = SearchDriver(
                self.model_apply, None, self.base_params.to_arr(),
                size=size, max_nodes=visits + 3,
                chunk_size=max(visits // 8, 4),
                ladder_mode=self.ladder_mode,
                feature_version=(self.desc.input_version
                                 if self.desc is not None else 7))
        d = self._search_cache[key]
        if d.max_nodes < visits + 3:   # bigger budget: rebuild
            del self._search_cache[key]
            return self._driver(size, visits)
        return d

    # -- protocol ----------------------------------------------------------

    def handle(self, req: dict, emit=None) -> list[dict]:
        """Process one request completely, returning its responses in
        turn order (the single-query path used by tests and simple
        drivers; the priority/terminate scheduling lives in main()).

        emit: optional callable(resp_dict) for streaming partial reports
        (reportDuringSearchEvery) — partial responses carry
        isDuringSearch=true, the returned final ones false."""
        act = self.handle_action(req)
        if act is not None:
            return act
        warnings, tasks, err = self.prepare_tasks(req)
        if err is not None:
            return warnings + [err]
        out = []
        for t in sorted(tasks, key=lambda t: t["turn"]):
            out.append(self.run_task(t, emit))
        return warnings + out

    def handle_action(self, req: dict) -> list[dict] | None:
        """Non-analysis actions; None when req is an analyze query.
        terminate bookkeeping against a queue happens in main() — here
        terminate/terminate_all simply acknowledge."""
        action = req.get("action")
        if action == "query_version":
            return [{"id": req.get("id"), "action": "query_version",
                     "version": VERSION, "git_hash": ""}]
        if action == "clear_cache":
            self._tree_cache.clear()
            return [{"id": req.get("id"), "action": "clear_cache"}]
        if action in ("terminate", "terminate_all"):
            return [{"id": req.get("id"), "action": action}]
        if action == "query_models":
            return [{"id": req.get("id"), "action": "query_models",
                     "models": [{"name": self.model_name,
                                 "internalName": self.model_name,
                                 "maxBatchSize": -1,
                                 "usesHumanSLProfile": False}]}]
        return None

    KNOWN_FIELDS = {
        "id", "action", "boardXSize", "boardYSize", "moves",
        "initialStones", "initialPlayer", "rules", "komi", "analyzeTurns",
        "maxVisits", "includeOwnership", "includeOwnershipStdev",
        "includeMovesOwnership", "includeMovesOwnershipStdev",
        "includePolicy", "includePVVisits", "avoidMoves", "allowMoves",
        "reportDuringSearchEvery", "firstReportDuringSearchAfter",
        "overrideSettings", "priority", "priorities",
        "whiteHandicapBonus", "terminateId", "turnNumbers",
    }

    def _field_warnings(self, req: dict) -> list[dict]:
        """Typo protection per the reference (analysis.cpp /
        tests/analysis/badoverride.txt): unknown top-level fields and
        unknown overrideSettings keys come back as warning responses
        ahead of the result."""
        rid = req.get("id")
        out = []
        override = dict(req.get("overrideSettings") or {})
        override.pop("humanSLProfile", None)
        _, unknown_over = SETUP.apply_overrides(self.base_params, override)
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

    # -- query preparation -------------------------------------------------

    def prepare_tasks(self, req: dict):
        """Parse + replay an analyze query into per-turn tasks.

        Returns (warnings, tasks, error_resp). Each task dict carries
        everything run_task needs plus "priority" and "seq" for the
        main-loop scheduler (analysis.cpp's priority queue)."""
        rid = req.get("id")
        if rid is None:
            return [], [], {"error": "request has no id"}
        warnings = self._field_warnings(req)
        if self.model_apply is None:
            return warnings, [], {"id": rid, "error":
                                  "no model loaded (start with -model "
                                  "<file>)"}
        try:
            tasks = self._build_tasks(req)
        except Exception as e:  # noqa: BLE001 — protocol answers, not dies
            return warnings, [], {"id": rid,
                                  "error": f"{type(e).__name__}: {e}"}
        return warnings, tasks, None

    def _build_tasks(self, req: dict) -> list[dict]:
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
        # overrideSettings: arbitrary per-query SearchParams
        # (Analysis_Engine.md; setup.apply_overrides maps every config
        # key), plus the maxVisits limit and humanSLProfile specials
        override = dict(req.get("overrideSettings") or {})
        if "maxVisits" in override:
            visits = int(override.pop("maxVisits"))
        profile = override.pop("humanSLProfile", None) or None
        if profile is not None:
            self._sgf_meta(profile)   # raise early on bad profiles
        params, _ = SETUP.apply_overrides(self.base_params, override)

        moves = req.get("moves", [])
        initial = req.get("initialStones", [])

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
        priorities = req.get("priorities")
        if priorities is not None and len(priorities) != len(analyze_turns):
            raise ValueError("priorities must be parallel to analyzeTurns")
        prio_of = {}
        for i, t in enumerate(analyze_turns):
            prio_of[t] = (int(priorities[i]) if priorities is not None
                          else int(req.get("priority", 0)))
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
        missing = [t for t in analyze_turns if t not in states]
        if missing:
            raise ValueError(f"analyzeTurns beyond the game: {missing}")

        ctx = {
            "rid": rid, "size": size, "xs": xs, "ys": ys,
            "visits": visits, "params": params, "profile": profile,
            "want_ownership": bool(req.get("includeOwnership", False)),
            "want_own_stdev": bool(req.get("includeOwnershipStdev", False)),
            "want_moves_own": bool(req.get("includeMovesOwnership", False)),
            "want_moves_own_stdev":
                bool(req.get("includeMovesOwnershipStdev", False)),
            "want_policy": bool(req.get("includePolicy", False)),
            "want_pv_visits": bool(req.get("includePVVisits", False)),
            "report_every": req.get("reportDuringSearchEvery"),
            "first_report_after": req.get("firstReportDuringSearchAfter"),
            "avoid": req.get("avoidMoves"), "allow": req.get("allowMoves"),
        }
        tasks = []
        for turn, state in states.items():
            self._seq += 1
            tasks.append(dict(ctx, turn=turn, state=state,
                              priority=prio_of[turn], seq=self._seq))
        return tasks

    # -- per-turn execution ------------------------------------------------

    def run_task(self, task: dict, emit=None) -> dict:
        try:
            return self._run_task(task, emit)
        except Exception as e:  # noqa: BLE001
            return {"id": task["rid"], "turnNumber": task["turn"],
                    "error": f"{type(e).__name__}: {e}"}

    def _run_task(self, task: dict, emit=None) -> dict:
        rid, turn, state = task["rid"], task["turn"], task["state"]
        size, xs, ys = task["size"], task["xs"], task["ys"]
        nn = size * size
        visits = task["visits"]
        sp_arr = task["params"].to_arr()
        mo = task["want_moves_own"] or task["want_moves_own_stdev"]
        roots = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(), state)
        self._rng, sub = jax.random.split(self._rng)
        pla_char = "B" if int(state.pos.to_move) == B.BLACK else "W"

        def vertex_set(entries):
            locs = set()
            for e in entries or []:
                pl = str(e.get("player", "")).upper()[:1]
                if pl not in ("", pla_char):
                    continue
                if int(e.get("untilDepth", 1)) < 1:
                    continue
                for v in e.get("moves", []):
                    locs.add(gtp_to_loc(v, size, xs, ys))
            return locs

        avoid = vertex_set(task["avoid"])
        allow = vertex_set(task["allow"])
        mask = None
        if avoid or allow:
            mask = np.ones((1, nn + 1), bool)
            if allow:
                mask[:] = False
                for l in allow:
                    mask[0, l] = True
            for l in avoid:
                mask[0, l] = False
        # cross-search tree cache (see __init__): exact-position repeat
        # queries warm start from the cached device tree
        cache_key = None
        cached_tree = None
        # moves-ownership accumulates during playouts, so a warm-started
        # search that needs no new playouts couldn't report it — skip
        # the cache for those queries
        if mask is None and not mo and self.tree_cache_size > 0:
            cache_key = (self._position_hashes(state, size)[0], size)
            cached_tree = self._tree_cache.get(cache_key)
            if cached_tree is not None and \
                    cached_tree.visits.shape[1] > visits + 3:
                cached_tree = None   # pool bigger than this query's driver
            if cached_tree is not None:
                self._tree_cache_hits += 1
                import sys as _sys
                print(f"evalcache hit {cache_key[0][:8]} "
                      f"(cached visits "
                      f"{int(np.asarray(cached_tree.visits[0, 0]))}, "
                      f"hits {self._tree_cache_hits} misses "
                      f"{self._tree_cache_misses})", file=_sys.stderr)
            else:
                self._tree_cache_misses += 1

        report_every = task["report_every"]
        if cached_tree is not None:
            driver = self._driver(size, visits)

            def cb(partial, elapsed, _turn=turn, _state=state):
                if report_every is None or emit is None:
                    return
                resp = self._response(rid, _turn, _state, partial, task)
                resp["isDuringSearch"] = True
                emit(resp)

            res = driver.search(
                roots, sub, max_visits=visits, prev_tree=cached_tree,
                callback=cb if report_every is not None else None,
                callback_interval=float(report_every or 1.0),
                sp=sp_arr, track_moves_ownership=mo)
        elif report_every is not None and emit is not None:
            # streaming partial reports through the chunked driver
            driver = self._driver(size, visits)
            first_after = float(task["first_report_after"] or 0.0)

            def cb(partial, elapsed, _turn=turn, _state=state):
                if elapsed < first_after:
                    return
                resp = self._response(rid, _turn, _state, partial, task)
                resp["isDuringSearch"] = True
                emit(resp)

            res = driver.search(
                roots, sub, max_visits=visits,
                root_allowed_mask=(jnp.asarray(mask)
                                   if mask is not None else None),
                callback=cb,
                callback_interval=float(report_every),
                sp=sp_arr, track_moves_ownership=mo)
        elif mask is not None:
            res = self._search_fn(size, visits, masked=True, mo=mo,
                                  profile=task["profile"])(
                sp_arr, roots, sub, jnp.asarray(mask))
        else:
            res = self._search_fn(size, visits, mo=mo,
                                  profile=task["profile"])(
                sp_arr, roots, sub)
        if cache_key is not None:
            self._tree_cache.pop(cache_key, None)
            self._tree_cache[cache_key] = res.ss.tree
            while len(self._tree_cache) > self.tree_cache_size:
                self._tree_cache.pop(next(iter(self._tree_cache)))
        resp = self._response(rid, turn, state, res, task)
        if report_every is not None:
            resp["isDuringSearch"] = False
        return resp

    # -- response assembly -------------------------------------------------

    def _response(self, rid, turn, state, res, task: dict) -> dict:
        size, xs, ys = task["size"], task["xs"], task["ys"]
        want_ownership = task["want_ownership"]
        want_policy = task["want_policy"]
        want_pv_visits = task["want_pv_visits"]
        want_own_stdev = task["want_own_stdev"]
        want_moves_own = task["want_moves_own"]
        want_moves_own_stdev = task["want_moves_own_stdev"]
        sp_arr = task["params"].to_arr()
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
            tree1 = jax.tree.map(lambda x: x[0], tree)
            starts = jnp.asarray(
                np.asarray(tree.children[0, 0, top], np.int32))
            pv_moves, pv_lens = jax.vmap(
                lambda st: mcts.extract_pv(tree1, max_len=14, start=st)
            )(starts)
            pv_moves = np.asarray(pv_moves)
            pv_lens = np.asarray(pv_lens)
        # per-child LCB / stdev extras (searchresults.cpp getJson)
        extras = jax.jit(mcts.child_analysis_extras)(res, sp_arr)
        extras = {k: np.asarray(v[0]) for k, v in extras.items()}
        # hoist whole arrays to the host once: per-scalar reads cost a
        # device round trip each (painful over a tunneled accelerator)
        children_h = np.asarray(tree.children[0, 0, :])
        children_all_h = np.asarray(tree.children[0])
        visits_h = np.asarray(tree.visits[0])
        weight_h = np.asarray(tree.weight_sum[0])
        winloss_h = np.asarray(tree.winloss_sum[0])
        score_h = np.asarray(tree.score_mean_sum[0])
        lead_h = np.asarray(tree.lead_sum[0])
        util_h = np.asarray(tree.utility_sum[0])
        if want_moves_own or want_moves_own_stdev:
            moves_own_h = np.asarray(res.moves_ownership[0])
            moves_own_sd_h = np.asarray(res.moves_ownership_stdev[0])
            moves_own_w_h = np.asarray(res.moves_own_weight[0])

        def pv_visits_of(start, moves):
            """Visit counts along a PV's nodes (includePVVisits): one
            count per PV move, including the final node's."""
            node = int(start)
            out = [int(visits_h[node])]
            for mv in moves:
                nxt = int(children_all_h[node, mv]) if mv >= 0 else -1
                if nxt < 0:
                    break
                node = nxt
                out.append(int(visits_h[node]))
            return out

        for rank, a in enumerate(order):
            if cv[a] <= 0 or rank >= 15:
                break
            child = int(children_h[a])
            w = max(float(weight_h[child]), 1e-9)
            winloss = sign * float(winloss_h[child]) / w
            score = sign * float(score_h[child]) / w
            lead = sign * float(lead_h[child]) / w
            util = sign * float(util_h[child]) / w
            # white-persp lcb fields -> requested perspective
            # (searchresults.cpp getJson flip)
            lcb = float(extras["lcb"][a])
            ulcb = float(extras["utility_lcb"][a])
            if sign < 0:
                lcb = 1.0 - lcb
                ulcb = -ulcb
            info = {
                "move": loc_to_gtp(int(a), size, xs, ys),
                "visits": int(cv[a]),
                "edgeVisits": int(cv[a]),
                "weight": float(extras["weight"][a]),
                "edgeWeight": float(extras["weight"][a]),
                "winrate": 0.5 * (1.0 + winloss),
                "scoreMean": lead,
                "scoreLead": lead,
                "scoreSelfplay": score,
                "scoreStdev": float(extras["score_stdev"][a]),
                "utility": util,
                "lcb": lcb,
                "utilityLcb": ulcb,
                "prior": float(max(prior[a], 0.0)),
                "order": rank,
                "pv": [loc_to_gtp(int(a), size, xs, ys)] + [
                    loc_to_gtp(int(m), size, xs, ys)
                    for m in pv_moves[rank][:pv_lens[rank]]],
            }
            if want_pv_visits:
                info["pvVisits"] = pv_visits_of(
                    child, list(pv_moves[rank][:pv_lens[rank]]))
            if want_moves_own and moves_own_w_h[a] > 0:
                info["ownership"] = [round(sign * float(v), 4)
                                     for v in moves_own_h[a]]
            if want_moves_own_stdev and moves_own_w_h[a] > 0:
                info["ownershipStdev"] = [round(float(v), 4)
                                          for v in moves_own_sd_h[a]]
            move_infos.append(info)

        root_winloss = sign * float(np.asarray(res.root_winloss[0]))
        root_score = sign * float(np.asarray(res.root_score_mean[0]))
        root_lead = sign * float(np.asarray(res.root_lead[0]))
        this_hash, sym_hash = self._position_hashes(state, size)
        resp = {
            "id": rid,
            "turnNumber": turn,
            "moveInfos": move_infos,
            "rootInfo": {
                "currentPlayer": "B" if player == B.BLACK else "W",
                "visits": int(np.asarray(res.root_visits[0])),
                "weight": float(weight_h[0]),
                "winrate": 0.5 * (1.0 + root_winloss),
                "scoreLead": root_lead,
                "scoreSelfplay": root_score,
                "utility": sign * float(np.asarray(res.root_utility[0])),
                "thisHash": this_hash,
                "symHash": sym_hash,
            },
        }
        if want_ownership:
            # tree-averaged ownership (getAverageTreeOwnership,
            # searchresults.cpp)
            own = np.asarray(res.root_ownership[0])
            resp["ownership"] = [round(sign * float(v), 4) for v in own]
        if want_own_stdev:
            ostd = np.asarray(res.root_ownership_stdev[0])
            resp["ownershipStdev"] = [round(float(v), 4) for v in ostd]
        if want_policy:
            resp["policy"] = [round(float(max(p, -1.0)), 6) for p in prior]
        return resp

    def _position_hashes(self, state, size: int) -> tuple[str, str]:
        """rootInfo thisHash/symHash (searchresults.cpp:2162-2163):
        thisHash = the position's graph hash; symHash = the minimum of
        the position zobrists over the 8 dihedral symmetries (our hashes
        are 64-bit pairs, not the reference's Hash128 — same role)."""
        from katago_tpu.game import zobrist as Z
        from katago_tpu.ops import symmetry as SYM
        nn = size * size
        stones = np.asarray(state.pos.board.stones).reshape(-1)
        tm = int(state.pos.to_move)
        tab = Z.stone_table(size)[:, :nn]    # [2, NN, 2] uint32 lane pairs
        ptab = Z.player_table()
        perm = SYM.loc_perm(size)[:, :nn]    # [8, NN] (drop the pass slot)

        def hash_of(st):
            hi = np.uint64(0)
            for v, row in ((B.BLACK, 0), (B.WHITE, 1)):
                sel = st == v
                if sel.any():
                    h = tab[row][sel].astype(np.uint64)
                    hi ^= np.bitwise_xor.reduce(
                        (h[:, 0] << np.uint64(32)) | h[:, 1])
            if tm == B.BLACK:
                hi ^= np.uint64((int(ptab[0, 0]) << 32) | int(ptab[0, 1]))
            return int(hi)

        this_h = hash_of(stones)
        sym_h = min(hash_of(stones[perm[s]]) for s in range(8))
        return f"{this_h:016X}", f"{sym_h:016X}"


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
    run_protocol(engine, sys.stdin, sys.stdout)


def run_protocol(engine: AnalysisEngine, infile, outfile):
    """The stdin/stdout protocol loop with the reference's scheduling
    semantics (analysis.cpp): per-turn tasks execute by (priority desc,
    arrival asc); terminate / terminate_all drop queued tasks by id
    (and optionally turnNumbers), answering noResults for tasks that
    never ran. All already-available input is drained before each task
    so control actions and higher-priority queries overtake the queue."""
    import select as _select

    def emit(obj):
        outfile.write(json.dumps(obj) + "\n")
        outfile.flush()

    pending: list[dict] = []   # task dicts, scheduled below
    done = False
    try:
        infile.fileno()
        selectable = True
    except Exception:  # noqa: BLE001 — StringIO/file-like test drivers
        selectable = False

    def drain(block: bool):
        nonlocal done
        while True:
            if done:
                return
            if not block and selectable:
                try:
                    r, _, _ = _select.select([infile], [], [], 0)
                except (ValueError, OSError, TypeError):
                    return
                if not r:
                    return
            line = infile.readline()
            block = False
            if line == "":
                done = True
                return
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except json.JSONDecodeError as e:
                emit({"error": f"bad json: {e}"})
                continue
            action = req.get("action")
            if action in ("terminate", "terminate_all"):
                tid = req.get("terminateId")
                if action == "terminate" and tid is None:
                    emit({"id": req.get("id"),
                          "error": "terminate requires terminateId"})
                    continue
                turns = req.get("turnNumbers")
                keep, dropped = [], []
                for t in pending:
                    match = (action == "terminate_all" or t["rid"] == tid)
                    if match and (turns is None or t["turn"] in turns):
                        dropped.append(t)
                    else:
                        keep.append(t)
                pending[:] = keep
                for t in dropped:
                    emit({"id": t["rid"], "turnNumber": t["turn"],
                          "isDuringSearch": False, "noResults": True})
                emit({"id": req.get("id"), "action": action})
                continue
            resp = engine.handle_action(req)
            if resp is not None:
                for r_ in resp:
                    emit(r_)
                continue
            warnings, tasks, err = engine.prepare_tasks(req)
            for w in warnings:
                emit(w)
            if err is not None:
                emit(err)
                continue
            pending.extend(tasks)

    while True:
        drain(block=False)
        if not pending:
            if done:
                return
            drain(block=True)
            continue
        # highest priority first; FIFO within a priority level
        pending.sort(key=lambda t: (-t["priority"], t["seq"]))
        task = pending.pop(0)
        emit(engine.run_task(task, emit))


if __name__ == "__main__":
    main()
