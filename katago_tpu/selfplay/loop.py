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
    mcts_score_white: np.ndarray    # [rows] f32 root MCTS score (white persp)
    stones: np.ndarray              # [rows, NN] i8 board before the move
    q_winloss_white: np.ndarray     # [rows, NN+1] f32 child winloss (white)
    q_score_white: np.ndarray       # [rows, NN+1] f32 child score (white)
    q_visits: np.ndarray            # [rows, NN+1] i32 child visits
    seki_diff_mover: np.ndarray     # [rows, NN] f32 full-area-vs-ownership
    policy_prior: np.ndarray        # [rows, NN+1] f32 root prior

    def to_npz_arrays(self, size: int, final_score_white: np.ndarray,
                      komi_white: np.ndarray | None = None) -> dict:
        """Reference-schema arrays (dataio.trainingwrite.pack_rows): all
        target channels of trainingwrite.h:183-290 that batched selfplay can
        produce — full td-value groups (win/loss/noresult/score blends of
        per-turn MCTS estimates ending at the game result), variance-time,
        future positions (+8/+32 turns), seki diff, per-point scoring,
        q-value targets, per-game row-group hashes."""
        from katago_tpu.dataio import trainingwrite as TW

        n = self.spatial.shape[0]
        area = size * size
        is_white = (self.to_move == B.WHITE)
        sign = np.where(is_white, 1.0, -1.0).astype(np.float32)

        # next-turn policy: the following row of the same game
        next_pol = np.zeros_like(self.policy_target)
        same_game_next = np.zeros(n, bool)
        same_game_next[:-1] = (self.game_idx[:-1] == self.game_idx[1:]) & \
                              (self.move_num[:-1] + 1 == self.move_num[1:])
        next_pol[np.flatnonzero(same_game_next)] = \
            self.policy_target[np.flatnonzero(same_game_next) + 1]

        # per-game td groups + variance time + future boards (white persp,
        # flipped to mover at the end)
        td5 = np.zeros((n, 5, 4), np.float32)
        vartime = np.zeros((n,), np.float32)
        fpos = np.zeros((n, 2, area), np.float32)     # absolute colors first
        ghash = np.zeros((n,), np.uint64)
        for g in np.unique(self.game_idx):
            rows = np.flatnonzero(self.game_idx == g)
            t = len(rows)
            final_sc = float(final_score_white[g])
            final_wl = float(np.sign(final_sc))
            wt = np.zeros((t + 1, 4), np.float32)     # win,loss,nr,score
            wl = self.mcts_winloss_white[rows]
            wt[:t, 0] = 0.5 * (1.0 + wl)
            wt[:t, 1] = 0.5 * (1.0 - wl)
            wt[:t, 3] = self.mcts_score_white[rows]
            wt[t] = [0.5 * (1 + final_wl), 0.5 * (1 - final_wl), 0.0,
                     final_sc]
            td5[rows] = TW.td_groups(wt, area)
            vartime[rows] = TW.variance_time_target(
                np.concatenate([wl, [final_wl]]))
            # future boards at +8 / +32 turns (trainingwrite.cpp:790-792)
            st = self.stones[rows]                     # [t, area] colors
            i8 = np.minimum(np.arange(t) + 8, t - 1)
            i32_ = np.minimum(np.arange(t) + 32, t - 1)
            fpos[rows, 0] = st[i8]
            fpos[rows, 1] = st[i32_]
            ghash[rows] = np.uint64(
                ((0x9E3779B97F4A7C15 * (int(g) + 1)) ^
                 (abs(int(final_sc * 2)) + 1)) % (1 << 64))

        # flip white-persp channels to mover persp
        td_mover = td5.copy()
        td_mover[:, :, 0] = np.where(is_white[:, None], td5[:, :, 0],
                                     td5[:, :, 1])
        td_mover[:, :, 1] = np.where(is_white[:, None], td5[:, :, 1],
                                     td5[:, :, 0])
        td_mover[:, :, 3] = td5[:, :, 3] * sign[:, None]
        cap = float(area + TW.EXTRA_SCORE_DISTR_RADIUS)
        td_mover[:, :, 3] = np.clip(td_mover[:, :, 3], -cap, cap)

        # future positions: colors -> mover persp +-1
        mover = self.to_move[:, None, None]
        fpos_mover = np.where(fpos == mover, 1.0,
                              np.where(fpos == 0, 0.0, -1.0)).astype(
            np.float32)

        # per-point scoring (C4): final ownership is the per-point score
        # under area scoring (mover persp, in [-1,1])
        scoring = self.ownership_target.astype(np.float32)

        # policy-surprise row weighting (playsettings.h:56)
        from katago_tpu.selfplay.playsettings import policy_surprise_weights
        row_weight = policy_surprise_weights(
            self.policy_target, self.policy_prior,
            np.ones(n, np.float32), 0.5)

        lead_mover = self.mcts_lead_white * sign
        if komi_white is None:
            komi_mover = np.zeros(n, np.float32)
        else:
            komi_mover = komi_white[self.game_idx] * sign
        return TW.pack_rows(
            spatial=self.spatial, global_in=self.global_in,
            policy_target=self.policy_target, next_policy_target=next_pol,
            value_target=self.value_target, td_targets=td_mover,
            score_target=self.score_target, lead_target=lead_mover,
            ownership_target=self.ownership_target, self_komi=komi_mover,
            turn_idx=self.move_num.astype(np.float32),
            visits=self.visits.astype(np.float32), size=size,
            variance_time=vartime,
            futurepos=fpos_mover,
            seki_diff=self.seki_diff_mover,
            scoring=scoring,
            q_winloss=self.q_winloss_white * sign[:, None],
            q_score=self.q_score_white * sign[:, None],
            q_visits=self.q_visits,
            game_hash=ghash,
            row_weight=row_weight)


def _place_handicap(games, num_handicap: np.ndarray, size: int):
    """Pre-place fixed-pattern black handicap stones, give white the move,
    and rebuild the position hashes (the reference places handicap with
    the net's policy, PlayUtils::playExtraBlack; the fixed star-point
    pattern is its GTP-flavored equivalent)."""
    from katago_tpu.game import zobrist
    from katago_tpu.selfplay.gameinit import fixed_handicap_locs
    g_n = num_handicap.shape[0]
    stones = np.asarray(games.board.stones).copy()
    to_move = np.asarray(games.pos.to_move).copy()
    hashes = np.asarray(games.board.pos_hash).copy()
    zst = zobrist.stone_table(size)
    for g in range(g_n):
        k = int(num_handicap[g])
        if k < 2:
            continue
        for l in fixed_handicap_locs(size, k):
            stones[g, l] = B.BLACK
            hashes[g] = hashes[g] ^ zst[B.BLACK - 1, l]
        to_move[g] = B.WHITE
    games = games._replace(pos=games.pos._replace(
        board=games.board._replace(stones=jnp.asarray(stones),
                                   pos_hash=jnp.asarray(hashes)),
        # prev-board snapshots clamp to the handicapped starting board
        # (getRecentBoard semantics)
        prev_stones=jnp.asarray(stones).astype(jnp.int8),
        prev_prev_stones=jnp.asarray(stones).astype(jnp.int8),
        to_move=jnp.asarray(to_move)))
    # re-record the starting ko-hash (new_game recorded the empty board)
    h0 = jax.vmap(lambda p, r: H._pos_ko_hash(p, r))(games.pos, games.rules)
    hist = games.ko_hash_hist.at[:, 0].set(h0)
    return games._replace(ko_hash_hist=hist)


def _adjust_komi_to_even(games, flags: np.ndarray, model_apply, params,
                         feat_fn, feat_params, size: int):
    """Set komi so the net predicts an even game where flagged
    (PlayUtils::adjustKomiToEven via the lead head): one batched eval,
    komi -= white lead, rounded to the half-integer grid."""
    from katago_tpu.models.model import postprocess_outputs
    sp_feat, gl_feat = feat_fn(games, size, feat_params)
    g_n = sp_feat.shape[0]
    raw = model_apply(params,
                      sp_feat.reshape(g_n, size, size, -1).astype(jnp.float32),
                      gl_feat)
    outs = postprocess_outputs(raw)
    lead_mover = np.asarray(outs["lead"], np.float32)
    to_move = np.asarray(games.pos.to_move)
    white_lead = np.where(to_move == B.WHITE, lead_mover, -lead_mover)
    komi = np.asarray(games.rules.komi, np.float32).copy()
    new_komi = np.round((komi - white_lead) * 2.0) / 2.0
    komi = np.where(flags, new_komi.astype(np.float32), komi)
    return games._replace(rules=games.rules._replace(
        komi=jnp.asarray(komi)))


def _place_start_positions(games, start_samples: list, size: int):
    """Install sampled start positions (Sgf::PositionSample /
    startPosesProb, selfplay.cpp:182-207): set the sample's stones as the
    starting board, replay its context moves (restoring ko state), and
    adopt its turn number."""
    max_hist = games.ko_hash_hist.shape[1]
    for g, sample in enumerate(start_samples):
        if sample is None or sample.x_size != size or sample.y_size != size:
            continue
        rules_g = jax.tree.map(lambda a: a[g], games.rules)
        gs = H.new_game(size, rules_g, max_hist=max_hist)
        gs = H.setup_board(gs, np.asarray(sample.stones, np.int32), size)
        gs = H.replace_pos(gs, to_move=jnp.int32(sample.next_pla))
        for pla, loc in sample.moves:
            gs = H.replace_pos(gs, to_move=jnp.int32(pla))
            gs, _ = H.step(gs, jnp.int32(loc), size)
        gs = H.replace_pos(gs, move_num=jnp.int32(
            sample.initial_turn_number + len(sample.moves)))
        games = jax.tree.map(lambda store, v: store.at[g].set(v), games, gs)
    return games


def play_games(model_apply: Callable, model_params: Any, *,
               size: int, num_games: int, visits: int,
               rules: R.Rules | None = None,
               search_params: SearchParams | None = None,
               max_moves: int | None = None,
               rng: jax.Array | None = None,
               record: bool = True,
               tree_reuse: bool = True,
               play_settings=None,
               game_rules: H.RulesArr | None = None,
               num_handicap: np.ndarray | None = None,
               compensate_komi: np.ndarray | None = None,
               early_fork: np.ndarray | None = None,
               start_samples: list | None = None,
               params_provider: Callable | None = None,
               resign_threshold: float = 0.0,
               resign_consec_turns: int = 3,
               ladder_mode: str = "chase",
               mesh=None) -> tuple[GameBatchData | None, dict]:
    """Play a batch of selfplay games to completion. Returns recorded data
    and summary stats (moves, scores, winners).

    play_settings: PlaySettings data-quality knobs (policy-init openings,
    cheap/full search mixing — cheap-search moves advance the game but are
    not recorded, matching cheapSearchTargetWeight=0).

    GameInitializer diversity (selfplay.gameinit): game_rules is a
    per-game RulesArr [G] (mixed ko/scoring/tax/suicide/button/komi in one
    compiled batch); num_handicap[g] places that many fixed-pattern black
    stones and gives white the move; compensate_komi[g] adjusts komi to an
    even game via one net lead estimate (PlayUtils::adjustKomiToEven);
    early_fork[g] replaces the game's last policy-init move with a
    uniform-random legal move (forkGame divergence).

    params_provider: optional callable () -> params polled every 16 moves
    so a freshly exported net takes over mid-game (the reference's
    mid-game net switching, selfplay.cpp:336-343).

    resign_threshold: e.g. -0.95 — a game ends as a resignation loss when
    the mover's root winloss stays below it for resign_consec_turns full
    searches (gtp.cpp:276-324 / match resign semantics). 0 disables.

    mesh: optional jax.sharding.Mesh — the game axis shards over the
    mesh's data axis (the TPU equivalent of the reference running
    numGameThreads across multiple GPUs, selfplay.cpp:94 + nneval.h:97);
    every search/step below then executes SPMD with leaf NN batches
    split across devices. num_games must divide evenly."""
    from katago_tpu.selfplay.playsettings import PlaySettings
    nn = size * size
    rules = rules or R.Rules.tromp_taylorish()
    sp = (search_params or SearchParams.for_selfplay()).to_arr()
    ps = play_settings or PlaySettings.for_testing(visits)
    max_moves = max_moves or int(nn * 1.6) + 20
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(
        int(jax.random.randint(rng, (), 0, 2 ** 31 - 1)))

    gs = H.new_game(size, H.RulesArr.from_rules(rules), max_hist=max_moves + 8)
    games = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_games,) + x.shape).copy(), gs)
    if game_rules is not None:
        games = games._replace(rules=game_rules)
        komi_white = np.asarray(game_rules.komi, np.float32)
    else:
        # per-game komi randomization (GameInitializer; RulesArr is
        # per-game dynamic, so one compiled program plays all komis)
        from katago_tpu.selfplay.playsettings import sample_komis
        komi_white = sample_komis(rules.komi, ps, num_games, host_rng)
        games = games._replace(rules=games.rules._replace(
            komi=jnp.asarray(komi_white)))
    if num_handicap is not None and (num_handicap > 0).any():
        games = _place_handicap(games, num_handicap, size)
    if start_samples is not None and any(st is not None
                                         for st in start_samples):
        games = _place_start_positions(games, start_samples, size)
    if mesh is not None:
        from katago_tpu.parallel import mesh as M
        if num_games % mesh.devices.size != 0:
            raise ValueError(f"num_games {num_games} not divisible by "
                             f"{mesh.devices.size} mesh devices")
        games = M.shard_batch(games, mesh)

    # cheap and full searches share one node-pool shape so tree reuse works
    # across budget switches (playsettings cheap/full mixing); the pool is
    # sized ~2x the visit budget so reused subtrees keep their value
    # instead of immediately hitting the cap (search.h:253-257 tree reuse)
    max_nodes = 2 * visits + 16
    cheap_visits = min(max(ps.cheap_search_visits, 2), visits)

    def make_search(n_sims, reuse):
        # max_visits is a traced per-call cap: with tree reuse only the
        # top-up playouts run, and games whose reused tree already meets
        # the budget run masked no-ops (the reference's maxVisits stop,
        # searchparams.h:131 — where its savings from reuse come from).
        # params are an argument (not a closure) so mid-game net switching
        # swaps weights without recompiling.
        if reuse:
            return jax.jit(lambda mp, roots, key, pt, pa, mv: mcts.run_search(
                model_apply, mp, roots, sp, key, size=size,
                num_sims=n_sims, max_nodes=max_nodes,
                ladder_mode=ladder_mode,
                prev_tree=pt, prev_actions=pa, max_visits=mv))
        return jax.jit(lambda mp, roots, key, mv: mcts.run_search(
            model_apply, mp, roots, sp, key, size=size,
            num_sims=n_sims, max_nodes=max_nodes,
            ladder_mode=ladder_mode, max_visits=mv))

    # quantized top-up grid: one compiled program per (n_sims, reuse)
    sims_grid = sorted({0, max(1, visits // 8), max(1, visits // 4),
                        visits // 2, (3 * visits) // 4, visits,
                        cheap_visits})
    _search_cache: dict = {}

    def get_search(n_sims: int, reuse: bool):
        q = next(s for s in sims_grid if s >= min(n_sims, visits))
        if (q, reuse) not in _search_cache:
            _search_cache[(q, reuse)] = make_search(q, reuse)
        return _search_cache[(q, reuse)]
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

    if compensate_komi is not None and compensate_komi.any():
        games = _adjust_komi_to_even(games, compensate_komi, model_apply,
                                     model_params, feat_fn, feat_params,
                                     size)
        komi_white = np.asarray(games.rules.komi, np.float32)

    # per-game policy-init opening lengths (PlaySettings policyInitAvgMoveNum)
    if ps.init_games_with_policy and ps.policy_init_avg_move_num > 0:
        init_len = host_rng.exponential(
            ps.policy_init_avg_move_num, size=num_games).astype(np.int32)
    else:
        init_len = np.zeros(num_games, np.int32)
    if early_fork is not None and early_fork.any():
        # fork games diverge with one uniform-random legal move at the end
        # of their (forced nonzero) opening
        init_len = np.where(early_fork, np.maximum(init_len, 2), init_len)

    rows = []  # host-side per-move records
    total_playouts = 0
    prev = None   # (tree, actions) for Search::makeMove-style reuse
    reused_visits = 0  # min over games of the re-rooted subtree's visits
    resign_below = np.zeros(num_games, np.int32)
    resigned_by = np.zeros(num_games, np.int32)  # player who resigned, 0=none
    resign_score = np.zeros(num_games, np.float32)  # root score at resign
    for move_i in range(max_moves):
        done = np.asarray(games.pos.game_over) | (resigned_by != 0)
        if done.all():
            break
        if params_provider is not None and move_i % 16 == 0:
            # mid-game net switching (selfplay.cpp:336-343): a freshly
            # exported model takes over the rest of every live game
            new_params = params_provider()
            if new_params is not None:
                model_params = new_params
        # cheap/full decision per move (cheapSearchProb)
        is_full = host_rng.random() >= ps.cheap_search_prob
        move_visits = visits if is_full else cheap_visits
        rng, k1, k2, k3 = jax.random.split(rng, 4)
        mv_cap = jnp.int32(move_visits + 1)   # root visit = playouts + 1
        if prev is None or not tree_reuse:
            n_new = move_visits
            res = get_search(n_new, False)(model_params, games, k1, mv_cap)
        else:
            # top-up: only the playouts the reused subtree is missing
            n_new = move_visits + 1 - reused_visits
            res = get_search(n_new, True)(model_params, games, k1, prev[0],
                                          prev[1], mv_cap)
        moves = choose_fn(res, games.pos.move_num, k2)
        # policy-init: in-opening games sample from the raw prior instead
        in_init = (np.asarray(games.pos.move_num) <
                   init_len) & ~done
        if in_init.any():
            prior = res.root_policy_prior
            logits = jnp.where(prior > 0, jnp.log(jnp.maximum(prior, 1e-10)),
                               -jnp.inf)
            pol_moves = jax.vmap(
                lambda k, l: jax.random.categorical(k, l))(
                jax.random.split(k3, num_games), logits)
            moves = jnp.where(jnp.asarray(in_init), pol_moves, moves)
            # fork divergence: the LAST opening move of a fork game is
            # uniform over legal moves (forkGame, play.cpp — a move the
            # policy would usually not choose)
            if early_fork is not None:
                fork_now = (early_fork
                            & (np.asarray(games.pos.move_num)
                               == init_len - 1) & ~done)
                if fork_now.any():
                    uni = jnp.where(prior > 0, 0.0, -jnp.inf)
                    fk = jax.random.fold_in(k3, 7)
                    fork_moves = jax.vmap(
                        lambda k, l: jax.random.categorical(k, l))(
                        jax.random.split(fk, num_games), uni)
                    moves = jnp.where(jnp.asarray(fork_now), fork_moves,
                                      moves)
        # resignation (gtp.cpp:276-324 semantics): the mover resigns when
        # their root winloss stays below the threshold for N full searches
        if resign_threshold < 0.0 and is_full:
            wl_white = np.asarray(res.root_winloss, np.float32)
            tm = np.asarray(games.pos.to_move)
            wl_mover = np.where(tm == B.WHITE, wl_white, -wl_white)
            bad = (wl_mover < resign_threshold) & ~done
            resign_below = np.where(bad, resign_below + 1, 0)
            newly = (resign_below >= resign_consec_turns) & (resigned_by == 0)
            if newly.any():
                resigned_by = np.where(newly, tm, resigned_by)
                resign_score = np.where(
                    newly, np.asarray(res.root_score_mean, np.float32),
                    resign_score)
                # end those games on-device too (step becomes a no-op)
                games = games._replace(pos=games.pos._replace(
                    game_over=games.pos.game_over | jnp.asarray(newly)))
        if tree_reuse:
            prev = (res.ss.tree, moves)
            # the next move's top-up budget is what the re-rooted subtree
            # is still missing; conservatively use the min over live games
            # (one compiled program serves the whole lockstep batch)
            cv = np.asarray(res.child_visits)
            mvs = np.asarray(moves)
            rv = cv[np.arange(num_games), mvs]
            live = ~done
            reused_visits = int(rv[live].min()) if live.any() else 0
        total_playouts += int((~done).sum()) * max(n_new, 0)

        # cheap-search and policy-init rows are not recorded
        # (cheapSearchTargetWeight = 0, playsettings.h:47)
        if record and is_full:
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
                "mcts_score_white": np.asarray(res.root_score_mean,
                                               np.float32),
                "stones": np.asarray(games.board.stones, np.int8),
                "q_winloss_white": np.asarray(res.child_winloss, np.float32),
                "q_score_white": np.asarray(res.child_score_mean, np.float32),
                "q_visits": np.asarray(res.child_visits, np.int32),
                "policy_prior": np.asarray(res.root_policy_prior, np.float32),
                "row_visits": move_visits,
                "live": ~done & ~in_init,
            })
        games, _ = step_fn(games, moves, size)

    own, score_w = score_fn(games, size)
    own = np.asarray(own, np.float32)        # +1 black / -1 white
    score_w = np.asarray(score_w, np.float32)  # white minus black
    if (resigned_by != 0).any():
        # resignation result: winner = opponent; score target from the
        # search's own estimate, sign-clamped to the resignation outcome
        score_w = np.where(
            resigned_by == B.BLACK, np.maximum(resign_score, 0.5),
            np.where(resigned_by == B.WHITE,
                     np.minimum(resign_score, -0.5), score_w))
    # full "naive" area for the seki-diff target (valueTargetsNCHW C1)
    from katago_tpu.game import benson
    full_area_fn = jax.jit(jax.vmap(
        lambda st, ms: benson.calculate_area(
            st, size, jnp.bool_(True), jnp.bool_(True), jnp.bool_(True), ms)),
        static_argnums=())
    full_area = np.asarray(full_area_fn(games.board.stones,
                                        games.rules.multi_suicide), np.int32)
    stats = {
        "komi_white": komi_white,
        "moves_per_game": np.asarray(games.pos.move_num, np.int32),
        "white_minus_black": score_w,
        "white_wins": (score_w > 0).sum(),
        "black_wins": (score_w < 0).sum(),
        "all_finished": bool(np.asarray(games.pos.game_over).all()),
        "total_playouts": total_playouts,
        "resignations": int((resigned_by != 0).sum()),
    }
    if not record:
        return None, stats

    # assemble rows with game-outcome targets from the mover's perspective
    out = {k: [] for k in ("spatial", "global_in", "policy_target", "to_move",
                           "value_target", "score_target", "ownership_target",
                           "game_idx", "move_num", "mcts_winloss_white",
                           "mcts_lead_white", "visits", "mcts_score_white",
                           "stones", "q_winloss_white", "q_score_white",
                           "q_visits", "seki_diff_mover", "policy_prior")}
    # seki diff (white-persp colors): full-area owner of points that ended
    # up unowned (trainingwrite.cpp:750-752)
    own_color = np.where(own > 0, B.BLACK, np.where(own < 0, B.WHITE, 0))
    seki_pts = (full_area != 0) & (own_color == 0)
    seki_black = seki_pts & (full_area == B.BLACK)
    seki_white = seki_pts & (full_area == B.WHITE)
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
        seki_mover = np.where(
            seki_black[idxs], np.where(is_white[:, None] > 0, -1.0, 1.0),
            np.where(seki_white[idxs],
                     np.where(is_white[:, None] > 0, 1.0, -1.0), 0.0))
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
        out["visits"].append(np.full(len(idxs), rec["row_visits"], np.int32))
        out["mcts_score_white"].append(rec["mcts_score_white"][idxs])
        out["stones"].append(rec["stones"][idxs])
        out["q_winloss_white"].append(rec["q_winloss_white"][idxs])
        out["q_score_white"].append(rec["q_score_white"][idxs])
        out["q_visits"].append(rec["q_visits"][idxs])
        out["seki_diff_mover"].append(seki_mover.astype(np.float32))
        out["policy_prior"].append(rec["policy_prior"][idxs])

    data = GameBatchData(**{k: np.concatenate(v, axis=0) for k, v in out.items()})
    return data, stats
