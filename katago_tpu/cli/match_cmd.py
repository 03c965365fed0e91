"""match command — engine-vs-engine games with Elo (reference cpp/command/match.cpp).

Plays batched games between two nets (alternating colors), scores them, and
reports the win record + Elo estimate with uncertainty via utils.elo —
the machinery the gatekeeper builds on (reference cpp/command/gatekeeper.cpp).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams
from katago_tpu.utils import elo as E


def play_match(apply_a, params_a, apply_b, params_b, *, size: int,
               num_games: int, visits: int, rules: R.Rules | None = None,
               seed: int = 0, max_moves: int | None = None,
               log=print) -> dict:
    """num_games games; bot A is black in even games, white in odd games.
    Both sides search with identical deterministic-ish settings."""
    rules = rules or R.Rules.tromp_taylorish()
    nn = size * size
    max_moves = max_moves or int(nn * 1.6) + 20
    sp = SearchParams(
        root_noise_enabled=False,
        chosen_move_temperature=0.2, chosen_move_temperature_early=0.6,
        cpuct_exploration_log=0.45,
        static_score_utility_factor=0.1,
        dynamic_score_utility_factor=0.3).to_arr()

    gs = H.new_game(size, H.RulesArr.from_rules(rules), max_moves + 8)
    games = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_games,) + x.shape).copy(), gs)
    a_is_black = (np.arange(num_games) % 2 == 0)

    search_a = jax.jit(lambda roots, k: mcts.run_search(
        apply_a, params_a, roots, sp, k, size=size, num_sims=visits,
        max_nodes=visits + 3))
    search_b = jax.jit(lambda roots, k: mcts.run_search(
        apply_b, params_b, roots, sp, k, size=size, num_sims=visits,
        max_nodes=visits + 3))
    step_fn = jax.jit(jax.vmap(H.step, in_axes=(0, 0, None)), static_argnums=2)
    choose = jax.jit(lambda res, mn, k: mcts.choose_moves(res, sp, mn, k))
    score_fn = jax.jit(jax.vmap(H.final_score_area, in_axes=(0, None)),
                       static_argnums=1)

    rng = jax.random.PRNGKey(seed)
    for move_i in range(max_moves):
        done = np.asarray(games.pos.game_over)
        if done.all():
            break
        rng, k1, k2, k3, k4 = jax.random.split(rng, 5)
        # both bots search every position; each game then takes the move of
        # whichever bot owns the player to move (simple, fully batched)
        res_a = search_a(games, k1)
        res_b = search_b(games, k2)
        mv_a = np.asarray(choose(res_a, games.pos.move_num, k3))
        mv_b = np.asarray(choose(res_b, games.pos.move_num, k4))
        to_move_black = np.asarray(games.pos.to_move) == B.BLACK
        a_to_move = (a_is_black & to_move_black) | (~a_is_black & ~to_move_black)
        moves = np.where(a_to_move, mv_a, mv_b)
        games, _ = step_fn(games, jnp.asarray(moves, jnp.int32), size)

    _, score_w = score_fn(games, size)
    score_w = np.asarray(score_w)
    black_won = score_w < 0
    a_won = (a_is_black & black_won) | (~a_is_black & ~black_won & (score_w != 0))
    draws = int((score_w == 0).sum())
    wins = int(a_won.sum())
    losses = num_games - wins - draws
    elo, elo_sd = E.estimate_elo(wins, losses, draws)
    result = {"games": num_games, "a_wins": wins, "a_losses": losses,
              "draws": draws, "a_elo_diff": round(elo, 1),
              "elo_stdev": round(elo_sd, 1),
              "finished": bool(np.asarray(games.pos.game_over).all())}
    log(f"match: A {wins}-{losses}-{draws} vs B; "
        f"Elo {elo:+.0f} +- {elo_sd:.0f}")
    return result


def play_round_robin(bots: list, *, size: int, games_per_pair: int,
                     visits: int, rules: R.Rules | None = None,
                     seed: int = 0, log=print) -> dict:
    """All-pairs tournament (reference MatchPairer, play.h:214-264: cycles
    through every bot pairing) with multi-player MLE Elos + stdevs
    (ComputeElos, cpp/core/elo.{h,cpp}).

    bots: list of (name, apply_fn, params). win_matrix[a][b] counts
    (a-playing-black wins, a-playing-white wins) vs b, the layout
    compute_elos consumes."""
    n = len(bots)
    win_matrix = np.zeros((n, n, 2), np.float64)
    records = []
    for ai in range(n):
        for bi in range(ai + 1, n):
            name_a, apply_a, pa = bots[ai]
            name_b, apply_b, pb = bots[bi]
            r = play_match(apply_a, pa, apply_b, pb, size=size,
                           num_games=games_per_pair, visits=visits,
                           rules=rules, seed=seed + ai * 1000 + bi,
                           log=lambda s: None)
            # play_match alternates colors evenly, so split each side's
            # wins across the two seatings; wm[x][y] = (x's wins, y's
            # wins) in the games x played first. Draws = half win each.
            aw, al, dr = r["a_wins"], r["a_losses"], r["draws"]
            win_matrix[ai, bi, 0] += aw / 2.0 + dr / 4.0  # A first: A wins
            win_matrix[ai, bi, 1] += al / 2.0 + dr / 4.0  # A first: B wins
            win_matrix[bi, ai, 0] += al / 2.0 + dr / 4.0  # B first: B wins
            win_matrix[bi, ai, 1] += aw / 2.0 + dr / 4.0  # B first: A wins
            records.append({"a": name_a, "b": name_b, "a_wins": aw,
                            "a_losses": al, "draws": dr})
            log(f"  {name_a} vs {name_b}: {aw}-{al}-{dr}")
    elos = E.compute_elos(win_matrix)
    sds = E.compute_approx_elo_stdevs(elos, win_matrix)
    table = sorted(zip([b[0] for b in bots], elos, sds),
                   key=lambda t: -t[1])
    for name, elo, sd in table:
        log(f"  {name:24s} {elo:+7.1f} +- {sd:.1f}")
    return {"elos": {name: round(e, 1) for name, e, _ in table},
            "elo_stdevs": {name: round(s, 1) for name, _, s in table},
            "pair_records": records}


def _load_bot(spec: str, size: int):
    """spec: path to .bin.gz (desc) or 'random:<config>[:<seed>]'."""
    if spec.startswith("random:"):
        from katago_tpu.models import config as MC
        from katago_tpu.models.model import KataGoModel
        parts = spec.split(":")
        cfg = MC.get_config(parts[1])
        init_seed = int(parts[2]) if len(parts) > 2 else 0
        model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(init_seed),
                            jnp.zeros((1, size, size, 22)),
                            jnp.zeros((1, 19)))
        return (lambda p, s, g: model.apply(params, s, g)), None
    from katago_tpu.models import desc as D
    return D.make_desc_apply(D.load_model(spec)), None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-bot-a", default=None)
    ap.add_argument("-bot-b", default=None)
    ap.add_argument("-bots", default=None,
                    help="comma-separated bot specs: round-robin "
                         "tournament over all pairs with multi-player "
                         "Elos (MatchPairer + ComputeElos)")
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-games", type=int, default=16,
                    help="games per pairing")
    ap.add_argument("-visits", type=int, default=32)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.bots:
        specs = [s.strip() for s in args.bots.split(",") if s.strip()]
        bots = []
        for s in specs:
            a, p = _load_bot(s, args.size)
            bots.append((s, a, p))
        out = play_round_robin(bots, size=args.size,
                               games_per_pair=args.games,
                               visits=args.visits, seed=args.seed)
    else:
        if not (args.bot_a and args.bot_b):
            ap.error("need -bot-a and -bot-b, or -bots for a tournament")
        apply_a, pa = _load_bot(args.bot_a, args.size)
        apply_b, pb = _load_bot(args.bot_b, args.size)
        out = play_match(apply_a, pa, apply_b, pb, size=args.size,
                         num_games=args.games, visits=args.visits,
                         seed=args.seed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
