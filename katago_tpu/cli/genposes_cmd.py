"""genposes — random/clumpy starting-position generation
(python/genrandomposes.py, genclumpyposes.py).

Generates batches of random positions for selfplay seeding
(startPosesFiles), writing Sgf::PositionSample JSON lines. Unlike the
reference's per-board python loops, generation is one jitted
lax.scan: G games play random legal moves in lockstep (clumpy mode
biases move sampling toward points adjacent to own stones, producing
the reference's clumped fight-like shapes), then one batched NN forward
scores every candidate and a fairness filter keeps positions whose
score is balanced enough (genrandomposes.py is_fair_enough_pos: reject
|score| > cap, keep with prob 1/(1 + pickiness * |score|)).

Usage:
  python -m katago_tpu.cli.genposes_cmd -out poses.jsonl -n 32
      [-size 9] [-mode random|clumpy] [-min-moves 6] [-max-moves 40]
      [-config b2c16 | -model M.bin.gz] [-max-score 60]
      [-score-rejection-pickiness 0.1] [-seed 0]
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


def generate_positions(g: int, size: int, max_moves: int, rng,
                       move_budget, *, clumpy: bool = False):
    """Play `move_budget[i]` random legal moves in game i (lockstep scan;
    games past their budget freeze). Returns the final GameState batch."""
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=max_moves + 8)
    games = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (g,) + x.shape).copy(), gs)
    budget = jnp.asarray(move_budget, jnp.int32)
    nn = size * size

    def step(carry, t):
        games_c, key = carry
        key, sub = jax.random.split(key)
        legal = jax.vmap(H.legal_moves, in_axes=(0, None))(games_c, size)
        logits = jnp.where(legal[:, :nn], 0.0, -1e30)   # board moves only
        if clumpy:
            own = jax.vmap(
                lambda gs_i: jnp.sum(
                    (B.shift4(gs_i.pos.board.stones, size, B.WALL)
                     == gs_i.pos.to_move).astype(jnp.float32), axis=0)
            )(games_c)
            logits = logits + 2.0 * own        # clump toward own stones
        moves = jax.random.categorical(sub, logits, axis=-1)
        stepped, _ = jax.vmap(H.step, in_axes=(0, 0, None))(
            games_c, moves.astype(jnp.int32), size)
        active = t < budget
        games_c = jax.tree.map(
            lambda new, old: jnp.where(
                active.reshape((g,) + (1,) * (new.ndim - 1)), new, old),
            stepped, games_c)
        return (games_c, key), None

    (games, _), _ = jax.lax.scan(step, (games, rng),
                                 jnp.arange(max_moves))
    return games


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-out", required=True)
    ap.add_argument("-n", type=int, default=32)
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-mode", default="random", choices=["random", "clumpy"])
    ap.add_argument("-min-moves", type=int, default=6)
    ap.add_argument("-max-moves", type=int, default=40)
    ap.add_argument("-model", default=None)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-max-score", type=float, default=60.0)
    ap.add_argument("-score-rejection-pickiness", type=float, default=0.1)
    ap.add_argument("-seed", type=int, default=0)
    args = ap.parse_args(argv)

    size = args.size
    host_rng = np.random.default_rng(args.seed)
    budget = host_rng.integers(args.min_moves, args.max_moves + 1,
                               size=args.n)
    games = jax.jit(
        lambda key, b: generate_positions(
            args.n, size, args.max_moves, key, b,
            clumpy=(args.mode == "clumpy"))
    )(jax.random.PRNGKey(args.seed), jnp.asarray(budget))

    # fairness filter: one batched raw forward (the reference queries a
    # 400-visit search per candidate; the net's own lead estimate is the
    # cheap equivalent at generation scale)
    if args.model:
        from katago_tpu.models import desc as D
        net = D.load_model(args.model)
        apply_fn = D.make_desc_apply(net)
    else:
        from katago_tpu.models import config as MC
        from katago_tpu.models.model import KataGoModel
        model = KataGoModel(MC.get_config(args.config), pos_len=size,
                            dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 22)),
                            jnp.zeros((1, 19)))
        apply_fn = lambda p, s, g_: model.apply(params, s, g_)  # noqa: E731

    from katago_tpu.models import features as F
    from katago_tpu.search import mcts as _m

    evaluator = _m.make_nn_evaluator(apply_fn, None, size,
                                     with_ladders=False)
    raw, _, _ = jax.jit(lambda gs: evaluator(gs, F.FeatureParams.default()))(
        games)
    lead_mover = np.asarray(raw["miscvalue"][:, 2]) * 20.0
    to_move = np.asarray(games.pos.to_move)
    lead_white = np.where(to_move == B.WHITE, lead_mover, -lead_mover)

    from katago_tpu.dataio.poses import PositionSample
    stones = np.asarray(games.pos.board.stones, np.int8)
    move_nums = np.asarray(games.pos.move_num)
    kept = 0
    with open(args.out, "w") as f:
        for i in range(args.n):
            score = float(lead_white[i])
            if abs(score) > args.max_score:
                continue
            keep_prob = 1.0 / (1.0 + args.score_rejection_pickiness
                               * abs(score))
            if host_rng.random() >= keep_prob:
                continue
            sample = PositionSample(
                x_size=size, y_size=size, stones=stones[i],
                next_pla=int(to_move[i]), moves=[],
                initial_turn_number=int(move_nums[i]),
                weight=1.0, metadata=f"genposes-{args.mode}")
            f.write(sample.to_json_line() + "\n")
            kept += 1
    print(json.dumps({"generated": args.n, "kept": kept,
                      "out": args.out, "mode": args.mode}))


if __name__ == "__main__":
    main()
