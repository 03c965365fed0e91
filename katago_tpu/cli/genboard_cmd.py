"""genboard — train / run the position-generation net
(python/genboard_train.py, genboard_run.py).

  train   build masked-position examples from SGF games and train
          GenBoardModel (point CE + 0.3 aux CE, SGD momentum like the
          reference); checkpoints a params npz
  run     complete a partially-specified board pattern: '.' empty,
          'X' black, 'O' white, '?' unknown (autoregressive sampling,
          one lax.scan on the device)

Usage:
  python -m katago_tpu.cli.genboard_cmd train -sgf-dir D -out model.npz
      [-size 19] [-channels 96] [-blocks 8] [-steps 200] [-batch 16]
  python -m katago_tpu.cli.genboard_cmd run -model model.npz
      -board "<size*size chars>" -turn 50 -turnstdev 10 -source 0
      [-batchsize 4]
"""

from __future__ import annotations

import argparse
import json
import math
import random

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.models import genboard as GB


def _random_subinterval(rand: random.Random, size: int):
    """genboard_train.py:77-94: half the time a triangular-shrunk
    interval, half the time uniform endpoints; may be empty."""
    def tri():
        return (size + 1) * (1.0 - math.sqrt(rand.random())) - 1
    if rand.random() < 0.5:
        x0, x1 = tri(), tri()
    else:
        x0, x1 = rand.randint(0, size - 1), rand.randint(0, size - 1)
    lo, hi = sorted((int(max(x0, 0)), int(max(x1, 0))))
    if rand.random() < 0.5:
        return 1, 0   # empty interval: nothing always-known
    return lo, hi


def make_examples(games, size: int, batch: int, rand: random.Random):
    """Masked-position training batch from replayed SGF positions."""
    from katago_tpu.cli.sgf_cmds import _replay
    stones_b, known_b, pts, labels, aux_b, turns, stds = \
        [], [], [], [], [], [], []
    nn_ = size * size
    while len(stones_b) < batch:
        game = rand.choice(games)
        try:
            _, _, states, moves = _replay(game)
        except Exception:
            continue
        if len(states) < 3:
            continue
        turn = rand.randint(1, len(states) - 1)
        stones = np.asarray(states[turn].pos.board.stones, np.int32)
        if stones.shape[0] != nn_:
            continue
        # always-known subrectangle + random visible prefix of the rest
        x0, x1 = _random_subinterval(rand, size)
        y0, y1 = _random_subinterval(rand, size)
        always = np.zeros((size, size), bool)
        always[y0:y1 + 1, x0:x1 + 1] = True
        always = always.reshape(-1)
        rest = np.flatnonzero(~always)
        rand.shuffle(rest)
        num_known = rand.randint(0, max(len(rest) - 1, 0))
        known = always.copy()
        known[rest[:num_known]] = True
        if len(rest) == 0:
            continue
        point = int(rest[num_known])
        # turn-number noise (genboard_train.py:212-217)
        if rand.random() < 0.3:
            noisy_turn, std = float(turn), 0.0
        else:
            std = (rand.random() ** 2.0) * 100
            noisy_turn = turn + rand.normalvariate(0.0, std)
        stones_b.append(stones)
        known_b.append(known)
        pts.append(point)
        labels.append(int(stones[point]))
        aux_b.append(stones)
        turns.append(noisy_turn)
        stds.append(std)
    return (np.stack(stones_b), np.stack(known_b), np.asarray(pts),
            np.asarray(labels), np.stack(aux_b),
            np.asarray(turns, np.float32), np.asarray(stds, np.float32))


def cmd_train(args):
    import optax

    from katago_tpu.dataio import sgf as S
    games = []
    import glob as globmod
    import os
    for f in sorted(globmod.glob(os.path.join(args.sgf_dir, "**", "*.sgf*"),
                                 recursive=True)):
        with open(f) as fh:
            for chunk in fh.read().split("\n"):
                if chunk.strip():
                    try:
                        games += S.parse_sgf(chunk)
                    except Exception:
                        pass
    games = [g for g in games if g.size == (args.size, args.size)]
    if not games:
        raise SystemExit("no usable SGF games found")
    rand = random.Random(args.seed)
    model = GB.GenBoardModel(num_channels=args.channels,
                             num_blocks=args.blocks)
    dummy = jnp.zeros((1, args.size, args.size, GB.NUM_INPUT_CHANNELS))
    params = model.init(jax.random.PRNGKey(args.seed), dummy)
    tx = optax.sgd(args.lr, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, inputs, point_label, aux_label):
        def loss_fn(p):
            pl, al = model.apply(p, inputs)
            main, aux = GB.genboard_loss(pl, al, point_label, aux_label,
                                         inputs)
            return main + aux, (main, aux)
        (loss, (main, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, main, aux

    for step in range(args.steps):
        stones, known, pts, labels, aux, turns, stds = make_examples(
            games, args.size, args.batch, rand)
        src = np.zeros((args.batch,), np.float32)
        inputs = GB.build_inputs(jnp.asarray(stones), jnp.asarray(known),
                                 jnp.asarray(pts), jnp.asarray(turns),
                                 jnp.asarray(stds), jnp.asarray(src),
                                 args.size)
        params, opt_state, main, aux = train_step(
            params, opt_state, inputs, jnp.asarray(labels),
            jnp.asarray(aux))
        if step % max(1, args.steps // 10) == 0:
            print(f"  step {step}: main={float(main):.4f} "
                  f"aux={float(aux):.4f}")
    flat = {"/".join(str(k) for k in path): np.asarray(v) for path, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez_compressed(args.out, __channels=args.channels,
                        __blocks=args.blocks, __size=args.size, **flat)
    print(json.dumps({"out": args.out, "steps": args.steps,
                      "games": len(games)}))


def _load_params(path):
    data = np.load(path)
    channels = int(data["__channels"])
    blocks = int(data["__blocks"])
    size = int(data["__size"])
    model = GB.GenBoardModel(num_channels=channels, num_blocks=blocks)
    dummy = jnp.zeros((1, size, size, GB.NUM_INPUT_CHANNELS))
    template = model.init(jax.random.PRNGKey(0), dummy)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    params = jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(data["/".join(str(k) for k in path)])
         for path, _ in flat])
    return model, params, size


def cmd_run(args):
    model, params, size = _load_params(args.model)
    nn_ = size * size
    board = args.board.replace("\n", "").replace(" ", "")
    board = board.replace(",", ".").replace("*", ".")
    if len(board) != nn_:
        raise SystemExit(f"board must be {nn_} chars, got {len(board)}")
    stones = np.zeros((nn_,), np.int32)
    known = np.zeros((nn_,), bool)
    for i, c in enumerate(board):
        if c == "X":
            stones[i], known[i] = 1, True
        elif c == "O":
            stones[i], known[i] = 2, True
        elif c == ".":
            known[i] = True
        elif c != "?":
            raise SystemExit(f"bad board char {c!r}")
    b = args.batchsize
    stones_b = jnp.broadcast_to(jnp.asarray(stones), (b, nn_))
    known_b = jnp.broadcast_to(jnp.asarray(known), (b, nn_))
    out = GB.sample_fill(model.apply, params, stones_b, known_b,
                         size=size, rng=jax.random.PRNGKey(args.seed),
                         turn=args.turn, turn_stdev=args.turnstdev,
                         source=float(args.source))
    out = np.asarray(out)
    for g in range(b):
        rows = []
        for y in range(size):
            rows.append(" ".join(
                ".XO"[out[g, y * size + x]] for x in range(size)))
        print("\n".join(rows))
        print()


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="command", required=True)
    p = sub.add_parser("train")
    p.add_argument("-sgf-dir", required=True)
    p.add_argument("-out", required=True)
    p.add_argument("-size", type=int, default=19)
    p.add_argument("-channels", type=int, default=96)
    p.add_argument("-blocks", type=int, default=8)
    p.add_argument("-steps", type=int, default=200)
    p.add_argument("-batch", type=int, default=16)
    p.add_argument("-lr", type=float, default=1e-5)
    p.add_argument("-seed", type=int, default=0)
    p.set_defaults(fn=cmd_train)
    p = sub.add_parser("run")
    p.add_argument("-model", required=True)
    p.add_argument("-board", required=True)
    p.add_argument("-turn", type=float, default=50.0)
    p.add_argument("-turnstdev", type=float, default=10.0)
    p.add_argument("-source", type=int, default=0)
    p.add_argument("-batchsize", type=int, default=1)
    p.add_argument("-seed", type=int, default=0)
    p.set_defaults(fn=cmd_run)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
