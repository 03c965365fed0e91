"""Attention-map visualizer for the v17 transformer nets.

The reference's python/visualize_transformer_attention.py is an
interactive tkinter GUI; this is the headless-server-native equivalent:
load a model + SGF position, pull every layer/head's attention softmax
via flax intermediates, and render attention FROM a chosen query point
as ASCII heatmaps (and optionally a JSON dump for external plotting).

Usage:
  python tools/visualize_attention.py -config b5c48h3tfr -size 9 \
      -query E5 [-sgf game.sgf -turn 20] [-layer 0] [-head 0] [-json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

RAMP = " .:-=+*#%@"


def heat_str(grid: np.ndarray, size: int, stones: np.ndarray,
             query: int) -> str:
    """ASCII heatmap: attention mass per cell, stones overlaid."""
    g = grid.reshape(size, size)
    mx = max(float(g.max()), 1e-9)
    rows = []
    for y in range(size):
        cells = []
        for x in range(size):
            loc = y * size + x
            if loc == query:
                cells.append("Q")
            elif stones[loc] == 1:
                cells.append("X")
            elif stones[loc] == 2:
                cells.append("O")
            else:
                lvl = int(g[y, x] / mx * (len(RAMP) - 1) + 0.5)
                cells.append(RAMP[lvl])
        rows.append(" ".join(cells))
    return "\n".join(rows)


def main(argv=None):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from katago_tpu.cli.gtp import gtp_to_loc
    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.models import config as MC
    from katago_tpu.models import features as F
    from katago_tpu.models.model import KataGoModel

    ap = argparse.ArgumentParser()
    ap.add_argument("-config", default="b5c48h3tfr")
    ap.add_argument("-model", default=None,
                    help="(checkpoints load via train/checkpoint.py; "
                         "default uses random init for plumbing tests)")
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-sgf", default=None)
    ap.add_argument("-turn", type=int, default=None)
    ap.add_argument("-query", required=True, help="GTP vertex, e.g. E5")
    ap.add_argument("-layer", type=int, default=None,
                    help="attention layer index (default: all)")
    ap.add_argument("-head", type=int, default=None,
                    help="head index (default: mean over heads)")
    ap.add_argument("-json", default=None)
    args = ap.parse_args(argv)

    size = args.size
    cfg = MC.get_config(args.config)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    if args.model:
        from katago_tpu.train.checkpoint import load_checkpoint
        params = load_checkpoint(args.model)["params"]

    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=2 * size * size + 32)
    if args.sgf:
        from katago_tpu.dataio import sgf as S
        game = S.parse_sgf(open(args.sgf).read())[0]
        moves = game.moves()
        if args.turn is not None:
            moves = moves[:args.turn]
        for pla, loc in moves:
            gs = H.replace_pos(gs, to_move=jnp.int32(pla))
            gs, _ = H.step(gs, jnp.int32(loc), size)

    spf, glf = F.fill_features_v7(gs, size, F.FeatureParams.default())
    out, state = model.apply(
        params, jnp.asarray(spf).reshape(1, size, size, 22),
        jnp.asarray(glf).reshape(1, 19), mutable=["intermediates"])
    del out

    # collect [layers][B, H, S, S] attention maps in block order
    maps = []
    def walk(tree, path):
        if isinstance(tree, dict):
            for k in sorted(tree):
                walk(tree[k], path + [k])
        else:
            maps.append((".".join(path), np.asarray(tree[0] if
                                                    isinstance(tree, tuple)
                                                    else tree)))
    walk(state["intermediates"], [])
    maps = [(n, m) for n, m in maps if n.endswith("attention")]
    if not maps:
        raise SystemExit(f"no attention maps — {args.config} is not a "
                         "transformer config")

    query = gtp_to_loc(args.query, size, size, size)
    stones = np.asarray(gs.pos.board.stones)
    dump = {}
    layers = range(len(maps)) if args.layer is None else [args.layer]
    for li in layers:
        name, att = maps[li]          # [B, H, S, S]
        att = att[0]                  # [H, S, S]
        heads = range(att.shape[0]) if args.head is not None else [None]
        if args.head is not None:
            heads = [args.head]
        for hd in heads:
            grid = att[:, query, :].mean(0) if hd is None \
                else att[hd, query, :]
            label = f"layer {li} ({name}) " + \
                ("mean-heads" if hd is None else f"head {hd}")
            print(f"--- {label}: attention from {args.query} "
                  f"(max {grid.max():.3f})")
            print(heat_str(grid, size, stones, query))
            dump[label] = [round(float(v), 6) for v in grid]
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"size": size, "query": args.query,
                       "maps": dump}, f)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
