"""SGF data-mining commands: evalsgf, writetrainingdata, startposes.

References: cpp/command/evalsgf.cpp (analyze one SGF position, print
values), cpp/command/writetrainingdata.cpp:1-2523 (external SGFs ->
training npz rows for human-SL training), cpp/command/startposes.cpp
(sample SGF positions into a start-position file consumed by selfplay).

Usage:
  python -m katago_tpu.cli.sgf_cmds evalsgf game.sgf [-move-num N]
      [-model M] [-config b6c96] [-visits 64]
  python -m katago_tpu.cli.sgf_cmds writetrainingdata -sgf-dir D
      -output out.npz [-size 19] [-max-rows 10000]
  python -m katago_tpu.cli.sgf_cmds startposes -sgf-dir D -output poses.jsonl
      [-sample-prob 0.05]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import random

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.dataio import sgf as S
from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R


def _replay(game: S.SgfGame, upto: int | None = None):
    """Replay a game's main line; returns (grid size, rules, states list
    incl. initial, moves in engine-grid space). Rectangular SGFs play on
    the max(x,y) square grid with WALL-filled off-board rows."""
    xs, ys = game.size
    size = max(xs, ys)
    shape = None
    if xs != ys:
        m = np.zeros((size, size), bool)
        m[:ys, :xs] = True
        shape = jnp.asarray(m.reshape(-1))
    rules = R.Rules.tromp_taylorish()
    rules = R.Rules(**{**rules.__dict__, "komi": game.komi})
    gs = H.new_game(size, H.RulesArr.from_rules(rules),
                    max_hist=2 * size * size + 32, shape_mask=shape)
    for color, loc in game.setup_stones():
        gs = H.setup_stone(gs, S.remap_to_grid(loc, xs, ys, size), color,
                           size)
    states = [gs]
    moves = [(p, S.remap_to_grid(l, xs, ys, size))
             for p, l in game.moves()]
    if upto is not None:
        moves = moves[:upto]
    for player, loc in moves:
        gs = H.replace_pos(gs, to_move=jnp.int32(player))
        gs, _ = H.step(gs, jnp.int32(loc), size)
        states.append(gs)
    return size, rules, states, moves


def cmd_evalsgf(args):
    games = S.parse_sgf(open(args.sgf).read())
    game = games[0]
    size, rules, states, moves = _replay(game, args.move_num)
    gs = states[-1]

    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams
    if args.model:
        from katago_tpu.models import desc as D
        net = D.load_model(args.model)
        apply_fn, params = D.make_desc_apply(net), None
    else:
        from katago_tpu.models import config as MC
        from katago_tpu.models.model import KataGoModel
        model = KataGoModel(MC.get_config(args.config), pos_len=size,
                            dtype=jnp.float32)
        p = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
        apply_fn, params = (lambda _, s, g: model.apply(p, s, g)), None

    sp = SearchParams(use_lcb_for_selection=True).to_arr()
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(),
                         gs)
    res = mcts.run_search(apply_fn, params, roots, sp, jax.random.PRNGKey(1),
                          size=size, num_sims=args.visits,
                          max_nodes=args.visits + 3)
    print(B.board_to_string(np.asarray(gs.board.stones), size))
    mover = "black" if int(gs.pos.to_move) == B.BLACK else "white"
    print(f"move {len(moves)}, {mover} to play")
    print(f"winloss (white persp): {float(res.root_winloss[0]):+.3f}  "
          f"score: {float(res.root_score_mean[0]):+.1f}  "
          f"visits: {int(res.root_visits[0])}")
    cv = np.asarray(res.child_visits[0])
    order = np.argsort(cv)[::-1]
    cols = "ABCDEFGHJKLMNOPQRSTUVWXYZ"
    for a in order[:8]:
        if cv[a] == 0:
            break
        mv = "pass" if a >= size * size else \
            f"{cols[a % size]}{size - a // size}"
        print(f"  {mv:>5}: {int(cv[a])} visits, "
              f"wl {float(res.child_winloss[0, a]):+.3f}")


def cmd_writetrainingdata(args):
    """External SGFs -> reference-schema npz: per position, the played
    move as the policy target and the game result as value targets
    (writetrainingdata.cpp's core; search-derived targets absent with
    weights 0)."""
    from katago_tpu.dataio import trainingwrite as TW
    from katago_tpu.models import features as F

    files = sorted(glob.glob(os.path.join(args.sgf_dir, "*.sgf")))
    size = args.size
    nn1 = size * size + 1
    feat = jax.jit(lambda g: F.fill_features_v7(
        g, size, F.FeatureParams.default(), with_ladders=not args.no_ladders),
        static_argnums=())
    rows = {"spatial": [], "global_in": [], "policy": [], "value": [],
            "score": [], "to_move": [], "turn": []}
    n_rows = 0
    for path in files:
        try:
            game = S.parse_sgf(open(path).read())[0]
        except S.SgfError:
            continue
        xs, ys = game.size
        if xs != size or ys != size:
            continue
        result = game.result or ""
        if result.startswith("B+"):
            score_w = -float(result[2:]) if result[2:].replace(
                ".", "").isdigit() else -1.0
        elif result.startswith("W+"):
            score_w = float(result[2:]) if result[2:].replace(
                ".", "").isdigit() else 1.0
        else:
            continue
        _, rules, states, moves = _replay(game)
        for i, (player, loc) in enumerate(moves):
            gs = H.replace_pos(states[i], to_move=jnp.int32(player))
            sp_f, gl_f = feat(gs)
            pol = np.zeros(nn1, np.float32)
            pol[min(loc, nn1 - 1)] = 1.0
            rows["spatial"].append(np.asarray(sp_f).reshape(size, size, 22))
            rows["global_in"].append(np.asarray(gl_f))
            rows["policy"].append(pol)
            sign = 1.0 if player == B.WHITE else -1.0
            rows["score"].append(score_w * sign)
            rows["value"].append([1.0 if score_w * sign > 0 else 0.0,
                                  1.0 if score_w * sign < 0 else 0.0, 0.0])
            rows["to_move"].append(player)
            rows["turn"].append(i)
            n_rows += 1
            if n_rows >= args.max_rows:
                break
        if n_rows >= args.max_rows:
            break
    if n_rows == 0:
        raise SystemExit("no usable rows found")
    n = n_rows
    td = np.zeros((n, 5, 4), np.float32)
    val = np.asarray(rows["value"], np.float32)
    sc = np.asarray(rows["score"], np.float32)
    td[:, :, 0] = val[:, None, 0]
    td[:, :, 1] = val[:, None, 1]
    td[:, :, 3] = sc[:, None]
    arrays = TW.pack_rows(
        spatial=np.asarray(rows["spatial"], np.float32),
        global_in=np.asarray(rows["global_in"], np.float32),
        policy_target=np.asarray(rows["policy"], np.float32),
        next_policy_target=np.zeros((n, nn1), np.float32),
        value_target=val, td_targets=td, score_target=sc,
        lead_target=np.zeros(n, np.float32),
        ownership_target=np.zeros((n, size * size), np.float32),
        self_komi=np.zeros(n, np.float32),
        turn_idx=np.asarray(rows["turn"], np.float32),
        visits=np.zeros(n, np.float32), size=size)
    # no search ownership/score-distr for external SGFs: weight 0
    arrays["globalTargetsNC"][:, 27] = 0.0
    TW.write_npz(args.output, arrays)
    print(json.dumps({"rows": n, "output": args.output,
                      "files_scanned": len(files)}))


def cmd_startposes(args):
    """Sample positions from SGFs into Sgf::PositionSample JSON lines
    (startposes.cpp), the wire format selfplay's startPosesFiles
    consume. Each sample stores the board a few moves before the
    sampled turn plus the context moves up to it; the sampled turn's
    move becomes hintLoc."""
    from katago_tpu.dataio.poses import PositionSample
    rng = random.Random(args.seed)
    files = sorted(glob.glob(os.path.join(args.sgf_dir, "*.sgf")))
    out = open(args.output, "w")
    count = 0
    num_context = 2
    for path in files:
        try:
            game = S.parse_sgf(open(path).read())[0]
        except S.SgfError:
            continue
        xs, ys = game.size
        if xs != ys:
            continue
        moves = game.moves()
        states = None
        for i in range(len(moves)):
            if rng.random() >= args.sample_prob:
                continue
            if states is None:
                _, _, states, _ = _replay(game)
            base = max(0, i - num_context)
            sample = PositionSample(
                x_size=xs, y_size=ys,
                stones=np.asarray(states[base].pos.board.stones, np.int8),
                next_pla=moves[base][0] if base < len(moves)
                else B.BLACK,
                moves=list(moves[base:i]),
                initial_turn_number=base,
                hint_loc=moves[i][1],
                weight=1.0,
                metadata=os.path.basename(path))
            out.write(sample.to_json_line() + "\n")
            count += 1
    out.close()
    print(json.dumps({"positions": count, "output": args.output}))


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="command", required=True)

    ev = sub.add_parser("evalsgf")
    ev.add_argument("sgf")
    ev.add_argument("-move-num", type=int, default=None)
    ev.add_argument("-model", default=None)
    ev.add_argument("-config", default="b6c96")
    ev.add_argument("-visits", type=int, default=64)
    ev.set_defaults(fn=cmd_evalsgf)

    wt = sub.add_parser("writetrainingdata")
    wt.add_argument("-sgf-dir", required=True)
    wt.add_argument("-output", required=True)
    wt.add_argument("-size", type=int, default=19)
    wt.add_argument("-max-rows", type=int, default=100000)
    wt.add_argument("-no-ladders", action="store_true")
    wt.set_defaults(fn=cmd_writetrainingdata)

    st = sub.add_parser("startposes")
    st.add_argument("-sgf-dir", required=True)
    st.add_argument("-output", required=True)
    st.add_argument("-sample-prob", type=float, default=0.05)
    st.add_argument("-seed", type=int, default=0)
    st.set_defaults(fn=cmd_startposes)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
