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


def _position_hash(stones: np.ndarray, next_pla: int) -> int:
    """Host-side dedup hash of (board, mover) for unique-position
    iteration (sgf.cpp iterAllUniquePositions's uniqueHashes)."""
    import hashlib
    h = hashlib.blake2b(stones.tobytes() + bytes([next_pla]),
                        digest_size=8)
    return int.from_bytes(h.digest(), "little")


def _sgf_file_hash(path: str) -> str:
    import hashlib
    return hashlib.sha256(open(path, "rb").read()).hexdigest()[:32]


def _iter_sgf_files(args) -> list:
    files = list(getattr(args, "sgf", None) or [])
    for d in getattr(args, "sgf_dir", None) or []:
        files += sorted(glob.glob(os.path.join(d, "**", "*.sgf"),
                                  recursive=True))
    return files


def cmd_samplesgfs(args):
    """Sample weighted start positions from SGFs — samplesgfs
    (startposes.cpp:76-833). Weight = sampleWeight *
    exp(-turn * turnWeightLambda) (afterPassFactor when the previous
    move passed); %NOSAMPLE% comments skip, %SAMPLE% forces
    force-sample-weight; positions dedup on (board, mover) across all
    inputs; outputs rotate through outdir/startposes.*.txt plus a
    hashes file for later --exclude-hashes runs."""
    from katago_tpu.dataio.poses import PositionSample, PosWriter
    rng = random.Random(args.seed)
    files = _iter_sgf_files(args)
    exclude = set()
    for p in args.exclude_hashes or []:
        exclude |= {ln.strip() for ln in open(p) if ln.strip()}
    writer = PosWriter("txt", args.outdir, base="startposes")
    hashes_out = open(os.path.join(args.outdir, "sgfhashes.txt"), "w")
    seen: set = set()
    kept = 0
    weight_kept = 0.0
    num_context = 2
    for path in files:
        fh = _sgf_file_hash(path)
        if fh in exclude:
            continue
        hashes_out.write(fh + "\n")
        try:
            game = S.parse_sgf(open(path).read())[0]
        except (S.SgfError, OSError):
            continue
        xs, ys = game.size
        if xs != ys or game.handicap > args.max_handicap \
                or abs(game.komi) > args.max_komi:
            continue
        moves = game.moves()
        area = xs * ys
        lo = args.min_turn_board_area_prop * area
        hi = args.max_turn_board_area_prop * area
        nodes = game.main_line()
        states = None
        for i in range(len(moves)):
            if not (lo <= i <= hi):
                continue
            comment = (nodes[min(i, len(nodes) - 1)].get("C") or "")
            if "%NOSAMPLE%" in comment:
                continue
            if rng.random() >= args.sample_prob \
                    and "%SAMPLE%" not in comment:
                continue
            if states is None:
                _, _, states, _ = _replay(game)
            base = max(0, i - num_context)
            key = _position_hash(
                np.asarray(states[i].pos.board.stones, np.int8),
                moves[i][0])
            if key in seen:
                continue
            seen.add(key)
            w = args.sample_weight * np.exp(-i * args.turn_weight_lambda)
            if i > 0 and moves[i - 1][1] == area:
                w *= args.after_pass_factor
            if "%SAMPLE%" in comment:
                w = max(w, args.force_sample_weight)
            if w < args.min_weight:
                continue
            writer.write_pos(PositionSample(
                x_size=xs, y_size=ys,
                stones=np.asarray(states[base].pos.board.stones, np.int8),
                next_pla=moves[base][0] if base < len(moves) else B.BLACK,
                moves=list(moves[base:i]),
                initial_turn_number=base,
                hint_loc=-1, weight=float(w),
                metadata=os.path.basename(path)))
            kept += 1
            weight_kept += w
    writer.flush_and_stop()
    hashes_out.close()
    print(json.dumps({"kept": kept, "weightKept": round(weight_kept, 3),
                      "files": len(files), "outdir": args.outdir}))


def _load_net(args, size: int):
    if args.model:
        from katago_tpu.models import desc as D
        net = D.load_model(args.model)
        return D.make_desc_apply(net), None
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    model = KataGoModel(MC.get_config(args.config), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    return (lambda p, s, g: model.apply(params, s, g)), None


def _stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def _surprise_weight(policy_prob: float) -> float:
    """surpriseWeight (startposes.cpp:812-832) without the random
    rounding: how interesting a low-prior move is."""
    if policy_prob < 0:
        return 0.0
    return max(0.12 / (policy_prob + 0.02) - 0.5, 0.0)


def cmd_dataminesgfs(args):
    """Mine SGFs for surprising good moves — dataminesgfs
    (startposes.cpp:835-2136), redesigned for the batched TPU engine:

    game-mode: every position whose PLAYED move has low policy prior
    (< --max-policy, sampled by surpriseWeight) is a candidate; all
    candidates across all games run THREE batched searches (full /5
    /25 visit tiers, one vmapped device program per tier instead of the
    reference's per-position thread pool). A candidate becomes a hint
    pos when the full search picks the played move, with the
    reference's weight shaping (value-fluctuation terms, quick-search
    discounts, turn lambda).

    surprise-mode: positions where the full search's value swings from
    the quick search's (|du| > 0.2 toward the mover = surprising good
    -> hint; against = inevitable bad -> plain sample).

    tree-mode: candidates come from every branch of the SGF tree
    (variations included), not just the main line."""
    from katago_tpu.dataio.poses import PositionSample, PosWriter
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    if int(args.game_mode) + int(args.tree_mode) \
            + int(args.surprise_mode) != 1:
        raise SystemExit("specify exactly one of --game-mode / "
                         "--tree-mode / --surprise-mode")
    rng = random.Random(args.seed)
    files = _iter_sgf_files(args)
    exclude = set()
    for p in args.exclude_hashes or []:
        exclude |= {ln.strip() for ln in open(p) if ln.strip()}

    # ---- stage 1: collect candidate positions over all games ----------
    cands = []   # dict(state, played, pla, game_moves, i, path, xs)
    num_context = 2
    for path in files:
        if _sgf_file_hash(path) in exclude:
            continue
        try:
            game = S.parse_sgf(open(path).read())[0]
        except (S.SgfError, OSError):
            continue
        xs, ys = game.size
        if xs != ys or xs != args.size \
                or game.handicap > args.max_handicap \
                or abs(game.komi) > args.max_komi:
            continue
        lines = [game.moves()]
        if args.tree_mode:
            lines = _branch_lines(game)
        for moves in lines:
            if len(moves) < args.min_turn + 1:
                continue
            _, _, states, _ = _replay_moves(game, moves)
            for i in range(args.min_turn, len(moves)):
                stones = np.asarray(states[i].pos.board.stones)
                if int(((stones == B.BLACK) | (stones == B.WHITE)).sum()) < 6:
                    continue
                cands.append(dict(state=states[i], played=moves[i][1],
                                  pla=moves[i][0], moves=moves, i=i,
                                  path=path, xs=xs))
    if not cands:
        print(json.dumps({"hints": 0, "candidates": 0}))
        return

    size = args.size
    apply_fn, _ = _load_net(args, size)
    nn = size * size

    # ---- stage 2: one batched NN screen over every candidate ----------
    from katago_tpu.models import features as F
    fp = F.FeatureParams.default()
    priors = np.zeros((len(cands),), np.float32)
    bs = 256
    feat_fn = jax.jit(jax.vmap(
        lambda gs: F.fill_features_v7(gs, size, fp)))
    for lo in range(0, len(cands), bs):
        batch = cands[lo:lo + bs]
        st = _stack_states([c["state"] for c in batch])
        spf, glf = feat_fn(st)
        raw = apply_fn(None, jnp.asarray(spf).reshape(-1, size, size, 22),
                       jnp.asarray(glf).reshape(-1, 19))
        pol = jax.nn.softmax(raw["policy_logits"][:, 0, :], axis=-1)
        pol = np.asarray(pol)
        for j, c in enumerate(batch):
            priors[lo + j] = pol[j, c["played"]]

    if args.surprise_mode:
        keep = [c for c in cands
                if rng.random() < args.surprise_sample_prob]
    else:
        # game-mode and tree-mode share the low-prior gate
        # (maxPolicy + surpriseWeight sampling, startposes.cpp:1720)
        keep = []
        for j, c in enumerate(cands):
            w = _surprise_weight(float(priors[j]))
            if priors[j] <= args.max_policy and \
                    rng.random() < min(w, 1.0) + 0.05:
                c["surprise"] = w
                keep.append(c)
    if not keep:
        print(json.dumps({"hints": 0, "candidates": len(cands)}))
        return

    # ---- stage 3: three batched search tiers --------------------------
    sp = SearchParams(root_noise_enabled=False).to_arr()
    tiers = {"full": args.visits,
             "quick": max(args.visits // 5, 8),
             "vquick": max(args.visits // 25, 4)}
    results = {}
    roots = _stack_states([c["state"] for c in keep])
    for name, visits in tiers.items():
        fn = jax.jit(lambda r, k, v=visits: mcts.run_search(
            apply_fn, None, r, sp, k, size=size, num_sims=v,
            max_nodes=v + 3))
        res = fn(roots, jax.random.PRNGKey(args.seed))
        results[name] = dict(
            best=np.asarray(jnp.argmax(res.child_visits, axis=1)),
            util=np.asarray(res.root_utility),
        )

    # ---- stage 4: weight + write hints --------------------------------
    writer = PosWriter("txt", args.outdir, base="hintposes")
    hints = 0
    for j, c in enumerate(keep):
        du_q = abs(float(results["full"]["util"][j]
                         - results["quick"]["util"][j]))
        du_vq = abs(float(results["full"]["util"][j]
                          - results["vquick"]["util"][j]))
        full_best = int(results["full"]["best"][j])
        pla_sign = 1.0 if c["pla"] == B.WHITE else -1.0
        if args.surprise_mode:
            swing = pla_sign * float(results["full"]["util"][j]
                                     - results["vquick"]["util"][j])
            if swing > args.utility_threshold:
                hint, w = c["played"], 1.0 + abs(swing)
            elif swing < -args.utility_threshold:
                hint, w = -1, 1.0 + abs(swing)
            else:
                continue
        else:
            if full_best != c["played"]:
                continue
            w = c["surprise"] + du_q + du_vq
            if int(results["quick"]["best"][j]) == full_best:
                w = w * 0.75 - 0.1
            if int(results["vquick"]["best"][j]) == full_best:
                w = w * 0.75 - 0.1
            w *= float(np.exp(-c["i"] * args.turn_weight_lambda))
            if w <= 0.1:
                continue
            hint = c["played"]
        i, moves = c["i"], c["moves"]
        base = max(0, i - num_context)
        _, _, states, _ = _replay_moves(
            S.parse_sgf(open(c["path"]).read())[0], moves[:i])
        writer.write_pos(PositionSample(
            x_size=c["xs"], y_size=c["xs"],
            stones=np.asarray(states[base].pos.board.stones, np.int8),
            next_pla=moves[base][0],
            moves=list(moves[base:i]),
            initial_turn_number=base, hint_loc=hint,
            weight=float(w), metadata=os.path.basename(c["path"])))
        hints += 1
    writer.flush_and_stop()
    print(json.dumps({"hints": hints, "candidates": len(cands),
                      "searched": len(keep), "outdir": args.outdir}))


def _branch_lines(game: S.SgfGame) -> list:
    """All root-to-leaf move lines of the SGF tree (tree-mode walks
    variations, startposes.cpp treePosHandler)."""
    xs, ys = game.size
    lines = []

    def walk(node, moves):
        here = list(moves)
        for key, player in (("B", 1), ("W", 2)):
            if key in node.props:
                here.append((player,
                             S.parse_sgf_loc(node.props[key][0], xs, ys)))
        if not node.children:
            lines.append(here)
            return
        for ch in node.children:
            walk(ch, here)

    walk(game.root, [])
    return lines


def _replay_moves(game: S.SgfGame, moves):
    """_replay on an explicit move list (variation branches)."""
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
    gmoves = [(p, S.remap_to_grid(l, xs, ys, size)) for p, l in moves]
    for player, loc in gmoves:
        gs = H.replace_pos(gs, to_move=jnp.int32(player))
        gs, _ = H.step(gs, jnp.int32(loc), size)
        states.append(gs)
    return size, rules, states, gmoves


def cmd_viewstartposes(args):
    """Print startposes from pose files — viewstartposes
    (startposes.cpp:2138-2330): board + context moves + hint, filtered
    by --min-weight / --idx; --check-legality flags poses whose
    context moves or hint are illegal in our engine."""
    from katago_tpu.dataio.poses import load_poses
    poses = load_poses(args.start_poses_file)
    shown = 0
    illegal = 0
    for idx, pose in enumerate(poses):
        if args.idx >= 0 and idx != args.idx:
            continue
        if pose.weight < args.min_weight:
            continue
        size = max(pose.x_size, pose.y_size)
        bad = None
        if args.check_legality:
            gs = H.new_game(size, H.RulesArr.from_rules(
                R.Rules.tromp_taylorish()), max_hist=2 * size * size + 32)
            for loc in range(pose.x_size * pose.y_size):
                if pose.stones[loc]:
                    gs = H.setup_stone(gs, loc, int(pose.stones[loc]),
                                       size)
            for player, loc in pose.moves:
                gs = H.replace_pos(gs, to_move=jnp.int32(player))
                legal = H.legal_moves(gs, size)
                if loc < size * size and not bool(np.asarray(legal)[loc]):
                    bad = f"illegal context move {loc}"
                    break
                gs, _ = H.step(gs, jnp.int32(loc), size)
            if bad is None and pose.hint_loc >= 0 \
                    and pose.hint_loc < size * size:
                legal = np.asarray(H.legal_moves(gs, size))
                if not bool(legal[pose.hint_loc]):
                    bad = f"illegal hint {pose.hint_loc}"
            if bad is not None:
                illegal += 1
            if bad is None:
                continue   # check mode prints only problems
        print(f"--- pose {idx} weight {pose.weight:.3f} "
              f"nextPla {'B' if pose.next_pla == B.BLACK else 'W'} "
              f"hint {pose.hint_loc} {pose.metadata} "
              f"{('[' + bad + ']') if bad else ''}")
        print(B.board_to_string(pose.stones.astype(np.int32),
                                pose.x_size))
        shown += 1
    print(json.dumps({"poses": len(poses), "shown": shown,
                      "illegal": illegal}))


def cmd_checksgfhintpolicy(args):
    """Batch-check the net's policy mass on hint moves —
    checksgfhintpolicy (startposes.cpp:2332-2628): replays each hint
    pose, one batched forward over all of them, reports the hint's
    policy prob and rank (low-prob hints are the valuable ones)."""
    from katago_tpu.dataio.poses import load_poses
    from katago_tpu.models import features as F
    poses = [p for p in load_poses(args.start_poses_file)
             if p.hint_loc >= 0]
    if not poses:
        print(json.dumps({"hints": 0}))
        return
    size = max(poses[0].x_size, poses[0].y_size)
    apply_fn, _ = _load_net(args, size)
    fp = F.FeatureParams.default()
    states = []
    for pose in poses:
        gs = H.new_game(size, H.RulesArr.from_rules(
            R.Rules.tromp_taylorish()), max_hist=2 * size * size + 32)
        for loc in range(pose.x_size * pose.y_size):
            if pose.stones[loc]:
                gs = H.setup_stone(gs, loc, int(pose.stones[loc]), size)
        for player, loc in pose.moves:
            gs = H.replace_pos(gs, to_move=jnp.int32(player))
            gs, _ = H.step(gs, jnp.int32(loc), size)
        states.append(gs)
    feat_fn = jax.jit(jax.vmap(
        lambda gs: F.fill_features_v7(gs, size, fp)))
    probs = []
    ranks = []
    bs = 256
    for lo in range(0, len(states), bs):
        st = _stack_states(states[lo:lo + bs])
        spf, glf = feat_fn(st)
        raw = apply_fn(None, jnp.asarray(spf).reshape(-1, size, size, 22),
                       jnp.asarray(glf).reshape(-1, 19))
        pol = np.asarray(jax.nn.softmax(raw["policy_logits"][:, 0, :],
                                        axis=-1))
        for j, pose in enumerate(poses[lo:lo + bs]):
            p = float(pol[j, pose.hint_loc])
            probs.append(p)
            ranks.append(int((pol[j] > p).sum()))
    for idx, (pose, p, rk) in enumerate(zip(poses, probs, ranks)):
        print(f"pose {idx} hint {pose.hint_loc} policy {p:.5f} "
              f"rank {rk} weight {pose.weight:.3f}")
    print(json.dumps({
        "hints": len(poses),
        "meanPolicy": round(float(np.mean(probs)), 5),
        "fracBelow2pct": round(float(np.mean(np.asarray(probs) < 0.02)),
                               4)}))


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

    ss = sub.add_parser("samplesgfs")
    ss.add_argument("--sgf", action="append")
    ss.add_argument("--sgfdir", dest="sgf_dir", action="append")
    ss.add_argument("--outdir", required=True)
    ss.add_argument("--sample-prob", type=float, required=True)
    ss.add_argument("--sample-weight", type=float, default=1.0)
    ss.add_argument("--force-sample-weight", type=float, default=5.0)
    ss.add_argument("--turn-weight-lambda", type=float, default=0.0)
    ss.add_argument("--after-pass-factor", type=float, default=1.0)
    ss.add_argument("--min-weight", type=float, default=0.0)
    ss.add_argument("--min-turn-number-board-area-prop", type=float,
                    dest="min_turn_board_area_prop", default=0.0)
    ss.add_argument("--max-turn-number-board-area-prop", type=float,
                    dest="max_turn_board_area_prop", default=1e9)
    ss.add_argument("--max-handicap", type=int, default=9)
    ss.add_argument("--max-komi", type=float, default=150.0)
    ss.add_argument("--exclude-hashes", action="append")
    ss.add_argument("--seed", type=int, default=0)
    ss.set_defaults(fn=cmd_samplesgfs)

    dm = sub.add_parser("dataminesgfs")
    dm.add_argument("--sgf", action="append")
    dm.add_argument("--sgfdir", dest="sgf_dir", action="append")
    dm.add_argument("--outdir", required=True)
    dm.add_argument("--model", default=None)
    dm.add_argument("--config", default="b6c96")
    dm.add_argument("--size", type=int, default=19)
    dm.add_argument("--game-mode", action="store_true")
    dm.add_argument("--tree-mode", action="store_true")
    dm.add_argument("--surprise-mode", action="store_true")
    dm.add_argument("--visits", type=int, default=300)
    dm.add_argument("--max-policy", type=float, default=0.1)
    dm.add_argument("--utility-threshold", type=float, default=0.2)
    dm.add_argument("--turn-weight-lambda", type=float, default=0.0)
    dm.add_argument("--surprise-sample-prob", type=float, default=1.0)
    dm.add_argument("--min-turn", type=int, default=0)
    dm.add_argument("--max-handicap", type=int, default=9)
    dm.add_argument("--max-komi", type=float, default=150.0)
    dm.add_argument("--exclude-hashes", action="append")
    dm.add_argument("--seed", type=int, default=0)
    dm.set_defaults(fn=cmd_dataminesgfs)

    vs = sub.add_parser("viewstartposes")
    vs.add_argument("--start-poses-file", action="append", required=True)
    vs.add_argument("--min-weight", type=float, default=0.0)
    vs.add_argument("--idx", type=int, default=-1)
    vs.add_argument("--check-legality", action="store_true")
    vs.set_defaults(fn=cmd_viewstartposes)

    ch = sub.add_parser("checksgfhintpolicy")
    ch.add_argument("--start-poses-file", action="append", required=True)
    ch.add_argument("--model", default=None)
    ch.add_argument("--config", default="b6c96")
    ch.set_defaults(fn=cmd_checksgfhintpolicy)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
