"""selfplay command — training-data generator (reference cpp/command/selfplay.cpp).

Polls a models dir for the newest exported net (selfplay.cpp:140-151
semantics), plays batched MCTS games, writes reference-schema npz shards +
sgf records per model into the output dir structure the reference loop
uses: outdir/<model>/{tdata,sgfs}/.

Usage: python -m katago_tpu.cli.selfplay_cmd -output-dir D -models-dir M
         [-size 9] [-games-per-batch 32] [-visits 64] [-max-batches N]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import rules as R
from katago_tpu.search.params import SearchParams
from katago_tpu.selfplay.loop import play_games
from katago_tpu.train import checkpoint as C


def make_model(size: int, config_name: str):
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    cfg = MC.get_config(config_name)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    return model, params


def run_selfplay(output_dir: str, models_dir: str | None, *, size: int,
                 games_per_batch: int, visits: int, max_batches: int,
                 config_name: str = "b2c16", rules: R.Rules | None = None,
                 seed: int = 0, data_quality: str = "selfplay",
                 game_init=None, switch_nets: bool = False,
                 ladder_mode: str = "chase",
                 log=print) -> dict:
    # shard the game axis over every visible device (the reference's
    # multi-GPU selfplay via gpuIdxByServerThread, nneval.h:97)
    from katago_tpu.parallel import mesh as M
    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1 and games_per_batch % n_dev == 0:
        mesh = M.make_mesh()
        log(f"selfplay game axis sharded over {n_dev} devices")
    model, params = make_model(size, config_name)
    model_name = "random-init"
    if models_dir:
        latest = C.find_latest_model(models_dir)
        if latest:
            params = C.load_params(latest, params)
            model_name = os.path.basename(latest)
    log(f"selfplay: model={model_name} size={size} games/batch={games_per_batch} "
        f"visits={visits}")

    tdata_dir = os.path.join(output_dir, model_name, "tdata")
    sgf_dir = os.path.join(output_dir, model_name, "sgfs")
    os.makedirs(tdata_dir, exist_ok=True)
    os.makedirs(sgf_dir, exist_ok=True)

    rng = jax.random.PRNGKey(seed)
    host_rng = np.random.default_rng(seed * 77777 + 5)
    totals = {"games": 0, "rows": 0, "playouts": 0, "resignations": 0}
    sp = SearchParams.for_selfplay()
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.selfplay import gameinit as GI
    from katago_tpu.selfplay.playsettings import PlaySettings
    ps = PlaySettings.for_selfplay() if data_quality == "selfplay" \
        else PlaySettings.for_testing(visits)
    cfg = MC.get_config(config_name)
    # one flax module per board size; the params are shared (all layers
    # are size-independent, like the reference's nets)
    models_by_size = {size: model}

    def model_for(s: int):
        if s not in models_by_size:
            models_by_size[s] = KataGoModel(cfg, pos_len=s,
                                            dtype=jnp.float32)
        return models_by_size[s]

    params_provider = None
    if switch_nets and models_dir:
        state = {"name": model_name}

        def params_provider():
            latest = C.find_latest_model(models_dir)
            if latest and os.path.basename(latest) != state["name"]:
                state["name"] = os.path.basename(latest)
                log(f"  switching to net {state['name']} mid-game")
                return C.load_params(latest, params)
            return None

    from katago_tpu.dataio import sgf as S
    from katago_tpu.utils.signals import GracefulShutdown
    stop_ctx = GracefulShutdown(log)
    stop_ctx.__enter__()
    for batch_i in range(max_batches):
        if stop_ctx.requested:
            log("selfplay: drain requested, stopping before next batch")
            break
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        # GameInitializer: per-game sizes/rules/komi/handicap; one
        # lockstep bucket per sampled board size (play.h:76-150)
        if game_init is not None:
            specs = GI.sample_game_specs(game_init, games_per_batch,
                                         host_rng)
            buckets = GI.group_specs_by_size(specs)
        else:
            buckets = {size: None}
        b_rows, b_playouts, b_resigns, b_games = 0, 0, 0, 0
        shard_arrays = []
        sgf_lines = []
        for bsize, bspecs in sorted(buckets.items()):
            if bspecs is None:
                n_games, grules, nh, comp, fork, starts = (
                    games_per_batch, None, None, None, None, None)
            else:
                grules, nh, comp, fork, starts = \
                    GI.specs_to_rules_arrays(bspecs)
                n_games = len(bspecs)
            bmesh = mesh if (mesh is not None
                             and n_games % mesh.devices.size == 0) else None
            rng, bsub = jax.random.split(rng)
            data, stats = play_games(
                model_for(bsize).apply, params, size=bsize,
                num_games=n_games, visits=visits, rules=rules,
                search_params=sp, rng=bsub, play_settings=ps,
                game_rules=grules, num_handicap=nh, compensate_komi=comp,
                early_fork=fork, start_samples=starts,
                params_provider=params_provider,
                ladder_mode=ladder_mode,
                mesh=bmesh)
            arrays = data.to_npz_arrays(bsize,
                                        stats["white_minus_black"],
                                        komi_white=stats.get("komi_white"))
            shard_arrays.append((bsize, arrays))
            for g in range(n_games):
                score = stats["white_minus_black"][g]
                result = (f"W+{score:g}" if score > 0
                          else f"B+{-score:g}" if score < 0 else "0")
                moves = [(int(data.to_move[i]), int(
                    np.argmax(data.policy_target[i])))
                    for i in np.flatnonzero(data.game_idx == g)]
                komi_g = float(stats["komi_white"][g]) \
                    if "komi_white" in stats else \
                    (rules or R.Rules.tromp_taylorish()).komi
                sgf_lines.append(S.write_sgf(moves, bsize, bsize,
                                             komi=komi_g, result=result))
            b_rows += data.spatial.shape[0]
            b_playouts += stats["total_playouts"]
            b_resigns += stats.get("resignations", 0)
            b_games += n_games
        dt = time.time() - t0
        # one shard per (batch, size): mixed sizes can't share one npz
        # (spatial dims differ); the shuffler/trainer consume per-size
        for bsize, arrays in shard_arrays:
            shard = os.path.join(
                tdata_dir, f"batch{batch_i:06d}_{seed}_s{bsize}.npz")
            # write-then-rename so concurrent readers (async loop's
            # shuffler) never see a half-written file
            tmp = shard + ".tmp.npz"
            np.savez_compressed(tmp, **arrays)
            os.replace(tmp, shard)
        with open(os.path.join(sgf_dir,
                               f"batch{batch_i:06d}_{seed}.sgfs"),
                  "w") as f:
            f.write("\n".join(sgf_lines) + "\n")

        totals["games"] += b_games
        totals["rows"] += b_rows
        totals["playouts"] += b_playouts
        totals["resignations"] += b_resigns
        log(f"  batch {batch_i}: {b_games} games "
            f"({len(shard_arrays)} size buckets), {b_rows} rows, {dt:.1f}s "
            f"({b_playouts/max(dt,1e-9):.0f} playouts/s)")
    stop_ctx.__exit__()
    return totals


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-output-dir", required=True)
    ap.add_argument("-models-dir", default=None)
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-games-per-batch", type=int, default=32)
    ap.add_argument("-visits", type=int, default=64)
    ap.add_argument("-max-batches", type=int, default=4)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-seed", type=int, default=0)
    ap.add_argument("-data-quality", default="test",
                    choices=["selfplay", "test"],
                    help="selfplay = policy-init + cheap/full mixing + komi "
                         "randomization (production data); test = every "
                         "move full-searched and recorded")
    ap.add_argument("-init-config", default=None,
                    help="reference-style selfplay cfg with GameInitializer "
                         "keys (bSizes/bSizeRelProbs/koRules/scoringRules/"
                         "taxRules/komiStdev/handicapProb/...)")
    ap.add_argument("-switch-nets", action="store_true",
                    help="poll models-dir mid-game and switch to a newly "
                         "exported net (selfplay.cpp:336-343)")
    ap.add_argument("-ladder-mode", default="chase",
                    choices=["chase", "exact"],
                    help="in-search leaf ladder featurization (per-move "
                         "data writing is always exact)")
    args = ap.parse_args(argv)
    game_init = None
    if args.init_config:
        from katago_tpu.selfplay.gameinit import GameInitParams
        from katago_tpu.utils.config_parser import ConfigParser
        cp = ConfigParser(args.init_config)
        game_init = GameInitParams.from_config(
            {k: cp.get_string(k) for k in cp.keys()})
    totals = run_selfplay(args.output_dir, args.models_dir, size=args.size,
                          games_per_batch=args.games_per_batch,
                          visits=args.visits, max_batches=args.max_batches,
                          config_name=args.config, seed=args.seed,
                          data_quality=args.data_quality,
                          game_init=game_init, switch_nets=args.switch_nets,
                          ladder_mode=args.ladder_mode)
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
