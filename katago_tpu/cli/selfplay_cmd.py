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
    totals = {"games": 0, "rows": 0, "playouts": 0}
    sp = SearchParams.for_selfplay()
    from katago_tpu.selfplay.playsettings import PlaySettings
    ps = PlaySettings.for_selfplay() if data_quality == "selfplay" \
        else PlaySettings.for_testing(visits)
    for batch_i in range(max_batches):
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        data, stats = play_games(
            model.apply, params, size=size, num_games=games_per_batch,
            visits=visits, rules=rules, search_params=sp, rng=sub,
            play_settings=ps, mesh=mesh)
        dt = time.time() - t0
        arrays = data.to_npz_arrays(size, stats["white_minus_black"],
                                    komi_white=stats.get("komi_white"))
        shard = os.path.join(tdata_dir, f"batch{batch_i:06d}_{seed}.npz")
        np.savez_compressed(shard, **arrays)

        # sgf records (one file per batch, reference writes per-model sgfs)
        from katago_tpu.dataio import sgf as S
        with open(os.path.join(sgf_dir, f"batch{batch_i:06d}_{seed}.sgfs"), "w") as f:
            for g in range(games_per_batch):
                score = stats["white_minus_black"][g]
                result = (f"W+{score:g}" if score > 0
                          else f"B+{-score:g}" if score < 0 else "0")
                moves = [(int(data.to_move[i]), int(
                    np.argmax(data.policy_target[i])))
                    for i in np.flatnonzero(data.game_idx == g)]
                f.write(S.write_sgf(moves, size, size,
                                    komi=(rules or R.Rules.tromp_taylorish()).komi,
                                    result=result) + "\n")

        totals["games"] += games_per_batch
        totals["rows"] += data.spatial.shape[0]
        totals["playouts"] += stats["total_playouts"]
        log(f"  batch {batch_i}: {games_per_batch} games, "
            f"{data.spatial.shape[0]} rows, {dt:.1f}s "
            f"({stats['total_playouts']/dt:.0f} playouts/s)")
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
    args = ap.parse_args(argv)
    totals = run_selfplay(args.output_dir, args.models_dir, size=args.size,
                          games_per_batch=args.games_per_batch,
                          visits=args.visits, max_batches=args.max_batches,
                          config_name=args.config, seed=args.seed,
                          data_quality=args.data_quality)
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
