"""Synchronous training loop — python/selfplay/synchronous_loop.sh equivalent.

One process cycles the full closed loop on a directory tree shaped like the
reference's (SelfplayTraining.md:4-10):

  base/
    models/            accepted nets (selfplay reads newest)
    test-models/       candidates awaiting gatekeeping
    rejected-models/
    selfplay/          npz + sgf shards per model
    shuffleddata/      training shards
    ckpts/             learner state

Every stage is restart-elastic: each reads its inputs from directories and
can resume after being killed, as in the reference ("safe if killed at any
point").
"""

from __future__ import annotations

import argparse
import glob
import json
import os

from katago_tpu.cli.gatekeeper_cmd import run_gatekeeper
from katago_tpu.cli.selfplay_cmd import run_selfplay
from katago_tpu.cli.train_cmd import run_training
from katago_tpu.train.shuffle import shuffle_npz_files


def run_loop(base_dir: str, *, cycles: int, size: int, config_name: str,
             games_per_cycle: int, visits: int, train_steps: int,
             batch_size: int, lr: float, gate_games: int, seed: int = 0,
             log=print) -> list[dict]:
    dirs = {name: os.path.join(base_dir, name) for name in
            ("models", "test-models", "rejected-models", "selfplay",
             "shuffleddata", "ckpts")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    summary = []
    for cycle in range(cycles):
        log(f"=== cycle {cycle} ===")
        sp_stats = run_selfplay(
            dirs["selfplay"], dirs["models"], size=size,
            games_per_batch=games_per_cycle, visits=visits, max_batches=1,
            config_name=config_name, seed=seed * 1000 + cycle,
            data_quality="test", log=log)

        shards = sorted(glob.glob(os.path.join(dirs["selfplay"], "*", "tdata",
                                               "*.npz")))
        out_shards = shuffle_npz_files(
            shards, os.path.join(dirs["shuffleddata"], f"c{cycle:04d}"),
            seed=cycle)
        log(f"shuffled {len(shards)} shards -> {len(out_shards)}")

        tr_stats = run_training(
            os.path.dirname(out_shards[0]), dirs["ckpts"],
            dirs["test-models"], size=size, config_name=config_name,
            batch_size=batch_size, steps=train_steps, lr=lr,
            seed=seed, log=log)

        gk = run_gatekeeper(
            dirs["test-models"], dirs["models"], dirs["rejected-models"],
            size=size, config_name=config_name, games=gate_games,
            visits=visits, seed=cycle, log=log)

        summary.append({"cycle": cycle, "selfplay": sp_stats,
                        "train": tr_stats, "gatekeeper": gk})
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-base-dir", required=True)
    ap.add_argument("-cycles", type=int, default=1)
    ap.add_argument("-size", type=int, default=7)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-games-per-cycle", type=int, default=16)
    ap.add_argument("-visits", type=int, default=32)
    ap.add_argument("-train-steps", type=int, default=50)
    ap.add_argument("-batch-size", type=int, default=64)
    ap.add_argument("-lr", type=float, default=3e-4)
    ap.add_argument("-gate-games", type=int, default=8)
    args = ap.parse_args(argv)
    out = run_loop(args.base_dir, cycles=args.cycles, size=args.size,
                   config_name=args.config,
                   games_per_cycle=args.games_per_cycle, visits=args.visits,
                   train_steps=args.train_steps, batch_size=args.batch_size,
                   lr=args.lr, gate_games=args.gate_games)
    print(json.dumps(out, default=str)[:2000])


if __name__ == "__main__":
    main()
