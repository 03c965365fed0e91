"""Training loop — python/selfplay/synchronous_loop.sh equivalent, plus
the reference's asynchronous production mode (SelfplayTraining.md
"asynchronous training": selfplay and the learner run concurrently over
the shared directory tree).

Directory tree (SelfplayTraining.md:4-10):

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

-mode async runs the selfplay generator in a background thread that
keeps producing data with the newest accepted net (switching nets
mid-stream via the models-dir poll) while the main thread cycles
shuffle -> train -> gatekeeper. The coupling is only through the
filesystem, exactly like the reference's multi-process fleet; a thread
suffices in-process because XLA releases the GIL during device work.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import threading

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
    from katago_tpu.utils.signals import GracefulShutdown
    stop_ctx = GracefulShutdown(log)
    stop_ctx.__enter__()
    for cycle in range(cycles):
        if stop_ctx.requested:
            log("loop: drain requested, stopping before next cycle")
            break
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
    stop_ctx.__exit__()
    return summary


def run_loop_async(base_dir: str, *, cycles: int, size: int,
                   config_name: str, games_per_cycle: int, visits: int,
                   train_steps: int, batch_size: int, lr: float,
                   gate_games: int, seed: int = 0, log=print) -> list[dict]:
    """Asynchronous mode: a producer thread generates selfplay data
    continuously (mid-stream net switching) while the main thread cycles
    shuffle -> train -> gatekeeper until `cycles` training cycles ran."""
    dirs = {name: os.path.join(base_dir, name) for name in
            ("models", "test-models", "rejected-models", "selfplay",
             "shuffleddata", "ckpts")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    stop = threading.Event()
    sp_totals: dict = {}

    def producer():
        batch_i = 0
        while not stop.is_set():
            stats = run_selfplay(
                dirs["selfplay"], dirs["models"], size=size,
                games_per_batch=games_per_cycle, visits=visits,
                max_batches=1, config_name=config_name,
                seed=seed * 1000 + batch_i, data_quality="test",
                switch_nets=True, log=lambda *a: None)
            for k, v in stats.items():
                sp_totals[k] = sp_totals.get(k, 0) + v
            batch_i += 1

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    summary = []
    from katago_tpu.utils.signals import GracefulShutdown
    with GracefulShutdown(log) as stop_ctx:
        try:
            for cycle in range(cycles):
                if stop_ctx.requested:
                    log("loop: drain requested")
                    break
                # wait for fresh data beyond what we already trained on
                import time as _time
                shards = []
                while not stop_ctx.requested:
                    shards = sorted(glob.glob(os.path.join(
                        dirs["selfplay"], "*", "tdata", "*.npz")))
                    if len(shards) > cycle:
                        break
                    _time.sleep(0.5)
                if not shards:
                    break
                log(f"=== async cycle {cycle}: {len(shards)} shards ===")
                out_shards = shuffle_npz_files(
                    shards,
                    os.path.join(dirs["shuffleddata"], f"c{cycle:04d}"),
                    seed=cycle)
                tr_stats = run_training(
                    os.path.dirname(out_shards[0]), dirs["ckpts"],
                    dirs["test-models"], size=size,
                    config_name=config_name, batch_size=batch_size,
                    steps=train_steps, lr=lr, seed=seed, log=log)
                gk = run_gatekeeper(
                    dirs["test-models"], dirs["models"],
                    dirs["rejected-models"], size=size,
                    config_name=config_name, games=gate_games,
                    visits=visits, seed=cycle, log=log)
                summary.append({"cycle": cycle, "train": tr_stats,
                                "gatekeeper": gk})
        finally:
            stop.set()
            t.join(timeout=600)
    summary.append({"selfplay_totals": sp_totals})
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
    ap.add_argument("-mode", default="sync", choices=["sync", "async"],
                    help="async = selfplay producer thread + concurrent "
                         "learner (SelfplayTraining.md asynchronous mode)")
    args = ap.parse_args(argv)
    fn = run_loop if args.mode == "sync" else run_loop_async
    out = fn(args.base_dir, cycles=args.cycles, size=args.size,
             config_name=args.config,
             games_per_cycle=args.games_per_cycle, visits=args.visits,
             train_steps=args.train_steps, batch_size=args.batch_size,
             lr=args.lr, gate_games=args.gate_games)
    print(json.dumps(out, default=str)[:2000])


if __name__ == "__main__":
    main()
