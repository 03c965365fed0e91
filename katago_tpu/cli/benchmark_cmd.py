"""benchmark command — throughput measurement and batch-size tuning.

The reference's `katago benchmark` (cpp/command/benchmark.cpp:23-294)
sweeps numSearchThreads and prints visits/s plus an Elo-impact estimate
per setting. On TPU the tunable axis is the *games batch* (lockstep
searches share every NN eval), so this sweeps games-per-batch, reports
playouts/s, and estimates the Elo effect the same way the reference does:
more parallelism raises throughput but spends visits on a wider, shallower
front (benchmark.cpp computeEloEffect — here the analogue discounts by the
log-visits utilization of the batch).

Usage: python -m katago_tpu.cli.benchmark_cmd [-model M] [-config b6c96]
         [-size 19] [-visits 64] [-batches 1,2,4,...] [-seconds-per 10]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_benchmark(*, size: int, visits: int, batch_sizes: list[int],
                  config_name: str = "b6c96", model_path: str | None = None,
                  iters: int = 3, with_ladders: bool = True,
                  log=print) -> dict:
    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.parallel.mesh import setup_accelerator_dispatch
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    accel = setup_accelerator_dispatch()
    if model_path:
        from katago_tpu.models import desc as D
        net = D.load_model(model_path)
        apply_fn = D.make_desc_apply(net)
        params = None
        name = net.name
    else:
        from katago_tpu.models import config as MC
        from katago_tpu.models.model import KataGoModel
        cfg = MC.get_config(config_name)
        model = KataGoModel(cfg, pos_len=size)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 22)),
                            jnp.zeros((1, 19)))
        apply_fn = model.apply
        name = config_name

    sp = SearchParams.for_selfplay().to_arr()
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=2 * size * size)

    results = []
    log(f"benchmarking {name} at {size}x{size}, {visits} visits/move on "
        f"{jax.devices()[0].platform}")
    params = jax.device_put(params, accel) if params is not None else None
    for g in batch_sizes:
        roots = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (g,) + x.shape).copy(), gs)
        roots = jax.device_put(roots, accel)
        keys = [jax.device_put(jax.random.PRNGKey(i), accel)
                for i in range(iters + 1)]
        fn = jax.jit(lambda r, k: mcts.run_search(
            apply_fn, params, r, sp, k, size=size, num_sims=visits,
            max_nodes=visits + 3, with_ladders=with_ladders))
        t0 = time.time()
        res = fn(roots, keys[0])
        jax.block_until_ready(res.root_visits)
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(iters):
            res = fn(roots, keys[1 + i])
        jax.block_until_ready(res.root_visits)
        dt = (time.time() - t0) / iters
        pps = g * visits / dt
        results.append({"games_per_batch": g, "playouts_per_s": pps,
                        "s_per_search": dt, "compile_s": compile_s})
        log(f"  batch {g:4d}: {pps:10.1f} playouts/s "
            f"({dt*1000:.0f} ms/search, compile {compile_s:.1f}s)")

    # Elo-effect estimate in the spirit of benchmark.cpp:120-200: doubling
    # playouts is worth ~+120 Elo at these scales; a bigger batch helps by
    # raising throughput (more playouts per second of wall clock per game
    # when amortized over a full selfplay/match workload).
    base = results[0]["playouts_per_s"]
    for r in results:
        speedup = r["playouts_per_s"] / max(base, 1e-9)
        r["elo_effect_vs_first"] = 120.0 * np.log2(max(speedup, 1e-9))
    best = max(results, key=lambda r: r["playouts_per_s"])
    log(f"recommended games-per-batch: {best['games_per_batch']} "
        f"({best['playouts_per_s']:.0f} playouts/s, "
        f"{best['elo_effect_vs_first']:+.0f} Elo vs batch "
        f"{results[0]['games_per_batch']})")
    return {"results": results, "recommended": best["games_per_batch"],
            "device": jax.devices()[0].platform}


def run_train_benchmark(*, size: int, batch_sizes: list[int],
                        config_name: str = "b6c96", steps: int = 8,
                        log=print) -> dict:
    """Training-step throughput on synthetic reference-schema batches
    (the benchmark_fresh_model.py role): rows/s per batch size."""
    import optax

    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.train.train_step import (init_train_state,
                                             make_optimizer,
                                             make_train_step)

    cfg = MC.get_config(config_name)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    tx = make_optimizer()
    train_step = jax.jit(make_train_step(model.apply, tx))
    nn = size * size
    sb = cfg.scorebelief_len(size)
    rng = np.random.default_rng(0)
    results = []
    for b in batch_sizes:
        state = init_train_state(params, tx)
        batch = {
            "binaryInputNCHW": np.ones((b, 22, size, size), np.float32),
            "globalInputNC": np.zeros((b, 19), np.float32),
            "globalTargetsNC": rng.random((b, 80)).astype(np.float32),
            "policyTargetsNCMove": np.ones((b, 2, nn + 1), np.float32),
            "scoreDistrN": np.ones((b, sb), np.float32),
            "valueTargetsNCHW": np.zeros((b, 5, size, size), np.float32),
            "qValueTargetsNCMove": np.zeros((b, 3, nn + 1), np.float32),
        }
        batch["globalTargetsNC"][:, 25] = 1.0
        batch["globalTargetsNC"][:, 26] = 1.0
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, _ = train_step(state, batch)   # compile + warmup
        jax.block_until_ready(state.params)
        t0 = time.time()
        for _ in range(steps):
            state, metrics = train_step(state, batch)
        jax.block_until_ready(state.params)
        dt = (time.time() - t0) / steps
        results.append({"batch_size": b, "steps_per_s": round(1.0 / dt, 2),
                        "rows_per_s": round(b / dt, 1)})
        log(f"  train bench b={b}: {b / dt:.1f} rows/s")
    return {"train_results": results,
            "device": jax.devices()[0].platform}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-model", default=None)
    ap.add_argument("-config", default="b6c96")
    ap.add_argument("-size", type=int, default=19)
    ap.add_argument("-visits", type=int, default=64)
    ap.add_argument("-batches", default="1,8,32,64")
    ap.add_argument("-iters", type=int, default=3)
    ap.add_argument("-no-ladders", action="store_true")
    ap.add_argument("-train", action="store_true",
                    help="benchmark the training step instead of search "
                         "(benchmark_fresh_model.py)")
    args = ap.parse_args(argv)
    if args.train:
        out = run_train_benchmark(
            size=args.size,
            batch_sizes=[int(x) for x in args.batches.split(",")],
            config_name=args.config)
    else:
        out = run_benchmark(
            size=args.size, visits=args.visits,
            batch_sizes=[int(x) for x in args.batches.split(",")],
            config_name=args.config, model_path=args.model,
            iters=args.iters,
            with_ladders=not args.no_ladders)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
