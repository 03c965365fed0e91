"""Benchmark: selfplay MCTS playouts/s per chip at the north-star config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.md's target and the reference's production
selfplay settings (cpp/configs/training/selfplay1.cfg:84,115,120):
19x19, b18c384nbt, 600 visits/move, 128 parallel games (= NN batch 128),
ladder features ON (the reference featurizer always pays them,
nninputs.cpp:2548).

Baseline: the reference publishes no GPU playouts/s figure
(BASELINE.md). The strongest widely-reported number for its best GPU
backend is ~2,500 playouts/s for b18c384nbt 19x19 on a top consumer GPU
with TensorRT (README.md "OpenCL vs CUDA vs TensorRT vs Eigen" ranks
TensorRT fastest). vs_baseline is playouts/s divided by that figure;
the BASELINE.json target is >= 5x.

Robustness: when run as the top-level driver entry, the ladders-on
attempt executes in a child process with a hard timeout — the known
failure mode on the tunneled TPU runtime is the remote compiler
stalling on the combined ladder+search graph, which hangs rather than
raising. On timeout/crash the bench re-runs ladders-off so a round
always records a real number (the metric name flags the downgrade).

Environment knobs:
  BENCH_QUICK=1   small config (9x9 b6c96, 64 games, 64 visits) for CI
  BENCH_VISITS/BENCH_GAMES/BENCH_NO_LADDERS   overrides for bisection
  BENCH_CHILD=1   (internal) run the measurement directly, no fallback
  BENCH_ATTEMPT_TIMEOUT   seconds for the ladders-on attempt (1800)
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.parallel.mesh import setup_accelerator_dispatch
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    accel = setup_accelerator_dispatch()

    quick = os.environ.get("BENCH_QUICK", "") not in ("", "0")
    if quick:
        size, cfg_name, num_games, visits = 9, "b6c96", 64, 64
    else:
        size, cfg_name, num_games, visits = 19, "b18c384nbt", 128, 600
    visits = int(os.environ.get("BENCH_VISITS", visits))
    num_games = int(os.environ.get("BENCH_GAMES", num_games))
    with_ladders = os.environ.get("BENCH_NO_LADDERS", "") in ("", "0")

    cfg = MC.get_config(cfg_name)
    # bf16 trunk: MXU-native matmul/conv precision for inference
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.bfloat16)

    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=160)
    roots = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_games,) + x.shape).copy(), gs)

    spatial = jnp.zeros((num_games, size, size, 22), jnp.float32)
    glob = jnp.zeros((num_games, 19), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), spatial, glob)

    # explicit placement: jit follows the committed input devices
    roots = jax.device_put(roots, accel)
    params = jax.device_put(params, accel)

    sp = SearchParams.for_selfplay().to_arr()
    search_fn = jax.jit(lambda r, k: mcts.run_search(
        model.apply, params, r, sp, k, size=size, num_sims=visits,
        max_nodes=visits + 3, with_ladders=with_ladders))

    # compile + warmup
    t0 = time.time()
    res = search_fn(roots, jax.device_put(jax.random.PRNGKey(1), accel))
    jax.block_until_ready(res.root_visits)
    compile_s = time.time() - t0

    keys = [jax.device_put(jax.random.PRNGKey(2 + i), accel)
            for i in range(40)]

    def measure(iters, key_off):
        t0 = time.time()
        for i in range(iters):
            r = search_fn(roots, keys[key_off + i])
            jax.block_until_ready(r.root_visits)
        return (time.time() - t0) / iters, r

    iters = 5 if quick or visits <= 64 else 2
    dt, res = measure(iters, 0)
    # result sanity: every game must have run all its playouts (guards
    # against a flaky tunneled runtime returning without executing)
    rv = np.asarray(res.root_visits)
    assert (rv == visits + 1).all(), f"bad search result, visits={rv[:4]}"
    if dt < 0.05:
        # implausibly fast for this config: re-measure with a longer run
        dt, res = measure(30, 5)
        rv = np.asarray(res.root_visits)
        assert (rv == visits + 1).all()

    playouts_per_s = num_games * visits / dt
    if quick:
        metric = "selfplay_playouts_per_s_per_chip_9x9_b6c96"
        baseline = 15.0  # reference Eigen CPU midpoint (README.md:104)
    else:
        metric = ("selfplay_playouts_per_s_per_chip_19x19_b18c384"
                  + ("" if with_ladders else "_noladders"))
        baseline = 2500.0  # reference TensorRT top-GPU estimate (above)
    print(json.dumps({
        "metric": metric,
        "value": round(playouts_per_s, 1),
        "unit": "playouts/s",
        "vs_baseline": round(playouts_per_s / baseline, 2),
        "compile_s": round(compile_s, 1),
    }))


def main_with_fallback():
    """Attempt the full config in a child; fall back to ladders-off."""
    if (os.environ.get("BENCH_CHILD") or os.environ.get("BENCH_QUICK")
            or os.environ.get("BENCH_NO_LADDERS")):
        main()
        return
    env = dict(os.environ, BENCH_CHILD="1")
    budget = int(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "1800"))
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=budget)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return
    except subprocess.TimeoutExpired:
        pass
    # ladders-on stalled or failed: measure ladders-off so the round
    # still records a genuine number, flagged in the metric name
    env["BENCH_NO_LADDERS"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, timeout=budget)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if lines:
        print(lines[-1])
    else:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(1)


if __name__ == "__main__":
    main_with_fallback()
