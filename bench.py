"""Benchmark: selfplay MCTS playouts/s per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Headline metric per BASELINE.json: selfplay playouts/s per chip. The
reference publishes 10-20 playouts/s for its Eigen CPU backend with 15-20
block nets (/root/reference/README.md:104) and no GPU playouts/s figure;
vs_baseline is computed against 15 playouts/s (Eigen midpoint) until a GPU
reference figure is measured. Current bench config: 9x9 b6c96, batch of 64
games, 64 visits/move — will move to 19x19 b18c384 as rounds progress.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.parallel.mesh import setup_accelerator_dispatch
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    accel = setup_accelerator_dispatch()

    size = 9
    num_games = 64
    visits = 64
    cfg = MC.get_config("b6c96")
    model = KataGoModel(cfg, pos_len=size)

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
    # with_ladders=False: embedding the ladder solver inside the search scan
    # currently faults the tunneled TPU runtime's compiler (standalone
    # ladder featurization compiles and runs fine); search-internal evals
    # skip planes 14-17 until the ladder pass moves to a pallas kernel.
    search_fn = jax.jit(lambda r, k: mcts.run_search(
        model.apply, params, r, sp, k, size=size, num_sims=visits,
        max_nodes=visits + 3, with_ladders=False))

    # compile + warmup
    res = search_fn(roots, jax.device_put(jax.random.PRNGKey(1), accel))
    jax.block_until_ready(res.root_visits)

    import numpy as np
    keys = [jax.device_put(jax.random.PRNGKey(2 + i), accel)
            for i in range(40)]

    def measure(iters, key_off):
        t0 = time.time()
        for i in range(iters):
            res = search_fn(roots, keys[key_off + i])
            jax.block_until_ready(res.root_visits)
        return (time.time() - t0) / iters, res

    dt, res = measure(5, 0)
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
    baseline = 15.0  # reference Eigen CPU backend midpoint (README.md:104)
    print(json.dumps({
        "metric": "selfplay_playouts_per_s_per_chip_9x9_b6c96",
        "value": round(playouts_per_s, 1),
        "unit": "playouts/s",
        "vs_baseline": round(playouts_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
