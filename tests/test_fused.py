"""Fused on-device actor-learner: one jitted step advances games, fills
the device replay ring, and applies a gradient update — including under a
sharded mesh (game axis + ring sharded, params replicated)."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.models import config as MC
from katago_tpu.models.model import KataGoModel
from katago_tpu.selfplay import fused as FU
from katago_tpu.train.train_step import make_optimizer

SIZE = 5
NN = SIZE * SIZE


def _model_and_params():
    model = KataGoModel(MC.get_config("b1c6"), pos_len=SIZE)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SIZE, SIZE, 22)), jnp.zeros((1, 19)))
    return model, params


def test_fused_step_fills_ring_and_updates_params():
    model, params = _model_and_params()
    optimizer = make_optimizer(lr=1e-3, kind="sgd")
    opt_state = optimizer.init(params)
    g, cap, moves = 4, 64, 3
    games = FU.new_games(SIZE, g, max_moves=24)
    replay = FU.ReplayRing.create(cap, SIZE)
    step = jax.jit(FU.make_fused_step(
        model.apply, optimizer, size=SIZE, visits=8, batch_size=8,
        moves_per_chunk=moves))

    rng = jax.random.PRNGKey(1)
    metrics_hist = []
    for i in range(3):
        rng, sub = jax.random.split(rng)
        params, opt_state, games, replay, metrics = step(
            params, opt_state, games, replay, sub)
        metrics_hist.append(jax.tree.map(float, metrics))

    filled = int(replay.filled)
    assert filled == 3 * moves * g, filled
    # recorded rows: normalized policy targets, mover-persp values
    pol = np.asarray(replay.policy[:filled])
    np.testing.assert_allclose(pol.sum(1), 1.0, atol=1e-4)
    val = np.asarray(replay.value[:filled])
    np.testing.assert_allclose(val.sum(1), 1.0, atol=1e-4)
    assert (val >= 0).all() and (val <= 1).all()
    # spatial rows look like V7 planes (plane 0 = onboard mask, all ones)
    sp = np.asarray(replay.spatial[:filled])
    np.testing.assert_allclose(sp[:, :, 0], 1.0)
    assert all(np.isfinite(m["loss"]) for m in metrics_hist)
    # params changed
    leaf0 = jax.tree.leaves(params)[0]
    assert np.isfinite(np.asarray(leaf0)).all()


def test_fused_step_sharded_over_mesh():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    model, params = _model_and_params()
    optimizer = make_optimizer(lr=1e-3, kind="sgd")
    opt_state = optimizer.init(params)
    g, cap = 8, 64
    games = FU.new_games(SIZE, g, max_moves=24)
    replay = FU.ReplayRing.create(cap, SIZE)

    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    games = jax.tree.map(lambda x: jax.device_put(
        x, shard if x.ndim >= 1 and x.shape[0] == g else repl), games)
    params = jax.device_put(params, repl)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, repl)
        if hasattr(x, "ndim") else x, opt_state)
    replay = jax.tree.map(lambda x: jax.device_put(
        x, shard if x.ndim >= 1 and x.shape[0] == cap else repl), replay)

    step = jax.jit(FU.make_fused_step(
        model.apply, optimizer, size=SIZE, visits=6, batch_size=8,
        moves_per_chunk=2))
    params, opt_state, games, replay, metrics = step(
        params, opt_state, games, replay,
        jax.device_put(jax.random.PRNGKey(2), repl))
    assert int(replay.filled) == 2 * g
    assert np.isfinite(float(metrics["loss"]))
