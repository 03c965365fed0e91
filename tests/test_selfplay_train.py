"""End-to-end slice: selfplay with MCTS -> training rows -> learner steps.

This is the build plan's 'minimum end-to-end slice' (SURVEY.md section 7
order-of-construction item 4): tiny net, small board, real search, real
loss decrease on the generated data.
"""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.models import config as MC
from katago_tpu.models.model import KataGoModel
from katago_tpu.search.params import SearchParams
from katago_tpu.selfplay.loop import play_games
from katago_tpu.train.train_step import (init_train_state, make_optimizer,
                                         make_train_step)

SIZE = 5


def test_selfplay_to_training_slice():
    cfg = MC.get_config("b1c6")
    model = KataGoModel(cfg, pos_len=SIZE, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    dummy_sp = jnp.zeros((1, SIZE, SIZE, 22))
    dummy_gl = jnp.zeros((1, 19))
    params = model.init(key, dummy_sp, dummy_gl)

    sp = SearchParams.for_selfplay()
    data, stats = play_games(
        model.apply, params, size=SIZE, num_games=4, visits=12,
        search_params=sp, rng=jax.random.PRNGKey(1))

    assert stats["all_finished"]
    assert data.spatial.shape[0] > 8  # a real number of positions
    # policy targets are distributions over legal-ish moves
    np.testing.assert_allclose(data.policy_target.sum(-1), 1.0, rtol=1e-4)
    # value targets one-hot-ish and consistent with score sign
    win_rows = data.score_target > 0
    assert (data.value_target[win_rows, 0] == 1.0).all()
    # ownership in [-1, 1]
    assert np.abs(data.ownership_target).max() <= 1.0

    # ---- learner: a few steps on the generated data reduce the loss ----
    # route through the reference npz schema (pack -> decode), the same
    # path the real training pipeline uses
    from katago_tpu.dataio import trainingwrite as TW
    optimizer = make_optimizer(lr=0.01)
    state = init_train_state(params, optimizer)
    train_step = jax.jit(make_train_step(model.apply, optimizer))

    arrays = data.to_npz_arrays(SIZE, np.asarray(stats["white_minus_black"]))
    batch = {k: jnp.asarray(v)
             for k, v in TW.decode_rows(arrays, SIZE).items()}
    losses = []
    for _ in range(20):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()
    assert int(state.step) == 20
    # EMA params differ from live params but stay close
    diff = jax.tree.map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                        state.params, state.ema_params)
    assert max(jax.tree.leaves(diff)) > 0
