"""Multi-device product-path tests on the virtual 8-device CPU mesh.

The reference scales selfplay across GPUs (nneval.h:97 multi-GPU server
threads) and training across GPUs via DDP/NCCL (train.py:252-319). Here
both become one sharded axis: these tests verify the ACTUAL product paths
(selfplay.loop.play_games, cli.train_cmd.run_training, mcts.run_search)
execute SPMD across all 8 devices, not just a dryrun harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.parallel import mesh as M
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams

from tests.test_search import SIZE, neutral_model

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_search_step():
    """run_search with the game axis sharded over 8 devices: output root
    visits stay sharded and correct."""
    mesh = M.make_mesh(8)
    g = 16
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    64)
    roots = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (g,) + x.shape).copy(), gs)
    roots = M.shard_batch(roots, mesh)
    sp = SearchParams().to_arr()
    num_sims = 12
    fn = jax.jit(lambda r, k: mcts.run_search(
        neutral_model(), None, r, sp, k, size=SIZE, num_sims=num_sims,
        max_nodes=num_sims + 3, max_depth=16))
    res = fn(roots, jax.random.PRNGKey(0))
    rv = res.root_visits
    assert len(rv.sharding.device_set) == 8, rv.sharding
    assert (np.asarray(rv) == num_sims + 1).all()


def test_sharded_selfplay_play_games():
    """The real selfplay driver with mesh=: games finish, data is recorded,
    and per-move device work is split across the mesh."""
    from katago_tpu.selfplay.loop import play_games
    from katago_tpu.selfplay.playsettings import PlaySettings

    mesh = M.make_mesh(8)
    data, stats = play_games(
        neutral_model(), None, size=SIZE, num_games=8, visits=6,
        max_moves=14, rng=jax.random.PRNGKey(1), mesh=mesh,
        play_settings=PlaySettings.for_testing(6))
    assert data is not None and data.spatial.shape[0] > 0
    assert stats["moves_per_game"].shape == (8,)

    with pytest.raises(ValueError, match="not divisible"):
        play_games(neutral_model(), None, size=SIZE, num_games=6, visits=4,
                   max_moves=4, mesh=mesh, record=False)


def test_sharded_train_cmd(tmp_path):
    """cli.train_cmd.run_training shards its batch over every device."""
    from katago_tpu.selfplay.loop import play_games
    from katago_tpu.cli.train_cmd import run_training

    data, stats = play_games(
        neutral_model(), None, size=SIZE, num_games=4, visits=6,
        max_moves=12, rng=jax.random.PRNGKey(2))
    arrays = data.to_npz_arrays(SIZE, stats["white_minus_black"])
    d = tmp_path / "tdata"
    d.mkdir()
    np.savez_compressed(d / "a.npz", **arrays)
    out = run_training(str(d), str(tmp_path / "ckpt"), None, size=SIZE,
                       config_name="b1c6", batch_size=16, steps=3,
                       lr=1e-3, log=lambda *a: None)
    assert np.isfinite(out["final_loss"])


def test_train_cmd_batch_divisibility(tmp_path):
    from katago_tpu.cli.train_cmd import run_training
    (tmp_path / "x.npz").write_bytes(b"")
    with pytest.raises(ValueError, match="not divisible"):
        run_training(str(tmp_path), str(tmp_path / "c"), None, size=SIZE,
                     config_name="b1c6", batch_size=7, steps=1, lr=1e-3,
                     log=lambda *a: None)
