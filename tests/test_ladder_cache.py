"""Per-node ladder-mask caching: the in-search featurizer path that reuses
parent/grandparent plane-14 masks must reproduce the 3-solve path exactly,
and the tree cache must hold each node's true current-board mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import ladder as LAD
from katago_tpu.game import rules as R
from katago_tpu.models import features as F
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams

SIZE = 7
NN = SIZE * SIZE


def _game_with_history(seed, moves=12):
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=64)
    rng = np.random.Generator(np.random.PCG64(seed))
    for _ in range(moves):
        legal = np.asarray(H.legal_moves(gs, SIZE)).copy()
        legal[NN] = False
        locs = np.flatnonzero(legal)
        if len(locs) == 0:
            break
        gs, _ = H.step(gs, jnp.int32(rng.choice(locs)), SIZE)
    return gs


@pytest.mark.parametrize("mode", ["chase", "exact"])
def test_cached_prev_masks_match_three_solve(mode):
    fp = F.FeatureParams.default()
    for seed in range(4):
        gs = _game_with_history(seed)
        legal = H.legal_moves(gs, SIZE)
        sp_a, gl_a = F.fill_features_v7(gs, SIZE, fp, legal,
                                        with_ladders=True, ladder_mode=mode)
        solve = (LAD.ladder_map_chase if mode == "chase" else LAD.ladder_map)
        prev = solve(gs.pos.prev_stones.astype(jnp.int32), SIZE,
                     ko_loc=gs.pos.prev_ko_loc).laddered
        pp = solve(gs.pos.prev_prev_stones.astype(jnp.int32), SIZE,
                   ko_loc=gs.pos.prev_prev_ko_loc).laddered
        sp_b, gl_b = F.fill_features_v7(gs, SIZE, fp, legal,
                                        with_ladders=True, ladder_mode=mode,
                                        prev_laddered=prev,
                                        prev_prev_laddered=pp)
        np.testing.assert_array_equal(np.asarray(sp_a), np.asarray(sp_b))
        np.testing.assert_array_equal(np.asarray(gl_a), np.asarray(gl_b))


def _stub_apply(params, sp_feat, gl_feat, metadata=None):
    b = sp_feat.shape[0]
    eps = jnp.mean(sp_feat, axis=(1, 2, 3))[:, None] * 1e-6
    return {
        "policy_logits": jnp.zeros((b, 2, NN + 1), jnp.float32)
            + eps[:, :, None],
        "value_logits": jnp.zeros((b, 3), jnp.float32) + eps,
        "miscvalue": jnp.zeros((b, 10), jnp.float32) + eps,
        "moremiscvalue": jnp.zeros((b, 8), jnp.float32) + eps,
        "ownership_pretanh": jnp.zeros((b, SIZE, SIZE, 1), jnp.float32),
    }


def test_tree_cache_holds_each_nodes_board_mask():
    gs = _game_with_history(7, moves=10)
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape),
                         gs)
    sp = SearchParams().to_arr()
    res = mcts.run_search(_stub_apply, None, roots, sp,
                          jax.random.PRNGKey(0), size=SIZE, num_sims=20,
                          max_nodes=32, with_ladders=True,
                          ladder_mode="chase")
    tree = res.ss
    n_nodes = int(tree.tree.num_nodes[0])
    assert n_nodes > 5
    for i in range(n_nodes):
        stones = tree.tree.pos.board.stones[0, i]
        ko = tree.tree.pos.board.ko_loc[0, i]
        want = np.asarray(
            LAD.ladder_map_chase(stones, SIZE, ko_loc=ko).laddered)
        got = np.asarray(tree.tree.laddered[0, i])
        np.testing.assert_array_equal(got, want, err_msg=f"node {i}")
