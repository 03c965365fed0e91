"""Tests for ops/symmetry.py and the nnRandomize path in the search
evaluator (reference nneval.h:169-179: a symmetry-transformed query must
come back in canonical orientation)."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import features as F
from katago_tpu.ops import symmetry as SYM
from katago_tpu.search import mcts

SIZE = 5
NN = SIZE * SIZE


def test_perm_tables_are_group_bijections():
    f = SYM.loc_perm(SIZE)
    inv = SYM.inv_loc_perm(SIZE)
    for s in range(8):
        assert sorted(f[s]) == list(range(NN + 1))
        assert (inv[s][f[s]] == np.arange(NN + 1)).all()
        assert f[s][NN] == NN  # pass is a fixed point


def test_transform_untransform_roundtrip():
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(NN, 7)).astype(np.float32))
    for s in range(8):
        sym = jnp.int32(s)
        t = SYM.transform_spatial(feat, sym, SIZE)
        back = SYM.untransform_spatial(t, sym, SIZE)
        assert np.allclose(np.asarray(back), np.asarray(feat))


def test_transform_matches_grid_flip():
    # flipX (sym=2) must equal flipping the x axis of the grid
    rng = np.random.default_rng(1)
    feat = rng.normal(size=(NN, 3)).astype(np.float32)
    grid = feat.reshape(SIZE, SIZE, 3)
    t = np.asarray(SYM.transform_spatial(jnp.asarray(feat), jnp.int32(2),
                                         SIZE)).reshape(SIZE, SIZE, 3)
    assert np.allclose(t, grid[:, ::-1])
    # flipY (sym=4)
    t = np.asarray(SYM.transform_spatial(jnp.asarray(feat), jnp.int32(4),
                                         SIZE)).reshape(SIZE, SIZE, 3)
    assert np.allclose(t, grid[::-1, :])


def equivariant_stub():
    """Policy logits = a fixed spatial function of the input planes, so a
    symmetry-transformed input yields exactly the transformed policy —
    letting us check the evaluator's untransform restores canonical
    orientation bit-exactly."""

    def apply(params, spatial, glob):
        g = spatial.shape[0]
        per_cell = spatial.sum(axis=-1).reshape(g, NN)   # [G, NN]
        pol = jnp.concatenate([per_cell, jnp.zeros((g, 1))], axis=-1)
        own = spatial[..., :1] * 0.1                      # [G, H, W, 1]
        return {
            "policy_logits": jnp.broadcast_to(pol[:, None, :], (g, 6, NN + 1)),
            "value_logits": jnp.zeros((g, 3)),
            "miscvalue": jnp.zeros((g, 10)),
            "moremiscvalue": jnp.zeros((g, 8)),
            "ownership_pretanh": own,
        }

    return apply


def test_evaluator_symmetry_is_transparent():
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    64)
    # play a few moves to break the symmetry of the position
    for mv in (6, 12, 7, 18):
        gs, _ = H.step(gs, jnp.int32(mv), SIZE)
    games = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape),
                         gs)
    ev = mcts.make_nn_evaluator(equivariant_stub(), None, SIZE)
    fp = F.FeatureParams.default()
    raw0, legal0, _ = jax.jit(lambda g: ev(g, fp))(games)
    syms = jnp.arange(8, dtype=jnp.int32)
    raw1, legal1, _ = jax.jit(lambda g, s: ev(g, fp, sym=s))(games, syms)
    np.testing.assert_allclose(np.asarray(raw1["policy_logits"]),
                               np.asarray(raw0["policy_logits"]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(raw1["ownership_pretanh"]),
                               np.asarray(raw0["ownership_pretanh"]),
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(legal0) == np.asarray(legal1)).all()


def test_search_with_random_symmetry_runs():
    from katago_tpu.search.params import SearchParams
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    64)
    games = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), gs)
    sp = SearchParams(nn_random_symmetry=True).to_arr()
    res = jax.jit(lambda r, k: mcts.run_search(
        equivariant_stub(), None, r, sp, k, size=SIZE, num_sims=12,
        max_nodes=15, with_ladders=False, root_num_symmetries=2))(
            games, jax.random.PRNGKey(0))
    assert (np.asarray(res.root_visits) == 13).all()
