"""Cached fast-descent selection (Tree.best_action) must reproduce the
classic descent-time PUCT exactly: a search driven with a no-op anti-mirror
verdict (mirroring=False everywhere, which keeps the full per-level PUCT
evaluation path) and one without (the cached-argmax path) build identical
trees."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search import mcts
from katago_tpu.search.mirror import MirrorArrs
from katago_tpu.search.params import SearchParams

SIZE = 7
NN = SIZE * SIZE


def _stub_apply(params, sp_feat, gl_feat, metadata=None):
    b = sp_feat.shape[0]
    # position-dependent pseudo-policy/value so trees are nontrivial
    h = jnp.sum(sp_feat[:, :, :, 1] * jnp.arange(NN)[None, :].reshape(
        1, SIZE, SIZE), axis=(1, 2))
    key = jnp.arange(b, dtype=jnp.float32) * 0.0 + h * 0.013
    logits = jnp.sin(key[:, None] + jnp.arange(NN + 1) * 0.37)[:, None, :]
    return {
        "policy_logits": jnp.broadcast_to(logits, (b, 2, NN + 1)),
        "value_logits": jnp.stack(
            [jnp.sin(key), -jnp.sin(key), jnp.zeros_like(key)], axis=1),
        "miscvalue": jnp.zeros((b, 10), jnp.float32)
            + jnp.cos(key)[:, None] * 0.3,
        "moremiscvalue": jnp.zeros((b, 8), jnp.float32),
        "ownership_pretanh": jnp.zeros((b, SIZE, SIZE, 1), jnp.float32),
    }


def test_cached_descent_matches_classic_puct():
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=64)
    g = 3
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (g,) + x.shape), gs)
    # graph-search transpositions update a shared child through OTHER
    # parents' backups; those parents' cached argmax refreshes at their
    # own next backup (the documented DAG staleness both schemes share in
    # different orders), so exact step-for-step equivalence is asserted
    # on trees only
    sp = SearchParams(root_noise_enabled=False,
                      subtree_value_bias_factor=0.3,
                      use_graph_search=False).to_arr()

    def run(mirror):
        return mcts.run_search(_stub_apply, None, roots, sp,
                               jax.random.PRNGKey(5), size=SIZE,
                               num_sims=40, max_nodes=48,
                               with_ladders=False, mirror=mirror)

    res_fast = run(None)
    # mirroring=False on an odd board still exercises the classic
    # descent-time PUCT path (the adjustment itself is a no-op)
    res_classic = run(MirrorArrs.none(g))

    np.testing.assert_array_equal(np.asarray(res_fast.child_visits),
                                  np.asarray(res_classic.child_visits))
    np.testing.assert_array_equal(
        np.asarray(res_fast.ss.tree.parent_action),
        np.asarray(res_classic.ss.tree.parent_action))
    np.testing.assert_allclose(np.asarray(res_fast.root_utility),
                               np.asarray(res_classic.root_utility),
                               rtol=1e-6)
