"""SearchDriver's unpolled visit-budget fast path: the a-priori chunk
count must land exactly on the visit cap (fresh and reused trees), and
time/callback-driven searches still take the polling path."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search.driver import SearchDriver
from katago_tpu.search.params import SearchParams

SIZE = 5
NN = SIZE * SIZE


def _stub_apply(params, sp_feat, gl_feat, metadata=None):
    b = sp_feat.shape[0]
    eps = jnp.mean(sp_feat, axis=(1, 2, 3))[:, None] * 1e-6
    return {
        "policy_logits": jnp.zeros((b, 2, NN + 1), jnp.float32)
            + eps[:, :, None],
        "value_logits": jnp.zeros((b, 3), jnp.float32) + eps,
        "miscvalue": jnp.zeros((b, 10), jnp.float32) + eps,
        "moremiscvalue": jnp.zeros((b, 8), jnp.float32),
        "ownership_pretanh": jnp.zeros((b, SIZE, SIZE, 1), jnp.float32),
    }


def _roots(g=2):
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=48)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (g,) + x.shape), gs)


def test_fast_path_hits_exact_visit_cap():
    sp = SearchParams(root_noise_enabled=False).to_arr()
    driver = SearchDriver(_stub_apply, None, sp, size=SIZE, max_nodes=40,
                          chunk_size=7, with_ladders=False)
    # 7 does not divide 19: the fast path over-runs into cap-masked sims
    # and the trailing poll tops up nothing further
    res = driver.search(_roots(), jax.random.PRNGKey(0), max_visits=20)
    np.testing.assert_array_equal(np.asarray(res.root_visits), 20)


def test_fast_path_with_reused_tree():
    sp = SearchParams(root_noise_enabled=False).to_arr()
    driver = SearchDriver(_stub_apply, None, sp, size=SIZE, max_nodes=40,
                          chunk_size=5, with_ladders=False)
    roots = _roots()
    res1 = driver.search(roots, jax.random.PRNGKey(0), max_visits=12)
    # reuse without re-rooting (same position): only the missing visits run
    res2 = driver.search(roots, jax.random.PRNGKey(1), max_visits=18,
                         prev_tree=res1.ss.tree)
    np.testing.assert_array_equal(np.asarray(res2.root_visits), 18)
    # and the reused pool kept the old playouts (node count grew, not reset)
    assert int(res2.ss.tree.num_nodes[0]) >= int(res1.ss.tree.num_nodes[0])


def test_callback_still_polls():
    sp = SearchParams(root_noise_enabled=False).to_arr()
    driver = SearchDriver(_stub_apply, None, sp, size=SIZE, max_nodes=40,
                          chunk_size=4, with_ladders=False)
    calls = []
    res = driver.search(_roots(), jax.random.PRNGKey(0), max_visits=13,
                        callback=lambda r, t: calls.append(t),
                        callback_interval=0.0)
    np.testing.assert_array_equal(np.asarray(res.root_visits), 13)
    assert len(calls) >= 1
