"""Tests for avoid-repeated-shapes (search/patternbonus.py; reference
cpp/search/patternbonustable.{h,cpp} + avoidRepeatedPatternUtility)."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search import localpattern as LP
from katago_tpu.search import mcts
from katago_tpu.search import patternbonus as PB
from katago_tpu.search.params import SearchParams

SIZE = 5
NN = SIZE * SIZE


def test_host_hash_matches_device():
    rng = np.random.default_rng(0)
    stones = rng.integers(0, 3, size=NN).astype(np.int32)
    fn = jax.jit(lambda s, l, p: LP.local_pattern_hash(
        s, l, p, SIZE, PB.PATTERN_WIN))
    for loc, pla in [(0, 1), (12, 2), (24, 1)]:
        got = np.asarray(fn(jnp.asarray(stones), jnp.int32(loc),
                            jnp.int32(pla)))
        want = LP.host_pattern_hash(stones, loc, pla, SIZE, PB.PATTERN_WIN)
        assert (got == want).all()


def test_table_lookup_roundtrip():
    rng = np.random.default_rng(1)
    stones = rng.integers(0, 3, size=NN).astype(np.int32)
    t = PB.PatternBonusTable()
    t.add_bonus(stones, 12, B.BLACK, SIZE, 0.25)
    arrs = t.to_arrays()
    look = jax.jit(lambda s, l, p: PB.lookup(arrs, s, l, p, SIZE))
    # the exact move hits
    got = float(look(jnp.asarray(stones), jnp.int32(12), jnp.int32(1)))
    assert abs(got - 0.25) < 1e-6
    # a different move misses
    assert float(look(jnp.asarray(stones), jnp.int32(7),
                      jnp.int32(1))) == 0.0
    # the transposed board+move hits too (16 symmetry images stored)
    grid = stones.reshape(SIZE, SIZE).T.reshape(-1)
    assert abs(float(look(jnp.asarray(grid), jnp.int32(12),
                          jnp.int32(1))) - 0.25) < 1e-6
    # and the color-flipped image
    flipped = np.where(stones > 0, 3 - stones, stones)
    assert abs(float(look(jnp.asarray(flipped), jnp.int32(12),
                          jnp.int32(2))) - 0.25) < 1e-6


def test_build_avoid_repeat_table_signs():
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    64)
    boards, moves, plas = [], [], []
    for mv, pla in [(6, B.BLACK), (18, B.WHITE), (7, B.BLACK)]:
        boards.append(np.asarray(gs.pos.board.stones))
        gs, _ = H.step(gs, jnp.int32(mv), SIZE)
        moves.append(mv)
        plas.append(pla)
    # black searching: its own shapes get POSITIVE white utility (bad for
    # black); white searching: negative
    tb = PB.build_avoid_repeat_table(boards, moves, plas, SIZE, B.BLACK, 0.2)
    tw = PB.build_avoid_repeat_table(boards, moves, plas, SIZE, B.WHITE, 0.2)
    assert float(jnp.max(tb.bonus)) > 0 and float(jnp.min(tb.bonus)) == 0
    assert float(jnp.min(tw.bonus)) < 0 and float(jnp.max(tw.bonus)) == 0
    assert PB.build_avoid_repeat_table(boards, moves, plas, SIZE,
                                       B.BLACK, 0.0) is None


def _stub():
    def apply(params, spatial, glob):
        g = spatial.shape[0]
        return {
            "policy_logits": jnp.zeros((g, 6, NN + 1)),
            "value_logits": jnp.zeros((g, 3)),
            "miscvalue": jnp.zeros((g, 10)),
            "moremiscvalue": jnp.zeros((g, 8)),
        }
    return apply


def test_search_avoids_penalized_shape():
    """Penalize one specific reply; the search should give it fewer visits
    than with no table."""
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    64)
    gs, _ = H.step(gs, jnp.int32(12), SIZE)  # black tengen; white to move
    games = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), gs)

    t = PB.PatternBonusTable()
    # white playing 6 on this exact board: +0.6 white utility means the
    # search FAVORS it; -0.6 means it avoids it
    stones = np.asarray(gs.pos.board.stones)
    t.add_bonus(stones, 6, B.WHITE, SIZE, 0.6)
    favor = t.to_arrays()
    t2 = PB.PatternBonusTable()
    t2.add_bonus(stones, 6, B.WHITE, SIZE, -0.6)
    avoid = t2.to_arrays()

    sp = SearchParams().to_arr()
    visits = 40

    def run(table):
        return jax.jit(lambda r, k: mcts.run_search(
            _stub(), None, r, sp, k, size=SIZE, num_sims=visits,
            max_nodes=visits + 3, with_ladders=False,
            pattern_bonus=table))(games, jax.random.PRNGKey(0))

    v_none = np.asarray(run(None).child_visits)[:, 6]
    v_favor = np.asarray(run(favor).child_visits)[:, 6]
    v_avoid = np.asarray(run(avoid).child_visits)[:, 6]
    assert (v_favor > v_none).all(), (v_favor, v_none)
    assert (v_avoid < v_favor).all(), (v_avoid, v_favor)
