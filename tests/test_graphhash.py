"""Graph-hash transposition keys (cpp/game/graphhash.{h,cpp})."""

import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import graphhash as GH


def test_repetition_bound_regions():
    size = 5
    nn = size * size
    stones = np.zeros(nn, np.int32)
    stones[12] = B.BLACK
    # open board: chain 1 + 24 connected empties = 25 > 11
    assert bool(GH.simple_repetition_bound_gt(
        jnp.asarray(stones), size, jnp.int32(12), 11))
    # cramped corner: stone walled in, zero adjacent empty region
    s2 = np.zeros(nn, np.int32)
    s2[0] = B.BLACK
    s2[1] = B.WHITE
    s2[5] = B.WHITE
    assert not bool(GH.simple_repetition_bound_gt(
        jnp.asarray(s2), size, jnp.int32(0), 11))
    # pass / off-board never bounds
    assert not bool(GH.simple_repetition_bound_gt(
        jnp.asarray(stones), size, jnp.int32(nn), 11))
    assert not bool(GH.simple_repetition_bound_gt(
        jnp.asarray(stones), size, jnp.int32(-1), 11))
    # empty-point (suicide-shaped) location counts its empty region
    assert bool(GH.simple_repetition_bound_gt(
        jnp.asarray(np.zeros(nn, np.int32)), size, jnp.int32(7), 11))


def test_graph_hash_merge_semantics():
    """Resetting moves merge transpositions across paths; chained moves
    keep path dependence (graphhash.cpp:24-39)."""
    sh = jnp.asarray(np.array([0xAAAA1111, 0x2222BBBB], np.uint32))
    ga = jnp.asarray(np.array([1, 2], np.uint32))
    gb = jnp.asarray(np.array([3, 4], np.uint32))
    t = jnp.bool_(True)
    f = jnp.bool_(False)
    # reset: same state -> same key regardless of the path hash
    assert (GH.graph_hash_step(ga, sh, t) ==
            GH.graph_hash_step(gb, sh, t)).all()
    # chained: different paths -> different keys for the same state
    assert (GH.graph_hash_step(ga, sh, f) !=
            GH.graph_hash_step(gb, sh, f)).any()
    # state distinctions always flow through
    sh2 = sh ^ jnp.uint32(1)
    assert (GH.graph_hash_step(ga, sh, t) !=
            GH.graph_hash_step(ga, sh2, t)).any()


def test_state_hash_folds_pass_state():
    kh = jnp.asarray(np.array([7, 9], np.uint32))
    base = GH.state_hash(kh, jnp.bool_(False), jnp.int32(0))
    over = GH.state_hash(kh, jnp.bool_(True), jnp.int32(0))
    one_pass = GH.state_hash(kh, jnp.bool_(False), jnp.int32(1))
    assert (base != over).any()
    assert (base != one_pass).any()
    assert (over != one_pass).any()
