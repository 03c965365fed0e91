"""Tests for anti-mirror countering (search/mirror.py + its mcts wiring;
reference cpp/search/searchmirror.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search import mcts
from katago_tpu.search import mirror as MIR
from katago_tpu.search.params import SearchParams

SIZE = 9
NN = SIZE * SIZE


def mirror_loc(loc):
    y, x = loc // SIZE, loc % SIZE
    return (SIZE - 1 - y) * SIZE + (SIZE - 1 - x)


def mirrored_history(n_pairs):
    """Black plays arbitrary moves, white mirrors every one."""
    moves, plas = [], []
    cand = [0, 1, 2, 9, 10, 11, 18, 19, 20, 3, 12, 21, 27, 28, 29,
            4, 13, 22, 31, 36, 37]
    for i in range(n_pairs):
        b = cand[i % len(cand)]
        moves += [b, mirror_loc(b)]
        plas += [B.BLACK, B.WHITE]
    return moves, plas


def test_detect_mirroring_true():
    moves, plas = mirrored_history(15)
    stones = np.zeros(NN, np.int32)
    for m, p in zip(moves, plas):
        stones[m] = p
    mirroring, adv, err = MIR.detect_game(
        moves, plas, root_pla=B.BLACK, stones=stones, komi=7.0,
        scoring_area=True, size=SIZE)
    assert mirroring
    # white mirroring with komi 7, black gets last move on odd board:
    # advantage = komi - 1
    assert adv == 6.0


def test_detect_mirroring_false_for_normal_game():
    moves = [40, 30, 41, 31, 42, 32, 50, 20, 51, 21, 52, 22, 60, 10]
    plas = [B.BLACK, B.WHITE] * 7
    stones = np.zeros(NN, np.int32)
    for m, p in zip(moves, plas):
        stones[m] = p
    mirroring, _, _ = MIR.detect_game(
        moves, plas, root_pla=B.BLACK, stones=stones, komi=7.0,
        scoring_area=True, size=SIZE)
    assert not mirroring


def test_detect_needs_enough_mirror_moves():
    moves, plas = mirrored_history(10)  # below the 7 + 0.5n threshold
    stones = np.zeros(NN, np.int32)
    mirroring, _, _ = MIR.detect_game(
        moves, plas, root_pla=B.BLACK, stones=stones, komi=7.0,
        scoring_area=True, size=SIZE)
    assert not mirroring


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


def _mirror_position():
    """A game where white has mirrored black for 15 pairs; black to move."""
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    128)
    moves, plas = mirrored_history(15)
    for mv in moves:
        gs, _ = H.step(gs, jnp.int32(mv), SIZE)
    return gs, moves, plas


def test_search_with_mirror_forces_center():
    gs, moves, plas = _mirror_position()
    stones = np.asarray(gs.pos.board.stones)
    mirroring, adv, err = MIR.detect_game(
        moves, plas, root_pla=B.BLACK, stones=stones, komi=7.0,
        scoring_area=True, size=SIZE)
    assert mirroring
    games = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape), gs)
    marr = MIR.MirrorArrs(
        mirroring=jnp.asarray([mirroring, mirroring]),
        mirror_pla=jnp.full((2,), B.WHITE, jnp.int32),
        advantage=jnp.full((2,), adv, jnp.float32),
        center_err=jnp.full((2,), err, jnp.float32))
    sp = SearchParams().to_arr()
    visits = 48

    def run(mirror):
        return jax.jit(lambda r, k: mcts.run_search(
            _stub(), None, r, sp, k, size=SIZE, num_sims=visits,
            max_nodes=visits + 3, with_ladders=False, mirror=mirror))(
                games, jax.random.PRNGKey(1))

    res_off = run(None)
    res_on = run(marr)
    assert (np.asarray(res_on.root_visits) == visits + 1).all()
    center = (SIZE // 2) * SIZE + SIZE // 2
    cv_on = np.asarray(res_on.child_visits)[:, center]
    cv_off = np.asarray(res_off.child_visits)[:, center]
    # tengen force-explore must raise the center's visit share
    assert (cv_on > cv_off).all(), (cv_on, cv_off)


def test_mirror_arrs_none_matches_disabled():
    """MirrorArrs with mirroring=False must leave the search unchanged."""
    gs, _, _ = _mirror_position()
    games = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), gs)
    sp = SearchParams().to_arr()
    marr_off = MIR.MirrorArrs.none(1)

    def run(mirror):
        return jax.jit(lambda r, k: mcts.run_search(
            _stub(), None, r, sp, k, size=SIZE, num_sims=24, max_nodes=27,
            with_ladders=False, mirror=mirror))(games, jax.random.PRNGKey(3))

    a = run(None)
    b = run(marr_off)
    np.testing.assert_array_equal(np.asarray(a.child_visits),
                                  np.asarray(b.child_visits))
