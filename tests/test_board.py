"""Board engine tests: hand cases + randomized cross-check vs pure-python oracle.

Models the reference's tier-1 deterministic board tests (runtests board
basics/captures/ko; /root/reference/cpp/tests/testboardbasic.cpp) without
copying them: small hand-written capture/ko/suicide diagrams plus randomized
game fuzzing against tests/oracle.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from tests.oracle import OracleBoard


def make_state(diagram: str) -> tuple[B.BoardState, int]:
    stones, size = B.board_from_string(diagram)
    st = B.empty_board(size)._replace(stones=jnp.asarray(stones))
    return st, size


def test_single_capture():
    st, size = make_state("""
        .X...
        XOX..
        .....
        .....
        .....
    """)
    # black at (1,2) captures the O stone
    new, info = B.play_move(st, jnp.int32(B.loc_of_xy(1, 2, size)), jnp.int32(B.BLACK), size)
    assert int(info.num_captured) == 1
    assert int(new.stones[B.loc_of_xy(1, 1, size)]) == B.EMPTY
    assert int(new.stones[B.loc_of_xy(1, 2, size)]) == B.BLACK
    # not a ko: black stone has 3 liberties
    assert int(new.ko_loc) == -1


def test_multi_stone_capture_and_chain_libs():
    st, size = make_state("""
        OO...
        XX...
        .....
        .....
        .....
    """)
    labels = B.connected_labels(st.stones, size)
    libs = B.chain_liberties(st.stones, labels, size)
    # white pair has 3 libs? top-left OO: neighbors are (2,0) and the two X below
    assert int(libs[0]) == 1  # only (2,0) open
    assert int(libs[B.loc_of_xy(0, 1, size)]) == 3  # XX: (2,1),(0,2),(1,2)
    new, info = B.play_move(st, jnp.int32(B.loc_of_xy(2, 0, size)), jnp.int32(B.BLACK), size)
    assert int(info.num_captured) == 2
    assert int(new.stones[0]) == B.EMPTY and int(new.stones[1]) == B.EMPTY


def test_simple_ko_ban_set_and_respected():
    st, size = make_state("""
        .XO..
        X.XO.
        .XO..
        .....
        .....
    """)
    # white takes at (1,1): captures nothing? No: white at (1,1) would be
    # self-atari capture? Build the classic ko: white plays (1,1) capturing X? no.
    # Instead: white stone at (1,1) missing; black plays would-be ko shape.
    # Set up directly: O plays at (1,1)? (1,1) is empty surrounded by X left,
    # X up, X down, O right -> white at (1,1) has 0 libs unless captures.
    # Make the X at (2,1) capturable: it is X at (2,1) with neighbors
    # (1,1) empty, (2,0)=O, (3,1)=O, (2,2)=O -> in atari at (1,1).
    new, info = B.play_move(st, jnp.int32(B.loc_of_xy(1, 1, size)), jnp.int32(B.WHITE), size)
    assert int(info.num_captured) == 1
    assert int(new.ko_loc) == B.loc_of_xy(2, 1, size)
    legal = B.legal_moves_basic(new, jnp.int32(B.BLACK), jnp.bool_(True), size)
    assert not bool(legal[B.loc_of_xy(2, 1, size)])  # ko retake banned
    # after a pass elsewhere, ko ban clears
    n2, _ = B.play_move(new, jnp.int32(B.pass_loc(size)), jnp.int32(B.BLACK), size)
    assert int(n2.ko_loc) == -1


def test_suicide_rules():
    st, size = make_state("""
        .O...
        O.O..
        .O...
        .....
        .....
    """)
    p = B.loc_of_xy(1, 1, size)
    # single-stone suicide always illegal
    legal_ms = B.legal_moves_basic(st, jnp.int32(B.BLACK), jnp.bool_(True), size)
    legal_nms = B.legal_moves_basic(st, jnp.int32(B.BLACK), jnp.bool_(False), size)
    assert not bool(legal_ms[p]) and not bool(legal_nms[p])

    st2, size = make_state("""
        .OX..
        OX.O.
        .OXO.
        ..O..
        .....
    """)
    # black at (2,1) joins the X group; resulting group has a liberty? Build a
    # true multi-stone suicide: X at (2,0),(1,1),(2,2) plus played (2,1) would
    # have liberties... verify against oracle instead below. Here just check
    # pass is never suicide and empty corners are legal.
    legal = B.legal_moves_basic(st2, jnp.int32(B.BLACK), jnp.bool_(False), size)
    assert bool(legal[B.loc_of_xy(4, 4, size)])


def test_area_score():
    st, size = make_state("""
        .X.O.
        XX.OO
        .X.O.
        XX.OO
        .X.O.
    """)
    own, score = B.area_score_tromp_taylor(st.stones, size)
    # col0+col1 black-ish: black stones 7 + territory 3 = 10
    # col3+col4 white: 7 stones + 3 territory = 10; col2 dame (borders both)
    assert float(score) == 0.0
    onp = np.asarray(own).reshape(size, size)
    assert (onp[:, 2] == 0).all()


def test_pass_is_noop():
    st, size = make_state("""
        .X...
        .....
        .....
        .....
        .....
    """)
    new, info = B.play_move(st, jnp.int32(B.pass_loc(size)), jnp.int32(B.WHITE), size)
    assert bool(info.is_pass)
    np.testing.assert_array_equal(np.asarray(new.stones), np.asarray(st.stones))
    np.testing.assert_array_equal(np.asarray(new.pos_hash), np.asarray(st.pos_hash))


def test_hash_consistency_transposition():
    # same final position via different move orders -> same hash
    size = 5
    st1 = B.empty_board(size)
    st1, _ = B.play_move(st1, jnp.int32(0), jnp.int32(B.BLACK), size)
    st1, _ = B.play_move(st1, jnp.int32(7), jnp.int32(B.WHITE), size)
    st1, _ = B.play_move(st1, jnp.int32(3), jnp.int32(B.BLACK), size)

    st2 = B.empty_board(size)
    st2, _ = B.play_move(st2, jnp.int32(3), jnp.int32(B.BLACK), size)
    st2, _ = B.play_move(st2, jnp.int32(7), jnp.int32(B.WHITE), size)
    st2, _ = B.play_move(st2, jnp.int32(0), jnp.int32(B.BLACK), size)
    np.testing.assert_array_equal(np.asarray(st1.pos_hash), np.asarray(st2.pos_hash))
    assert np.asarray(st1.pos_hash).any()


@pytest.mark.parametrize("size,multi_suicide", [(5, True), (7, False), (9, True)])
def test_random_game_fuzz_vs_oracle(size, multi_suicide):
    """Play random legal moves; every step the JAX engine must agree with the
    oracle on stones, legality mask, ko, and capture counts."""
    rng = np.random.default_rng(1234 + size)
    nn = size * size

    play = jax.jit(B.play_move, static_argnums=3)
    legal_fn = jax.jit(B.legal_moves_basic, static_argnums=3)

    for game in range(3):
        oracle = OracleBoard(size, multi_suicide)
        st = B.empty_board(size)
        player = B.BLACK
        for mv in range(140):
            legal = np.asarray(legal_fn(st, jnp.int32(player),
                                        jnp.bool_(multi_suicide), size))
            oracle_legal = np.array([oracle.is_legal(p, player) for p in range(nn)])
            np.testing.assert_array_equal(
                legal, oracle_legal,
                err_msg=f"size={size} game={game} move={mv} player={player}\n"
                        f"{B.board_to_string(np.asarray(st.stones), size)}")
            choices = np.flatnonzero(legal)
            if len(choices) == 0 or rng.random() < 0.02:
                loc = nn  # pass
            else:
                loc = int(rng.choice(choices))
            ncap = oracle.play(loc, player)
            st, info = play(st, jnp.int32(loc), jnp.int32(player), size)
            assert int(info.num_captured) == ncap
            np.testing.assert_array_equal(
                np.asarray(st.stones), np.array(oracle.stones, np.int32),
                err_msg=f"stones mismatch at size={size} game={game} move={mv}")
            assert int(st.ko_loc) == oracle.ko_loc
            player = 3 - player
        # scoring agreement at the end
        own, score = B.area_score_tromp_taylor(st.stones, size)
        o_own, o_score = oracle.area_score()
        np.testing.assert_array_equal(np.asarray(own), np.array(o_own, np.int32))
        assert float(score) == o_score


def test_batched_vmap_consistency():
    """vmap over a batch of games == per-game results."""
    size = 7
    nn = size * size
    rng = np.random.default_rng(7)
    G = 16
    states = jax.vmap(lambda _: B.empty_board(size))(jnp.arange(G))
    v_play = jax.jit(jax.vmap(B.play_move, in_axes=(0, 0, 0, None)), static_argnums=3)
    v_legal = jax.jit(jax.vmap(B.legal_moves_basic, in_axes=(0, 0, 0, None)), static_argnums=3)

    play1 = jax.jit(B.play_move, static_argnums=3)
    single_states = [B.empty_board(size) for _ in range(G)]
    player = B.BLACK
    for mv in range(30):
        legal = np.asarray(v_legal(states, jnp.full((G,), player, jnp.int32),
                                   jnp.ones((G,), bool), size))
        locs = []
        for g in range(G):
            ch = np.flatnonzero(legal[g])
            locs.append(int(rng.choice(ch)) if len(ch) else nn)
        locs = jnp.asarray(locs, jnp.int32)
        states, _ = v_play(states, locs, jnp.full((G,), player, jnp.int32), size)
        for g in range(G):
            single_states[g], _ = play1(
                single_states[g], locs[g], jnp.int32(player), size)
        player = 3 - player
    for g in range(G):
        np.testing.assert_array_equal(
            np.asarray(states.stones[g]), np.asarray(single_states[g].stones))
        np.testing.assert_array_equal(
            np.asarray(states.pos_hash[g]), np.asarray(single_states[g].pos_hash))
