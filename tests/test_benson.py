"""Pass-alive (Benson) tests: hand positions + randomized cross-check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import benson
from katago_tpu.game import board as B
from tests import oracle_benson
from tests.oracle import OracleBoard


def run_both(diagram_or_stones, size=None, suicide=True,
             non_pass_alive=False, safe_big=True, unsafe_big=False):
    if isinstance(diagram_or_stones, str):
        stones, size = B.board_from_string(diagram_or_stones)
    else:
        stones = np.asarray(diagram_or_stones, np.int32)
    got = np.asarray(benson.calculate_area(
        jnp.asarray(stones), size,
        jnp.bool_(non_pass_alive), jnp.bool_(safe_big),
        jnp.bool_(unsafe_big), jnp.bool_(suicide)))
    want = np.array(oracle_benson.calculate_area(
        list(stones), size, non_pass_alive, safe_big, unsafe_big, suicide),
        np.int32)
    return got, want, stones, size


def test_two_eye_group_is_pass_alive():
    got, want, stones, size = run_both("""
        .X.X.
        XXXX.
        .....
        .....
        .....
    """)
    np.testing.assert_array_equal(got, want)
    # the group with two real eyes is pass-alive, eyes are its territory
    assert got[0] == B.BLACK and got[2] == B.BLACK  # eyes
    assert got[B.loc_of_xy(0, 1, size)] == B.BLACK  # stones


def test_one_eye_group_not_pass_alive():
    got, want, stones, size = run_both("""
        .X...
        XX...
        .....
        .....
        .....
    """)
    np.testing.assert_array_equal(got, want)
    assert got[B.loc_of_xy(1, 0, size)] == B.EMPTY  # single-eye group: not pass-alive


def test_pass_dead_opponent_inside():
    # white stones inside black's pass-alive territory are pass-dead
    got, want, stones, size = run_both("""
        .XO.X
        XXXXX
        .....
        XXXXX
        .X.X.
    """)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("suicide", [True, False])
@pytest.mark.parametrize("flags", [(False, True, False), (True, True, True)])
def test_random_positions_vs_oracle(suicide, flags):
    non_pa, safe_big, unsafe_big = flags
    size = 7
    rng = np.random.default_rng(31337)
    area_fn = jax.jit(benson.calculate_area, static_argnums=1)
    for trial in range(6):
        # generate a legal position by random play
        oracle = OracleBoard(size, True)
        player = B.BLACK
        nn = size * size
        for _ in range(rng.integers(20, 70)):
            legal = [p for p in range(nn) if oracle.is_legal(p, player)]
            if not legal:
                break
            oracle.play(int(rng.choice(legal)), player)
            player = 3 - player
        stones = np.array(oracle.stones, np.int32)
        got = np.asarray(area_fn(jnp.asarray(stones), size,
                                 jnp.bool_(non_pa), jnp.bool_(safe_big),
                                 jnp.bool_(unsafe_big), jnp.bool_(suicide)))
        want = np.array(oracle_benson.calculate_area(
            list(stones), size, non_pa, safe_big, unsafe_big, suicide), np.int32)
        np.testing.assert_array_equal(
            got, want,
            err_msg=f"trial={trial} suicide={suicide} flags={flags}\n"
                    f"{B.board_to_string(stones, size)}")


def test_full_board_life_shapes():
    # classic corner pass-alive shape: 2x2-ish eyespace split by a stone
    got, want, stones, size = run_both("""
        X.X.X
        .XXX.
        XX.XX
        OOOOO
        O.O.O
    """)
    np.testing.assert_array_equal(got, want)
