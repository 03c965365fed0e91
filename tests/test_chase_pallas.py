"""Pallas chase kernel vs the vmapped-XLA chase solver.

`ladder_map_chase_batch` (game/ladder.py) must reproduce
`jax.vmap(ladder_map_chase)` bit-for-bit: the Pallas kernel
(ops/chase_pallas.py) is a layout/scheduling rewrite of the identical
greedy chase algorithm, not an approximation. Off-TPU the kernel runs in
the Pallas interpreter, so this exercises the same program the TPU
executes.

Reference: Board::searchIsLadderCaptured (cpp/game/board.cpp:1628) is the
semantics both implementations approximate with the greedy chase policy;
their agreement with the reference's is covered by test_ladder_chase.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from katago_tpu.game import ladder as LAD


def _random_boards(size, g, seed, density_lo=0.15, density_hi=0.6):
    nn = size * size
    rng = np.random.default_rng(seed)
    boards = []
    for _ in range(g):
        density = rng.uniform(density_lo, density_hi)
        st = rng.choice(
            [0, 1, 2], size=(nn,),
            p=[1 - density, density / 2, density / 2])
        boards.append(st)
    stones = jnp.asarray(np.stack(boards), jnp.int32)

    def clean(st):
        # remove libertyless chains so boards are reachable states
        lab = LAD._stone_labels(st, size)
        libs = B.chain_liberties(st, lab, size)
        occ = (st == B.BLACK) | (st == B.WHITE)
        return jnp.where(occ & (libs == 0), 0, st)

    return jax.vmap(clean)(stones)


@pytest.mark.parametrize("size,g,seed", [(9, 12, 0), (19, 6, 1),
                                         (13, 8, 2)])
def test_batch_equals_vmapped_chase(size, g, seed):
    stones = _random_boards(size, g, seed)
    ko = jnp.full((g,), -1, jnp.int32)
    ref = jax.vmap(
        lambda s, k: LAD.ladder_map_chase(s, size, ko_loc=k))(stones, ko)
    got = LAD.ladder_map_chase_batch(stones, size, ko_loc=ko,
                                 force_pallas=True)
    for name in ("laddered", "working_vs_black", "working_vs_white"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        assert (a == b).all(), (
            f"{name} mismatch at {np.argwhere(a != b)[:5]}")


def test_batch_with_ko_and_atari_board():
    size = 9
    # an atari position (the lanes get a defender-first query) + a random
    # board with a ko point set, exercising the ko-ban lane masking
    b = np.zeros((size, size), np.int64)
    b[1, 1] = 2
    b[0, 1] = 1
    b[1, 0] = 1
    b[1, 2] = 1          # atari: lone liberty at (2,1)
    st0 = jnp.asarray(b.reshape(-1), jnp.int32)
    stones = jnp.stack([st0, _random_boards(size, 1, 5)[0]])
    ko = jnp.asarray([-1, 4], jnp.int32)
    ref = jax.vmap(
        lambda s, k: LAD.ladder_map_chase(s, size, ko_loc=k))(stones, ko)
    got = LAD.ladder_map_chase_batch(stones, size, ko_loc=ko,
                                 force_pallas=True)
    for name in ("laddered", "working_vs_black", "working_vs_white"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, name)),
                                      np.asarray(getattr(got, name)))
