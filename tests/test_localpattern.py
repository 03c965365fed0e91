"""Tests for search/localpattern.py against a pure-python oracle mirroring
LocalPatternHasher::getHash/getHashWithSym (cpp/search/localpattern.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.search import localpattern as LP


def oracle_hash(stones, loc, pla, size, win, atari=None, symmetry=0,
                flip_colors=False):
    t = LP._tables(win)
    nn = size * size
    pla_eff = (3 - pla) if flip_colors else pla
    h = t["pla"][pla_eff - 1].copy()
    if not (0 <= loc < nn):
        return h
    perm = LP._sym_cell_perm(win)[symmetry]
    r = win // 2
    y, x = loc // size, loc % size
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            ty, tx = y + dy, x + dx
            if not (0 <= ty < size and 0 <= tx < size):
                continue
            cell = (dy + r) * win + (dx + r)
            cell = perm[cell]
            s = int(stones[ty * size + tx])
            if flip_colors and s > 0:
                s = 3 - s
            h = h ^ t["pattern"][s, cell]
            if atari is not None and s > 0 and atari[ty * size + tx]:
                h = h ^ t["atari"][cell]
    return h


def rand_board(size, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 3, size=size * size).astype(np.int32)


@pytest.mark.parametrize("win", [5, 9])
def test_hash_matches_oracle(win):
    size = 9
    fn = jax.jit(lambda s, l, p: LP.local_pattern_hash(s, l, p, size, win))
    rng = np.random.default_rng(win)
    for trial in range(6):
        stones = rand_board(size, trial)
        loc = int(rng.integers(0, size * size))
        pla = int(rng.integers(1, 3))
        got = np.asarray(fn(jnp.asarray(stones), jnp.int32(loc),
                            jnp.int32(pla)))
        want = oracle_hash(stones, loc, pla, size, win)
        assert (got == want).all(), (trial, loc, pla)


def test_pass_hashes_to_pla_key_only():
    size = 5
    stones = rand_board(size, 0)
    fn = jax.jit(lambda s, l, p: LP.local_pattern_hash(s, l, p, size, 5))
    got = np.asarray(fn(jnp.asarray(stones), jnp.int32(size * size),
                        jnp.int32(1)))
    assert (got == LP._tables(5)["pla"][0]).all()


def test_atari_changes_hash():
    size = 5
    stones = rand_board(size, 3)
    atari0 = np.zeros(size * size, bool)
    atari1 = atari0.copy()
    # mark a stone inside the window as in atari
    stones[12] = 1
    atari1[12] = True
    fn = jax.jit(lambda s, l, p, a: LP.local_pattern_hash(
        s, l, p, size, 5, atari=a))
    h0 = np.asarray(fn(jnp.asarray(stones), jnp.int32(12), jnp.int32(1),
                       jnp.asarray(atari0)))
    h1 = np.asarray(fn(jnp.asarray(stones), jnp.int32(12), jnp.int32(1),
                       jnp.asarray(atari1)))
    assert (h0 != h1).any()
    want = oracle_hash(stones, 12, 1, size, 5, atari=atari1)
    assert (h1 == want).all()


def test_symmetry_images_match_oracle_and_identity():
    size = 7
    win = 5
    stones = rand_board(size, 7)
    loc, pla = 24, 2
    fn = jax.jit(lambda s, l, p, sym, fc: LP.local_pattern_hash(
        s, l, p, size, win, symmetry=sym, flip_colors=fc))
    for sym in range(8):
        for fc in (False, True):
            got = np.asarray(fn(jnp.asarray(stones), jnp.int32(loc),
                                jnp.int32(pla), jnp.int32(sym),
                                jnp.bool_(fc)))
            want = oracle_hash(stones, loc, pla, size, win,
                               symmetry=sym, flip_colors=fc)
            assert (got == want).all(), (sym, fc)
    # identity symmetry must agree with the plain form
    plain = jax.jit(lambda s, l, p: LP.local_pattern_hash(
        s, l, p, size, win))(jnp.asarray(stones), jnp.int32(loc),
                             jnp.int32(pla))
    ident = fn(jnp.asarray(stones), jnp.int32(loc), jnp.int32(pla),
               jnp.int32(0), jnp.bool_(False))
    assert (np.asarray(plain) == np.asarray(ident)).all()


def test_symmetric_board_positions_collide_under_sym():
    """Hashing (board, loc) with symmetry s equals hashing the transformed
    (board, loc) plainly — the whole point of getHashWithSym."""
    size = 7
    win = 5
    nn = size * size
    stones = rand_board(size, 11)
    grid = stones.reshape(size, size)
    loc = 16
    y, x = loc // size, loc % size
    for sym in range(8):
        g = grid.copy()
        sy, sx = y, x
        if sym & 2:
            g = g[:, ::-1]
            sx = size - 1 - sx
        if sym & 4:
            g = g[::-1, :]
            sy = size - 1 - sy
        if sym & 1:
            g = g.T
            sy, sx = sx, sy
        tloc = sy * size + sx
        h_sym = oracle_hash(stones, loc, 1, size, win, symmetry=sym)
        h_plain = oracle_hash(g.reshape(-1), tloc, 1, size, win)
        assert (h_sym == h_plain).all(), sym
