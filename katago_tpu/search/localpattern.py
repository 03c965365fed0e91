"""Batched local-pattern Zobrist hashing — reference
cpp/search/localpattern.{h,cpp} LocalPatternHasher.

The reference hashes the WxW window of board colors centered on a move
(off-board cells contribute nothing), the mover, and the atari status of
each stone in the window, into a Hash128. Two consumers:

  - subtree value bias (subtreevaluebiastable.cpp:19): 5x5 window, XOR'd
    with move-loc and ko-ban keys;
  - pattern bonus / avoid-repeated-shapes (patternbonustable.cpp:25): 9x9
    window, plus the 16 symmetry images (8 dihedral x color flip) via
    getHashWithSym.

TPU shape: tables are fixed-seed numpy constants baked into the jitted
program; one hash is a static gather of the W^2 window (edge-masked) and a
lane-wise XOR reduction — no control flow, so it vectorizes over
[games x moves] and is safe inside the search scan. Hashes are uint32[2]
lanes (64-bit), matching game/zobrist.py's convention.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_SEED = 0x70617474  # fixed constant ("patt")

# board color states: 0 empty, 1 black, 2 white (game/board.py)
_NUM_STATES = 3


@functools.lru_cache(maxsize=None)
def _tables(win: int):
    """Zobrist tables for a win x win window (win odd).

    Returns dict of uint32 arrays:
      pattern [NUM_STATES, win*win, 2], pla [2, 2], atari [win*win, 2].
    """
    assert win % 2 == 1 and win > 0
    rng = np.random.Generator(np.random.PCG64(_SEED + win))

    def draw(*shape):
        return rng.integers(0, 2**32, size=shape + (2,), dtype=np.uint32)

    return {
        "pattern": draw(_NUM_STATES, win * win),
        "pla": draw(2),
        "atari": draw(win * win),
    }


@functools.lru_cache(maxsize=None)
def _window_offsets(win: int):
    """(dy, dx) int32 arrays of the window cells, row-major like the
    reference's dy/dx loops (localpattern.cpp:72-74)."""
    r = win // 2
    dy, dx = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                         indexing="ij")
    return dy.reshape(-1).astype(np.int32), dx.reshape(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _sym_cell_perm(win: int) -> np.ndarray:
    """[8, win*win] int32: cell index each window cell maps to under
    dihedral symmetry s (bit0 transpose, bit1 flipX, bit2 flipY — the
    reference's SymmetryHelpers convention, getHashWithSym's symXY2)."""
    cells = np.arange(win * win)
    y, x = cells // win, cells % win
    out = np.zeros((8, win * win), np.int32)
    for s in range(8):
        sx = (win - x - 1) if (s & 2) else x
        sy = (win - y - 1) if (s & 4) else y
        if s & 1:
            out[s] = sx * win + sy
        else:
            out[s] = sy * win + sx
    return out


def _fold(vals):
    # log-depth XOR tree over the leading axis (static K)
    k = vals.shape[0]
    while k > 1:
        half = (k + 1) // 2
        top = vals[half:k]
        pad = jnp.zeros((2 * half - k, 2), jnp.uint32)
        vals = jnp.bitwise_xor(vals[:half],
                               jnp.concatenate([top, pad], axis=0))
        k = half
    return vals[0]


def host_pattern_hash(stones: np.ndarray, loc: int, pla: int, size: int,
                      win: int, atari: np.ndarray | None = None,
                      symmetry: int = 0,
                      flip_colors: bool = False) -> np.ndarray:
    """Pure-numpy getHash/getHashWithSym for host-side bookkeeping (building
    pattern-bonus tables between searches); bit-identical to
    local_pattern_hash. Returns uint32[2]."""
    t = _tables(win)
    nn = size * size
    pla_eff = (3 - pla) if flip_colors else pla
    h = t["pla"][pla_eff - 1].copy()
    if not (0 <= loc < nn):
        return h
    perm = _sym_cell_perm(win)[symmetry]
    r = win // 2
    y, x = loc // size, loc % size
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            ty, tx = y + dy, x + dx
            if not (0 <= ty < size and 0 <= tx < size):
                continue
            cell = perm[(dy + r) * win + (dx + r)]
            s = int(stones[ty * size + tx])
            if flip_colors and s > 0:
                s = 3 - s
            h = h ^ t["pattern"][s, cell]
            if atari is not None and s > 0 and atari[ty * size + tx]:
                h = h ^ t["atari"][cell]
    return h


def local_pattern_hash(stones, loc, pla, size: int, win: int,
                       atari=None, symmetry=None, flip_colors=None):
    """Hash of the win x win window at `loc` played by `pla`
    (LocalPatternHasher::getHash / getHashWithSym).

    stones: int[NN] board colors BEFORE the move. loc: flat move location
    (pass/invalid: >= NN or < 0 hashes to the pla key alone). pla: mover
    (1 black / 2 white). atari: optional bool[NN] — stone is part of a
    1-liberty chain (None skips the atari keys; the reference always pays
    them, but computing liberties is a fixpoint the in-search bias key
    avoids). symmetry/flip_colors: optional traced values selecting one of
    the 16 images (getHashWithSym); None means identity.

    Returns uint32[2].
    """
    nn = size * size
    t = _tables(win)
    dy, dx = _window_offsets(win)
    k = dy.shape[0]

    if flip_colors is not None:
        pla_eff = jnp.where(flip_colors, 3 - pla, pla)
    else:
        pla_eff = pla
    h = jnp.asarray(t["pla"])[jnp.clip(pla_eff - 1, 0, 1)]

    y, x = loc // size, loc % size
    ty, tx = y + dy, x + dx
    valid = (ty >= 0) & (ty < size) & (tx >= 0) & (tx < size)
    loc2 = jnp.clip(ty * size + tx, 0, nn - 1)
    state = stones[loc2].astype(jnp.int32)                     # [K]
    if flip_colors is not None:
        state = jnp.where(flip_colors & (state > 0), 3 - state, state)

    cell = jnp.arange(k, dtype=jnp.int32)
    if symmetry is not None:
        cell = jnp.asarray(_sym_cell_perm(win))[symmetry]      # [K]

    pat = jnp.asarray(t["pattern"])[state, cell]               # [K, 2]
    vals = jnp.where(valid[:, None], pat, jnp.uint32(0))
    if atari is not None:
        at = jnp.asarray(t["atari"])[cell]                     # [K, 2]
        at_on = valid & (state > 0) & atari[loc2]
        vals = jnp.bitwise_xor(vals, jnp.where(at_on[:, None], at,
                                               jnp.uint32(0)))
    body = _fold(vals)
    play_on_board = (loc >= 0) & (loc < nn)
    return jnp.bitwise_xor(h, jnp.where(play_on_board, body,
                                        jnp.uint32(0)))
