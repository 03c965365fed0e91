"""Deterministic Zobrist hash tables for the vectorized Go engine.

The reference keeps 128-bit Hash128 Zobrist values per (location, color)
(see /root/reference/cpp/game/board.h:113-123). Here we use 64-bit hashes
represented as a pair of uint32 lanes, which is TPU-friendly (no uint64 on
device by default) and ample for in-game superko detection: collisions
within one game's <1000 positions are ~2^-44 likely.

Tables are generated once from a fixed seed with numpy's PCG64 so hashes are
reproducible across processes, platforms, and runs.
"""

import functools

import numpy as np

MAX_BOARD_LEN = 19

_SEED = 0x6B61746167  # arbitrary fixed constant ("katag")


@functools.lru_cache(maxsize=None)
def _master_tables():
    rng = np.random.Generator(np.random.PCG64(_SEED))

    def draw(*shape):
        return rng.integers(0, 2**32, size=shape + (2,), dtype=np.uint32)

    tables = {
        # [color(1=black,2=white) - 1, y, x, 2]
        "stone": draw(2, MAX_BOARD_LEN, MAX_BOARD_LEN),
        # player-to-move key, xor'd in for situational superko: [player-1, 2]
        "player": draw(2),
        # simple-ko ban location marker (used by ko_hash under SIMPLE/SPIGHT
        # style distinctions if ever needed): [y, x, 2]
        "ko_loc": draw(MAX_BOARD_LEN, MAX_BOARD_LEN),
        # encore phase marker for territory scoring phases 0/1/2: [3, 2]
        "encore": draw(3),
        # encore ko-recapture-block marks (ZOBRIST_KO_MARK_HASH equivalent,
        # reference boardhistory.cpp:782): [y, x, 2]
        "ko_mark": draw(MAX_BOARD_LEN, MAX_BOARD_LEN),
    }
    return tables


@functools.lru_cache(maxsize=None)
def stone_table(size: int) -> np.ndarray:
    """Zobrist stone keys for a size x size board, flattened.

    Returns uint32 array [2, size*size + 1, 2]: [color-1, flat_loc, lane].
    The final +1 row is an all-zero pad slot so that "pass" (loc == size*size)
    can be scattered/gathered harmlessly.
    """
    t = _master_tables()["stone"][:, :size, :size, :]  # [2, N, N, 2]
    t = t.reshape(2, size * size, 2)
    pad = np.zeros((2, 1, 2), dtype=np.uint32)
    return np.concatenate([t, pad], axis=1)


@functools.lru_cache(maxsize=None)
def ko_loc_table(size: int) -> np.ndarray:
    """uint32 [size*size + 2, 2]: ko-ban location keys, padded.

    Index size*size is the pass pad; index size*size+1 maps ko_loc == -1
    (no ban) when offset; callers index with (ko_loc if >=0 else size*size).
    """
    t = _master_tables()["ko_loc"][:size, :size, :].reshape(size * size, 2)
    pad = np.zeros((2, 2), dtype=np.uint32)
    return np.concatenate([t, pad], axis=0)


def player_table() -> np.ndarray:
    """uint32 [2, 2]: player-to-move keys (index by player-1)."""
    return _master_tables()["player"]


def encore_table() -> np.ndarray:
    """uint32 [3, 2]: encore-phase keys. Phase 0 is all-zero so main-phase
    ko hashes equal the plain position hash (callers may skip the XOR)."""
    t = _master_tables()["encore"].copy()
    t[0] = 0
    return t


@functools.lru_cache(maxsize=None)
def ko_mark_table(size: int) -> np.ndarray:
    """uint32 [size*size + 1, 2]: encore ko-recap-block mark keys, padded so
    scatter at the pass/pad slot is harmless."""
    t = _master_tables()["ko_mark"][:size, :size, :].reshape(size * size, 2)
    pad = np.zeros((1, 2), dtype=np.uint32)
    return np.concatenate([t, pad], axis=0)
