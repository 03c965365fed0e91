"""Pattern bonus / avoid-repeated-shapes — reference
cpp/search/patternbonustable.{h,cpp} + searchparams.h
avoidRepeatedPatternUtility.

The reference keeps a table of 9x9 local-pattern hashes -> white-utility
bonuses. Before every search with avoidRepeatedPatternUtility != 0, the
current game's own past moves (of the player the search is for) are
inserted with a penalty, in all 16 symmetry images, so the engine avoids
replaying its own shapes (search.cpp:715-727). Selfplay/match can also
load an external table from previous games' SGFs.

TPU shape: the table is built on the HOST between searches (numpy
hashing, PatternBonusTable below) and shipped to the device as two small
arrays (keys uint32[P,2], bonus f32[P]). In-tree, a freshly inserted
node computes its move's 9x9 pattern hash (one static gather + XOR fold)
and takes the bonus of the matching key, if any — a [P]-wide compare.
The bonus feeds the node's recomputed utility average exactly where the
reference adds it (search.cpp:1073). The whole feature is a static
toggle on run_search: searches without it compile none of this.

Deviation: the atari keys of the reference's hash are omitted on both
the build and probe sides (in-tree atari status would cost a liberty
fixpoint per playout), so patterns differing only in atari status
collide — a slightly coarser penalty.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.search import localpattern as LP

PATTERN_WIN = 9  # the reference's patternHasher.init(9,9) window


class PatternBonusArrs(NamedTuple):
    """Device form of the table, shared across the [G] batch."""
    keys: jax.Array   # uint32[P, 2]; all-ones rows are empty slots
    bonus: jax.Array  # f32[P] white-utility bonus per key


class PatternBonusTable:
    """Host-side hash -> bonus map (PatternBonusTable, minus file IO)."""

    def __init__(self):
        self.entries: dict[tuple[int, int], float] = {}

    def add_bonus(self, stones: np.ndarray, move_loc: int, pla: int,
                  size: int, bonus: float,
                  seen: set | None = None) -> None:
        """Add `bonus` for this move's pattern in all 16 symmetry images
        (addBonus, patternbonustable.cpp:58-100). `seen` dedups within one
        game so a shape repeated in-game is only penalized once."""
        for sym in range(8):
            for flip in (False, True):
                h = LP.host_pattern_hash(stones, move_loc, pla, size,
                                         PATTERN_WIN, symmetry=sym,
                                         flip_colors=flip)
                key = (int(h[0]), int(h[1]))
                if seen is not None:
                    if key in seen:
                        continue
                    seen.add(key)
                self.entries[key] = self.entries.get(key, 0.0) + bonus

    def add_game_moves(self, boards_before: list[np.ndarray],
                       moves: list[int], plas: list[int], size: int,
                       bonus: float, only_pla: int | None = None) -> None:
        """addBonusForGameMoves: one entry per (board-before, move) of
        only_pla (or both players when None)."""
        seen: set = set()
        for stones, mv, pla in zip(boards_before, moves, plas):
            if only_pla is not None and pla != only_pla:
                continue
            if not (0 <= mv < size * size):
                continue
            self.add_bonus(np.asarray(stones), mv, pla, size, bonus, seen)

    def to_arrays(self, capacity: int | None = None) -> PatternBonusArrs:
        """Pack into device arrays. Capacity defaults to the next power of
        two above the entry count (min 16)."""
        n = len(self.entries)
        p = capacity or max(16, 1 << int(np.ceil(np.log2(max(n, 1) + 1))))
        keys = np.full((p, 2), 0xFFFFFFFF, np.uint32)
        bonus = np.zeros((p,), np.float32)
        for i, ((k0, k1), b) in enumerate(self.entries.items()):
            if i >= p:
                break
            keys[i] = (k0, k1)
            bonus[i] = b
        return PatternBonusArrs(keys=jnp.asarray(keys),
                                bonus=jnp.asarray(bonus))


def lookup(arrs: PatternBonusArrs, stones, move_loc, pla, size: int):
    """Device-side probe: the white-utility bonus for playing move_loc as
    pla on `stones` (0.0 when the pattern is unknown). [P]-wide compare —
    P is tens of entries, negligible next to the NN forward."""
    h = LP.local_pattern_hash(stones, move_loc, pla, size, PATTERN_WIN)
    hit = (arrs.keys[:, 0] == h[0]) & (arrs.keys[:, 1] == h[1])
    return jnp.sum(jnp.where(hit, arrs.bonus, 0.0))


def build_avoid_repeat_table(boards_before, moves, plas, size: int,
                             pla_for: int, avoid_utility: float
                             ) -> PatternBonusArrs | None:
    """The per-search avoidRepeatedPatternUtility table
    (search.cpp:719-725): penalize pla_for's own past shapes. Bonus sign
    is to WHITE's utility: white searching gets -u, black +u. Returns
    None when there is nothing to avoid (feature stays compiled out)."""
    if avoid_utility == 0.0 or not moves:
        return None
    t = PatternBonusTable()
    bonus = -avoid_utility if pla_for == B.WHITE else avoid_utility
    t.add_game_moves(boards_before, moves, plas, size, bonus,
                     only_pla=pla_for)
    if not t.entries:
        return None
    return t.to_arrays()
