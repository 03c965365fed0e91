"""Vectorized Go board engine — the TPU-native replacement for cpp/game/board.{cpp,h}.

The reference implements a scalar, incrementally-updated board: a 1-D padded
array with chain circular linked lists and incrementally maintained liberty
counts (/root/reference/cpp/game/board.h:48-52,327-329). That design is ideal
for one CPU thread mutating one board; it is hostile to TPUs.

This module instead represents ONE game as fixed-shape arrays and makes every
operation a pure function of them, so that `jax.vmap` steps thousands of games
in lockstep under `jit`:

  * stones: int32[NN]   (0 empty / 1 black / 2 white), NN = size*size
  * chain identification: connected-component labels computed by iterated
    neighbor-min + pointer-jumping (converges in O(log diameter) rounds of
    cheap [NN] vector ops — VPU-friendly, no data-dependent shapes)
  * exact per-chain liberty counts: each empty point contributes 1 to each
    *distinct* adjacent chain label (dedup over the <=4 neighbors), realized
    as a scatter-add — no pseudoliberty approximation
  * captures / suicide / simple-ko: masked vector selects from the label +
    liberty arrays, no control flow
  * position hash: 64-bit Zobrist as uint32[2] lanes, XOR-updated

Move encoding: flat locations 0..NN-1, PASS == NN. All gathers/scatters use
arrays padded to NN+1 so a pass is a harmless no-op on the pad slot.

Semantics parity targets (tested against a pure-python oracle and the
reference's documented behavior):
  - captures before suicide; multi-stone suicide only if rules allow, single
    stone suicide always illegal (board.h:249-260, isSuicide semantics)
  - simple ko ban set iff exactly one stone captured and the placed stone
    forms a size-1 chain with exactly one liberty
  - Tromp-Taylor area scoring of empty regions by bordering color
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import zobrist
from katago_tpu.ops import lookup as L

EMPTY = 0
BLACK = 1
WHITE = 2
WALL = 3  # value of the pad slot, never equal to any on-board value

INT_MAX = np.int32(2**31 - 1)


def pass_loc(size: int) -> int:
    return size * size


def opponent(player):
    return 3 - player


@functools.lru_cache(maxsize=None)
def neighbor_table(size: int) -> np.ndarray:
    """int32[NN, 4] flat neighbor indices; off-board -> NN (pad slot)."""
    nn = size * size
    neigh = np.full((nn, 4), nn, dtype=np.int32)
    for y in range(size):
        for x in range(size):
            p = y * size + x
            if x > 0:
                neigh[p, 0] = p - 1
            if x < size - 1:
                neigh[p, 1] = p + 1
            if y > 0:
                neigh[p, 2] = p - size
            if y < size - 1:
                neigh[p, 3] = p + size
    return neigh


class BoardState(NamedTuple):
    """Pure board position (no history). All fields single-game; vmap for batch."""
    stones: jax.Array    # int32[NN]
    ko_loc: jax.Array    # int32 scalar, simple-ko banned loc or -1
    pos_hash: jax.Array  # uint32[2], zobrist xor of stones


class MoveInfo(NamedTuple):
    num_captured: jax.Array       # int32: opponent stones removed
    num_self_captured: jax.Array  # int32: own stones removed (legal suicide)
    is_pass: jax.Array            # bool
    captured_mask: jax.Array      # bool[NN] all removed stones (both colors)


def empty_board(size: int) -> BoardState:
    nn = size * size
    return BoardState(
        stones=jnp.zeros((nn,), jnp.int32),
        ko_loc=jnp.int32(-1),
        pos_hash=jnp.zeros((2,), jnp.uint32),
    )


def _pad(arr: jax.Array, value) -> jax.Array:
    return jnp.concatenate([arr, jnp.full((1,), value, arr.dtype)])


def shift4(x: jax.Array, size: int, pad_val) -> jax.Array:
    """[4, NN]: x shifted so row d holds each point's d-direction neighbor
    value (up/down/left/right), pad_val off-board. The vectorized
    replacement for neighbor_table gathers: TPU serializes [NN,4]-index
    gathers but pad+slice shifts stay pure vector ops."""
    x2 = x.reshape(size, size)
    pv = jnp.asarray(pad_val, x.dtype)
    row = jnp.full((1, size), pv, x.dtype)
    col = jnp.full((size, 1), pv, x.dtype)
    up = jnp.concatenate([x2[1:, :], row])
    down = jnp.concatenate([row, x2[:-1, :]])
    left = jnp.concatenate([x2[:, 1:], col], axis=1)
    right = jnp.concatenate([col, x2[:, :-1]], axis=1)
    return jnp.stack([up, down, left, right]).reshape(4, size * size)


import os as _os

_PALLAS_LABELS = _os.environ.get("KATAGO_PALLAS_LABELS", "") not in ("", "0")


def connected_labels(values: jax.Array, size: int) -> jax.Array:
    """Label connected components of equal values.

    Returns int32[NN]: for each point, the minimum flat index reachable via
    4-connected paths through points holding the same value. Labels both
    stone chains and empty regions in one pass.

    Replaces the reference's chain linked lists (board.h:327-329) with a
    data-parallel fixpoint: per round, take the min label over same-valued
    neighbors, iterated to convergence.

    Deliberately NO pointer jumping: ``lab[lab]`` is a point-gather with
    data-dependent indices, which serializes on TPU (measured 44ms/call at
    [128, 361] on v5e vs 1ms for pure propagation); a one-hot matmul jump
    costs ~1ms/round and measurably regresses even when guarded behind a
    converged flag. Pure propagation converges in rounds proportional to
    the largest component's graph diameter — ~15-20 rounds of ~12 cheap
    [NN] vector ops on real boards (the sprawling empty region dominates,
    not stone chains), with a worst case of ~NN/4 rounds (~5ms) only while
    an adversarial snake chain exists.
    """
    if _PALLAS_LABELS and jax.default_backend() == "tpu":
        # opt-in fused TPU kernel (ops/labels_pallas.py): fixed log-depth
        # iteration in VMEM instead of the data-dependent while_loop —
        # KATAGO_PALLAS_LABELS=1 to enable, pending tunnel validation
        from katago_tpu.ops.labels_pallas import connected_labels_batch
        return connected_labels_batch(values[None, :], size)[0]
    nn = size * size
    idx = jnp.arange(nn, dtype=jnp.int32)
    same = shift4(values, size, WALL) == values[None, :]  # [4, NN]

    def propagate(lab):
        nbr_min = jnp.min(jnp.where(same, shift4(lab, size, INT_MAX),
                                    INT_MAX), axis=0)
        return jnp.minimum(lab, nbr_min)

    def body(carry):
        lab, _ = carry
        lab2 = lab
        for _ in range(4):   # 4 propagations per convergence check
            lab2 = propagate(lab2)
        return lab2, jnp.any(lab2 != lab)

    lab, _ = jax.lax.while_loop(lambda c: c[1], body, (idx, jnp.bool_(True)))
    return lab


def chain_liberties(stones: jax.Array, labels: jax.Array, size: int) -> jax.Array:
    """Exact per-chain liberty counts, broadcast to each stone.

    Returns int32[NN]: for occupied points, the number of distinct empty
    points adjacent to the point's chain; 0 for empty points.
    """
    nn = size * size
    is_empty = stones == EMPTY
    nbr_s = shift4(stones, size, WALL)                      # [4, NN]
    nbr_lab = shift4(labels, size, jnp.int32(nn))
    nbr_occ = (nbr_s == BLACK) | (nbr_s == WHITE)
    # candidate chain labels this empty point is a liberty of
    cand = [jnp.where(is_empty & nbr_occ[d], nbr_lab[d], nn)
            for d in range(4)]
    # dedup within the 4 neighbors so each empty point counts once per chain
    for k in range(1, 4):
        dup = jnp.zeros_like(cand[k], dtype=bool)
        for j in range(k):
            dup = dup | (cand[k] == cand[j])
        cand[k] = jnp.where(dup, nn, cand[k])
    cand = jnp.stack(cand)                                  # [4, NN]
    # per-chain counts via compare-reduce, then read back at each point's
    # own label — both as one-hot ops (ops/lookup.py) because TPU
    # serializes the vector-index scatter-add/gather this replaces
    counts = L.bincount_sum(jnp.where(cand != nn, cand, -1), nn,
                            dtype=jnp.int32)
    libs = L.gather_1d(counts, labels)
    occupied = (stones == BLACK) | (stones == WHITE)
    return jnp.where(occupied, libs, 0)


def _xor_reduce_masked(keys: jax.Array, mask: jax.Array) -> jax.Array:
    """XOR-reduce uint32[NN, 2] rows where mask[NN] is true -> uint32[2]."""
    masked = jnp.where(mask[:, None], keys, jnp.uint32(0))
    return jax.lax.reduce(masked, np.uint32(0), jax.lax.bitwise_xor, (0,))


def legal_moves_basic(state: BoardState, player: jax.Array,
                      multi_suicide_legal: jax.Array, size: int) -> jax.Array:
    """bool[NN]: legality ignoring superko (empty, ko ban, suicide rules).

    Mirrors Board::isLegal minus history (reference board.h:249-260):
    a move is legal iff the target is empty, not simple-ko banned, and not a
    forbidden suicide. Suicide analysis uses exact chain liberties:
      playable iff it has an empty neighbor, OR joins an own chain with >=2
      libs, OR captures an adjacent opp chain with exactly 1 lib; otherwise
      it is suicide — legal only if multi-stone (some own neighbor) and the
      rules allow multi-stone suicide.
    """
    nn = size * size
    stones = state.stones
    labels = connected_labels(stones, size)
    libs = chain_liberties(stones, labels, size)

    nbr_s = shift4(stones, size, WALL)          # [4, NN]
    nbr_libs = shift4(libs, size, jnp.int32(0))
    opp = opponent(player)

    is_empty = stones == EMPTY
    has_empty_nbr = jnp.any(nbr_s == EMPTY, axis=0)
    own_safe = jnp.any((nbr_s == player) & (nbr_libs >= 2), axis=0)
    captures = jnp.any((nbr_s == opp) & (nbr_libs == 1), axis=0)
    own_any = jnp.any(nbr_s == player, axis=0)

    suicide = ~has_empty_nbr & ~own_safe & ~captures
    legal_suicide = suicide & multi_suicide_legal & own_any
    not_ko = jnp.arange(nn, dtype=jnp.int32) != state.ko_loc
    return is_empty & not_ko & (~suicide | legal_suicide)


def play_move(state: BoardState, loc: jax.Array, player: jax.Array,
              size: int) -> tuple[BoardState, MoveInfo]:
    """Apply a move (assumed basic-legal, or PASS == NN). Pure function.

    Handles captures, legal multi-stone suicide removal, simple-ko ban
    setting, and incremental Zobrist hash update. The caller is responsible
    for legality masking (as with Board::playMoveAssumeLegal in the
    reference); an illegal input produces a consistent-but-wrong board, never
    a crash or shape change.
    """
    nn = size * size
    neigh = jnp.asarray(neighbor_table(size))
    zst = jnp.asarray(zobrist.stone_table(size))  # uint32[2, NN+1, 2]
    is_pass = loc >= nn
    loc_c = jnp.clip(loc, 0, nn)  # pass -> pad slot
    opp = opponent(player)

    # place the stone (pass writes the pad slot, then we drop it)
    stones1 = _pad(state.stones, EMPTY).at[loc_c].set(
        jnp.where(is_pass, EMPTY, player))[:nn]

    labels = connected_labels(stones1, size)
    libs = chain_liberties(stones1, labels, size)

    # any opponent chain at 0 libs was captured by this move
    captured = (stones1 == opp) & (libs == 0)
    num_captured = jnp.sum(captured.astype(jnp.int32))
    stones2 = jnp.where(captured, EMPTY, stones1)

    # suicide: only possible when nothing was captured; labels still valid
    lab_at = _pad(labels, jnp.int32(nn))[loc_c]
    libs_at = _pad(libs, 0)[loc_c]
    is_suicide = (~is_pass) & (num_captured == 0) & (libs_at == 0)
    own_chain = (labels == lab_at) & (stones1 == player)
    self_captured = jnp.where(is_suicide, own_chain, False)
    num_self = jnp.sum(self_captured.astype(jnp.int32))
    stones3 = jnp.where(self_captured, EMPTY, stones2)

    # zobrist update: add placed stone, remove captured of both colors
    key_place = jnp.where(
        is_pass, jnp.zeros((2,), jnp.uint32),
        zst[player - 1, loc_c])
    h = state.pos_hash ^ key_place
    h = h ^ _xor_reduce_masked(zst[opp - 1, :nn], captured)
    h = h ^ _xor_reduce_masked(zst[player - 1, :nn], self_captured)

    # simple ko: exactly one captured, placed stone is a lone stone with
    # exactly one liberty (the captured point)
    nbr_after = _pad(stones3, WALL)[neigh[jnp.clip(loc, 0, nn - 1)]]
    own_nbr_after = jnp.any(nbr_after == player)
    empty_nbrs_after = jnp.sum((nbr_after == EMPTY).astype(jnp.int32))
    is_ko = (~is_pass) & (num_captured == 1) & (~own_nbr_after) & (empty_nbrs_after == 1)
    captured_loc = jnp.argmax(captured).astype(jnp.int32)
    ko_loc_new = jnp.where(is_ko, captured_loc, jnp.int32(-1))

    new_state = BoardState(stones=stones3, ko_loc=ko_loc_new, pos_hash=h)
    info = MoveInfo(num_captured=num_captured, num_self_captured=num_self,
                    is_pass=is_pass, captured_mask=captured | self_captured)
    return new_state, info


def area_score_tromp_taylor(stones: jax.Array, size: int) -> tuple[jax.Array, jax.Array]:
    """Tromp-Taylor area ownership and score.

    Returns (ownership int32[NN] with +1 black / -1 white / 0 dame,
    score_diff float32 = black points - white points, no komi).
    Empty regions bordering stones of exactly one color count for that color.
    """
    nn = size * size
    labels = connected_labels(stones, size)
    is_empty = stones == EMPTY
    nbr_s = shift4(stones, size, WALL)
    touches_black = is_empty & jnp.any(nbr_s == BLACK, axis=0)
    touches_white = is_empty & jnp.any(nbr_s == WHITE, axis=0)
    # scatter-or per empty-region label (one-hot compare-reduce, lookup.py)
    lab_e = jnp.where(is_empty, labels, -1)
    tb = L.bincount_sum(jnp.where(touches_black, lab_e, -1), nn,
                        dtype=jnp.int32)
    tw = L.bincount_sum(jnp.where(touches_white, lab_e, -1), nn,
                        dtype=jnp.int32)
    region_black = (L.gather_1d(tb, labels) >= 1) & \
        (L.gather_1d(tw, labels) == 0) & is_empty
    region_white = (L.gather_1d(tw, labels) >= 1) & \
        (L.gather_1d(tb, labels) == 0) & is_empty
    ownership = jnp.where(stones == BLACK, 1,
                jnp.where(stones == WHITE, -1,
                jnp.where(region_black, 1,
                jnp.where(region_white, -1, 0)))).astype(jnp.int32)
    score = jnp.sum(ownership).astype(jnp.float32)
    return ownership, score


# ---------------------------------------------------------------------------
# Convenience host-side helpers (tests, CLI, SGF)

def loc_of_xy(x: int, y: int, size: int) -> int:
    return y * size + x


def board_to_string(stones: np.ndarray, size: int) -> str:
    chars = {EMPTY: ".", BLACK: "X", WHITE: "O", WALL: "#"}
    rows = []
    for y in range(size):
        rows.append("".join(chars[int(stones[y * size + x])] for x in range(size)))
    return "\n".join(rows)


def board_from_string(s: str) -> tuple[np.ndarray, int]:
    lines = [ln.strip() for ln in s.strip().splitlines() if ln.strip()]
    size = len(lines)
    stones = np.zeros((size * size,), np.int32)
    cmap = {".": EMPTY, "X": BLACK, "O": WHITE, "x": BLACK, "o": WHITE}
    for y, ln in enumerate(lines):
        assert len(ln) == size, f"row {y} has {len(ln)} cols, want {size}"
        for x, ch in enumerate(ln):
            stones[y * size + x] = cmap[ch]
    return stones, size
