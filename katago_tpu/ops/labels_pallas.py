"""Pallas TPU kernel for connected-component labeling of Go boards.

`board.connected_labels` is the hottest primitive in the vectorized engine
(every play_move / legality / liberty / area query runs it). The reference
maintains chain linked-lists incrementally in C++ (board.h:327-329); our
data-parallel equivalent is a min-label fixpoint.

The pure-JAX version uses a `while_loop` with data-dependent trip count
and per-element gathers (board.py:108-135). On TPU that shape is
unfriendly twice over: the gather (`lab[lab]` pointer jump) lowers to
slow scatter/gather sequences, and the dynamic while_loop defeats
pipelining. This kernel instead runs a *fixed* iteration count on one
game per grid step, entirely in VMEM:

  - neighbor-min via row-major shifts with edge masks (static
    slice+concat; `pltpu.roll` and the MXU one-hot dot both miscompile
    across 128-lane boundaries on the current tunneled runtime, so the
    pointer-jump gather is a VPU one-hot masked-reduce instead — same
    O(N^2) flops, all element-wise),
  - ITERS = 2*ceil(log2(area)) + 4 rounds: neighbor-min + pointer jump
    converges in O(log) rounds for path-shaped components but the min-
    label tree is not strictly halved every round, so the bound carries a
    2x safety factor (empirically 1 round beyond log2 can be needed).

Output matches board.connected_labels exactly (min reachable flat index
through 4-connected equal values).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _labels_kernel(values_ref, labels_ref, *, size: int, npad: int,
                   iters: int, block_g: int):
    nn = size * size
    # board values, padded tail is a sentinel no-match value
    idx2 = jax.lax.broadcasted_iota(jnp.int32, (block_g, npad), 1)
    on_board = idx2 < nn
    vals = values_ref[:]
    vals = jnp.where(on_board, vals, jnp.int32(-(2 ** 20)))

    col = idx2 % size        # x coordinate in row-major layout
    big = jnp.int32(2 ** 22)

    def shift_right(arr, k):
        """Shift row contents right by k with zero fill (static slices —
        pltpu.roll is avoided because multi-lane rolls miscompile on some
        TPU runtimes)."""
        return jnp.concatenate(
            [jnp.zeros((block_g, k), arr.dtype), arr[:, :npad - k]], axis=1)

    def shift_left(arr, k):
        return jnp.concatenate(
            [arr[:, k:], jnp.zeros((block_g, k), arr.dtype)], axis=1)

    def nbr_min(lab):
        """Min label over 4-connected same-valued neighbors (shifts)."""
        best = lab

        def consider(shifted_lab, shifted_vals, valid):
            same = valid & (shifted_vals == vals)
            return jnp.minimum(best, jnp.where(same, shifted_lab, big))

        # left neighbor (shift right by 1): invalid for x == 0
        best = consider(shift_right(lab, 1), shift_right(vals, 1),
                        (col > 0) & on_board)
        # right neighbor
        best = consider(shift_left(lab, 1), shift_left(vals, 1),
                        (col < size - 1) & on_board)
        # up neighbor (shift down by size)
        best = consider(shift_right(lab, size), shift_right(vals, size),
                        (idx2 >= size) & on_board)
        # down neighbor
        best = consider(shift_left(lab, size), shift_left(vals, size),
                        (idx2 < nn - size) & on_board)
        return best

    def jump(lab):
        """lab[lab] per game as a one-hot matmul (MXU gather).

        onehot[g, i, j] = (lab[g, i] == j); gathered[g, i] = lab[g, lab[g,i]]
        via a per-game [npad, npad] @ [npad, 1] product."""
        targets = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        rows = []
        for gi in range(block_g):          # static unroll: no dynamic_slice
            row = lab[gi, :]
            onehot = row.reshape(npad, 1) == targets        # [npad, npad]
            gathered = jnp.sum(
                jnp.where(onehot, row.reshape(1, npad), 0), axis=1)
            rows.append(gathered)
        return jnp.stack(rows, axis=0)

    lab0 = jnp.where(on_board, idx2, big)

    def body(_, lab):
        lab = nbr_min(lab)
        lab = jnp.where(on_board, jump(lab), lab)
        return lab

    lab = jax.lax.fori_loop(0, iters, body, lab0)
    labels_ref[:] = jnp.where(on_board, lab, idx2)


@functools.partial(jax.jit, static_argnums=(1, 2))
def connected_labels_batch(values: jax.Array, size: int,
                           interpret: bool | None = None) -> jax.Array:
    """Batched connected labels: values int32[G, NN] -> labels int32[G, NN].

    Equivalent to vmap(board.connected_labels) but as one fused TPU kernel
    (one game per grid step, fixed log-depth iteration).

    interpret: force pallas interpreter (default: auto — interpret on CPU
    backends so tests run without a TPU).
    """
    g, nn = values.shape
    assert nn == size * size
    npad = _round_up(nn, 128)
    block_g = 8                     # sublane tiling constraint (f32: 8x128)
    gpad = _round_up(max(g, 1), block_g)
    iters = 2 * int(np.ceil(np.log2(max(nn, 2)))) + 4
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    vpad = jnp.zeros((gpad, npad), jnp.int32)
    vpad = vpad.at[:g, :nn].set(values)

    out = pl.pallas_call(
        functools.partial(_labels_kernel, size=size, npad=npad, iters=iters,
                          block_g=block_g),
        out_shape=jax.ShapeDtypeStruct((gpad, npad), jnp.int32),
        grid=(gpad // block_g,),
        in_specs=[pl.BlockSpec((block_g, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_g, npad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vpad)
    return out[:g, :nn]
