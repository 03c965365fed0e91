"""TPU-friendly gather/scatter replacements for small tables.

XLA on TPU lowers point gathers (``table[idx]`` with a vector of
arbitrary indices) and scatters (``arr.at[idx].add/set`` with vector
indices) to serialized loops — measured at 10-50ms per call for
[128, 361]-shaped operands on v5e, versus ~0.1ms for the equivalent
one-hot compare-reduce, which is pure VPU/MXU work. The reference
engine has no analogue (scalar C++ indexes for free,
cpp/game/board.h:327-329); this module is the price and the remedy of
the data-parallel formulation.

Use these for *small* index domains (boards: NN+1 slots, node pools:
max_nodes slots) where the O(K·M) one-hot work is trivially cheap and
fully vectorized. On CPU backends the direct indexing is faster and is
kept (tests and the virtual-mesh paths run there).

Values must stay exactly representable in float32 (|v| < 2^24) on the
accelerated path: labels, liberty/stone counts, node indices, visit
counts all qualify. Do NOT route 32-bit hashes through these helpers;
split them into uint16 lanes first or keep the direct gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _accelerated() -> bool:
    return jax.default_backend() != "cpu"


def gather_1d(table: jax.Array, idx: jax.Array) -> jax.Array:
    """``table[idx]`` for 1-D ``table`` (out-of-range indices read 0).

    table: [M] int or float (int must fit f32 exactly); idx: any shape.
    On accelerators: one-hot compare-reduce (matmul-shaped, no serialized
    gather). On CPU: direct clipped indexing.
    """
    m = table.shape[0]
    if not _accelerated():
        inb = (idx >= 0) & (idx < m)
        safe = jnp.clip(idx, 0, m - 1)
        return jnp.where(inb, table[safe], jnp.zeros((), table.dtype))
    bins = jnp.arange(m, dtype=jnp.int32)
    oh = (idx[..., None] == bins).astype(jnp.float32)  # [..., M]
    out = jnp.einsum("...m,m->...", oh, table.astype(jnp.float32))
    if jnp.issubdtype(table.dtype, jnp.integer) or table.dtype == jnp.bool_:
        return jnp.round(out).astype(table.dtype)
    return out.astype(table.dtype)


def bincount_sum(idx: jax.Array, num_bins: int,
                 weights: jax.Array | None = None,
                 dtype=jnp.float32) -> jax.Array:
    """``zeros(num_bins).at[idx].add(weights)`` without the serialized
    scatter: out[m] = sum over flattened idx of weights where idx == m.
    Out-of-range indices contribute nothing. idx/weights: same shape.
    """
    flat = idx.reshape(-1)
    w = (jnp.ones(flat.shape, jnp.float32) if weights is None
         else weights.reshape(-1).astype(jnp.float32))
    if not _accelerated():
        inb = (flat >= 0) & (flat < num_bins)
        safe = jnp.clip(flat, 0, num_bins - 1)
        out = jnp.zeros((num_bins,), jnp.float32).at[safe].add(
            jnp.where(inb, w, 0.0))
        return out.astype(dtype)
    bins = jnp.arange(num_bins, dtype=jnp.int32)
    oh = (flat[:, None] == bins).astype(jnp.float32)       # [K, M]
    out = jnp.einsum("km,k->m", oh, w)
    if jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
        return jnp.round(out).astype(dtype)
    return out.astype(dtype)


def bincount_max(idx: jax.Array, num_bins: int, values: jax.Array,
                 fill, dtype=None) -> jax.Array:
    """``full(num_bins, fill).at[idx].max(values)`` without the scatter."""
    dtype = dtype or values.dtype
    flat = idx.reshape(-1)
    v = values.reshape(-1)
    if not _accelerated():
        inb = (flat >= 0) & (flat < num_bins)
        safe = jnp.clip(flat, 0, num_bins - 1)
        fl = jnp.asarray(fill, dtype)
        return jnp.full((num_bins,), fill, dtype).at[safe].max(
            jnp.where(inb, v.astype(dtype), fl))
    bins = jnp.arange(num_bins, dtype=jnp.int32)
    hit = flat[:, None] == bins                             # [K, M]
    vf = v.astype(jnp.float32)
    neg = jnp.float32(np.finfo(np.float32).min)
    out = jnp.max(jnp.where(hit, vf[:, None], neg), axis=0)
    out = jnp.where(jnp.any(hit, axis=0), out, jnp.asarray(fill, jnp.float32))
    return jnp.round(out).astype(dtype) if jnp.issubdtype(
        jnp.dtype(dtype), jnp.integer) else out.astype(dtype)


def xor_gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """XOR of ``table[idx[..., k]]`` rows over idx's last axis.

    table: uint32[M, W]; idx: int[..., K] (out-of-range rows contribute
    nothing). Returns uint32[..., W].

    On accelerators the point-gather this replaces serializes per index
    (measured ~1ms per [128, 4, 361] gather from a [362, 2] table inside
    the search step); here XOR becomes bit-plane parity: one-hot COUNTS
    of selected rows (exact in f32 for K <= 2^24) einsum'd against the
    table's 32W bit planes, then mod-2 and bit repacking — matmul-shaped
    VPU/MXU work with no serialized memory ops.
    """
    m, w = table.shape
    if not _accelerated():
        inb = (idx >= 0) & (idx < m)
        safe = jnp.clip(idx, 0, m - 1)
        rows = jnp.where(inb[..., None], table[safe], jnp.uint32(0))
        return jax.lax.reduce(rows, np.uint32(0), jax.lax.bitwise_xor,
                              (idx.ndim - 1,))
    bins = jnp.arange(m, dtype=jnp.int32)
    cnt = jnp.sum((idx[..., None] == bins).astype(jnp.float32), axis=-2)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    tbits = ((table[:, :, None] >> shifts) & jnp.uint32(1)).astype(
        jnp.float32).reshape(m, w * 32)                     # [M, W*32]
    acc = jnp.einsum("...m,mb->...b", cnt, tbits)           # [..., W*32]
    parity = (jnp.round(acc).astype(jnp.int32) % 2).astype(jnp.uint32)
    parity = parity.reshape(parity.shape[:-1] + (w, 32))
    return jnp.sum(parity << shifts, axis=-1, dtype=jnp.uint32)


def segment_xor_onehot(values: jax.Array, segment_ids: jax.Array,
                       num_segments: int) -> jax.Array:
    """XOR-reduce uint32[N, W] rows by segment id — the one-hot parity
    form of utils.segment_ops.segment_xor (whose sort+scatter path
    serializes on TPU). Rows with id outside [0, num_segments) drop."""
    n, w = values.shape
    if not _accelerated():
        from katago_tpu.utils.segment_ops import segment_xor as _sx
        return _sx(values, segment_ids, num_segments)
    bins = jnp.arange(num_segments, dtype=jnp.int32)
    oh = (segment_ids[:, None] == bins).astype(jnp.float32)  # [N, S]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    vbits = ((values[:, :, None] >> shifts) & jnp.uint32(1)).astype(
        jnp.float32).reshape(n, w * 32)
    acc = jnp.einsum("ns,nb->sb", oh, vbits)                 # [S, W*32]
    parity = (jnp.round(acc).astype(jnp.int32) % 2).astype(jnp.uint32)
    parity = parity.reshape(num_segments, w, 32)
    return jnp.sum(parity << shifts, axis=-1, dtype=jnp.uint32)
