"""Segmented array primitives missing from jax.ops (notably segment XOR).

Used by the rules engine to compute per-chain Zobrist keys: jax has
segment_sum/min/max but XOR is not a scatter combiner, so we realize it as
sort-by-segment + segmented associative scan (XOR is associative), then
gather each segment's total. O(NN log NN) vector ops, fully jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_xor(values: jax.Array, segment_ids: jax.Array,
                num_segments: int) -> jax.Array:
    """XOR-reduce rows of `values` grouped by segment_ids.

    Args:
      values: uint32[N, L] (L lanes XOR'd independently).
      segment_ids: int32[N] in [0, num_segments). Rows whose id >=
        num_segments are dropped.
      num_segments: static output size.

    Returns: uint32[num_segments, L].
    """
    n, lanes = values.shape
    order = jnp.argsort(segment_ids)
    sid = segment_ids[order]
    val = values[order]

    # segmented inclusive scan: flag marks the start of a segment
    flags = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[:, None], vb, va ^ vb)

    _, scanned = jax.lax.associative_scan(combine, (flags, val))

    # last element of each segment holds the segment's XOR total
    is_last = jnp.concatenate([sid[:-1] != sid[1:], jnp.ones((1,), bool)])
    sid_clip = jnp.where(is_last & (sid < num_segments), sid, num_segments)
    out = jnp.zeros((num_segments + 1, lanes), values.dtype)
    out = out.at[sid_clip].max(jnp.where(is_last[:, None], scanned, 0))
    return out[:num_segments]
