"""Dihedral board symmetries for NN eval randomization.

The reference randomizes the symmetry of every NN query (nnRandomize,
cpp/neuralnet/nneval.h:169-179 / nneval.cpp getOutput's symmetry pick) and
can average several sampled symmetries at the root
(rootNumSymmetriesToSample, searchparams.h:76). Inputs are transformed
before the forward pass and the spatial outputs (policy, ownership)
transformed back, so the search sees canonical-orientation results.

TPU shape: a symmetry is a static [8, NN] location-permutation table baked
as a constant; applying one is a single gather indexed by a traced per-game
symmetry id — no conditionals, vmappable, scan-safe.

Symmetry ids use the same bit convention as SymmetryHelpers and
search/localpattern.py: bit0 transpose (applied last), bit1 flipX,
bit2 flipY.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def loc_perm(size: int) -> np.ndarray:
    """[8, NN+1] int32 forward maps F[s][i] = image of flat loc i under
    symmetry s; the last row entry (pass, loc NN) is a fixed point."""
    nn = size * size
    locs = np.arange(nn)
    y, x = locs // size, locs % size
    out = np.zeros((8, nn + 1), np.int32)
    for s in range(8):
        sx = (size - 1 - x) if (s & 2) else x
        sy = (size - 1 - y) if (s & 4) else y
        if s & 1:
            ty, tx = sx, sy
        else:
            ty, tx = sy, sx
        out[s, :nn] = ty * size + tx
        out[s, nn] = nn
    return out


@functools.lru_cache(maxsize=None)
def inv_loc_perm(size: int) -> np.ndarray:
    """[8, NN+1] inverse maps: inv[s][F[s][i]] = i."""
    f = loc_perm(size)
    inv = np.zeros_like(f)
    for s in range(8):
        inv[s, f[s]] = np.arange(f.shape[1])
    return inv


def transform_spatial(feat, sym, size: int):
    """Transform per-location features [NN, C] (or [NN]) of the original
    board into the symmetry-s board: out[F[i]] = feat[i], i.e. one gather
    by the inverse map."""
    idx = jnp.asarray(inv_loc_perm(size))[sym, : size * size]
    return feat[idx]


def untransform_spatial(feat, sym, size: int):
    """Map per-location outputs produced on the symmetry-s board back to
    the original orientation: out[i] = feat[F[i]]."""
    idx = jnp.asarray(loc_perm(size))[sym, : size * size]
    return feat[idx]


def untransform_policy(pol, sym, size: int):
    """Map a policy row [A] (A = NN+1, trailing pass) back to the original
    orientation."""
    idx = jnp.asarray(loc_perm(size))[sym]
    return pol[..., idx]
