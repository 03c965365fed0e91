"""ctypes bindings for the native data-prep library (native/dataprep.cpp).

The host-side training data pipeline's hot loop — npz bit-unpacking and
8-fold symmetry augmentation (data_processing_pytorch.py:28-299's role) —
runs in C++ when native/libktdataprep.so is built (native/build.sh), with
a transparent numpy fallback otherwise. Symmetries are encoded 0..7 as
(transpose << 2) | (flip_y << 1) | flip_x, the reference's convention
(nninputs.h:188-238).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libktdataprep.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.kt_unpack_bits_nchw.argtypes = [u8p, f32p, i64, i64, i64]
    lib.kt_apply_symmetry_planes.argtypes = [f32p, f32p, i64, i64, i64, i64,
                                             ctypes.c_int]
    lib.kt_apply_symmetry_policy.argtypes = [f32p, f32p, i64, i64, i64,
                                             ctypes.c_int]
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def unpack_bits_nchw(packed: np.ndarray, area: int) -> np.ndarray:
    """uint8 [N, C, ceil(area/8)] -> float32 [N, C, area].

    numpy's SIMD unpackbits wins this one (measured ~1.4x faster than the
    C++ LUT loop on this host), so the native path is kept only for
    environments without numpy acceleration; the C++ library earns its
    keep on the symmetry transforms below (~7x over numpy's strided
    copies)."""
    return np.unpackbits(packed, axis=2)[:, :, :area].astype(np.float32)


def unpack_bits_nchw_native(packed: np.ndarray, area: int) -> np.ndarray:
    n, c, _ = packed.shape
    lib = _load()
    if lib is None:
        return unpack_bits_nchw(packed, area)
    out = np.empty((n, c, area), np.float32)
    lib.kt_unpack_bits_nchw(np.ascontiguousarray(packed), out, n, c, area)
    return out


def apply_symmetry_planes(x: np.ndarray, sym: int) -> np.ndarray:
    """float32 [N, C, H, W] dihedral transform."""
    n, c, h, w = x.shape
    if sym == 0:
        return x
    lib = _load()
    if lib is None:
        out = x
        if sym & 2:
            out = out[:, :, ::-1, :]
        if sym & 1:
            out = out[:, :, :, ::-1]
        if sym & 4:
            out = out.transpose(0, 1, 3, 2)
        return np.ascontiguousarray(out)
    out = np.empty_like(x)
    lib.kt_apply_symmetry_planes(
        np.ascontiguousarray(x).reshape(n, c, h, w), out, n, c, h, w, sym)
    return out


def apply_symmetry_policy(p: np.ndarray, size: int, sym: int) -> np.ndarray:
    """float32 [N, area+1] policy rows (pass slot preserved)."""
    if sym == 0:
        return p
    n = p.shape[0]
    lib = _load()
    if lib is None:
        board = p[:, :size * size].reshape(n, size, size)
        out = board
        if sym & 2:
            out = out[:, ::-1, :]
        if sym & 1:
            out = out[:, :, ::-1]
        if sym & 4:
            out = out.transpose(0, 2, 1)
        return np.ascontiguousarray(
            np.concatenate([out.reshape(n, -1), p[:, -1:]], axis=1))
    out = np.empty_like(p)
    lib.kt_apply_symmetry_policy(np.ascontiguousarray(p), out, n, size,
                                 size, sym)
    return out
