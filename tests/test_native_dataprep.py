"""Native data-prep library tests: C++ path must agree with the numpy
fallback exactly (native/dataprep.cpp via dataio/native.py)."""

import numpy as np
import pytest

from katago_tpu.dataio import native as N


pytestmark = pytest.mark.skipif(not N.have_native(),
                                reason="libktdataprep.so not built")


def _numpy_unpack(packed, area):
    return np.unpackbits(packed, axis=2)[:, :, :area].astype(np.float32)


def test_unpack_matches_numpy():
    rng = np.random.default_rng(0)
    n, c, area = 5, 22, 81
    packed = rng.integers(0, 256, (n, c, (area + 7) // 8), dtype=np.uint8)
    np.testing.assert_array_equal(N.unpack_bits_nchw_native(packed, area),
                                  _numpy_unpack(packed, area))


@pytest.mark.parametrize("sym", range(8))
def test_symmetry_planes_matches_numpy(sym):
    rng = np.random.default_rng(sym)
    x = rng.random((3, 4, 9, 9)).astype(np.float32)
    ours = N.apply_symmetry_planes(x, sym)
    # reference fallback path
    ref = x
    if sym & 2:
        ref = ref[:, :, ::-1, :]
    if sym & 1:
        ref = ref[:, :, :, ::-1]
    if sym & 4:
        ref = ref.transpose(0, 1, 3, 2)
    np.testing.assert_array_equal(ours, np.ascontiguousarray(ref))


@pytest.mark.parametrize("sym", [1, 3, 5, 7])
def test_symmetry_policy_preserves_pass_and_mass(sym):
    rng = np.random.default_rng(sym)
    size = 9
    p = rng.random((4, size * size + 1)).astype(np.float32)
    out = N.apply_symmetry_policy(p, size, sym)
    np.testing.assert_array_equal(out[:, -1], p[:, -1])
    np.testing.assert_allclose(out[:, :-1].sum(1), p[:, :-1].sum(1),
                               rtol=1e-6)
    # involution: applying flips twice restores (sym without transpose
    # composes to identity for pure flips)
    if sym in (1, 3):
        back = N.apply_symmetry_policy(out, size, sym)
        np.testing.assert_array_equal(back, p)


def test_roundtrip_with_trainingwrite():
    """Native unpack slots into the npz decode path."""
    from katago_tpu.dataio import trainingwrite as TW
    rng = np.random.default_rng(1)
    size, n = 5, 6
    area = size * size
    spatial = rng.integers(0, 2, (n, size, size, 22)).astype(np.float32)
    planes = np.transpose(spatial.astype(np.uint8), (0, 3, 1, 2))
    packed = np.packbits(planes.reshape(n, 22, area), axis=2)
    unpacked = N.unpack_bits_nchw_native(packed, area)
    np.testing.assert_array_equal(
        unpacked.reshape(n, 22, size, size).transpose(0, 2, 3, 1), spatial)


def test_native_sgf_scanner_matches_python():
    """native/sgfscan.cpp main-line scan == python parser facts."""
    from katago_tpu.dataio import sgf as S
    from katago_tpu.dataio.sgfscan import have_native, scan_sgf_or_parse

    text = ("(;GM[1]FF[4]SZ[9]KM[5.5]HA[2]PB[ann]PW[bo\\]b]RE[B+R]"
            "AB[cc][gg];W[ee];B[dd](;W[cd];B[ce])(;W[dg]))")
    out = scan_sgf_or_parse(text)
    game = S.parse_sgf(text)[0]
    assert out.size == game.size
    assert out.komi == game.komi
    assert out.handicap == game.handicap
    assert out.result_str == game.result == "B+R"
    assert out.moves == game.moves()        # variations: first child only
    assert out.setup_stones == game.setup_stones()
    assert out.black_name == "ann"
    # rectangular + pass + tt-as-pass
    t2 = "(;SZ[5:3]KM[0];B[];W[ab];B[tt])"
    o2 = scan_sgf_or_parse(t2)
    g2 = S.parse_sgf(t2)[0]
    assert o2.size == (5, 3) and o2.moves == g2.moves()
    if have_native():
        from katago_tpu.dataio.sgfscan import scan_sgf
        assert scan_sgf(text).moves == out.moves
