"""Model-format versions 3..17: parse, forward, and value-channel
normalization semantics (desc.cpp:2440-2545, nneval.cpp:1059-1199,
modelversion.cpp:35-48).

Files are synthesized in the reference's *text* float format (.txt.gz
lineage), which also exercises the non-@BIN@ reader path.
"""

import gzip

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.models import desc as D
from katago_tpu.models import features as F

# model version -> (inputs version, sv3 channels) per modelversion.cpp and
# desc.cpp:2305-2330
VERSION_TABLE = {
    3: (3, 1), 4: (3, 2), 5: (4, 2), 6: (5, 2), 7: (6, 2),
    8: (7, 4), 9: (7, 6), 10: (7, 6), 13: (7, 6), 15: (7, 6),
}


def _write_tiny_model(path, version, rng):
    """Minimal valid model file: 1 ordinary block, tiny channel counts."""
    iv, nsv = VERSION_TABLE[version]
    n_sp = F.NUM_SPATIAL_BY_VERSION[iv]
    n_gl = F.NUM_GLOBAL_BY_VERSION[iv]
    tc, pc, gc, vc, v2 = 8, 4, 4, 4, 6
    npol = 1 if version < 12 else 2
    toks = []

    def t(*xs):
        toks.extend(str(x) for x in xs)

    def floats(*shape):
        w = rng.standard_normal(shape).astype(np.float32) * 0.1
        toks.extend(repr(float(x)) for x in w.reshape(-1))
        return w

    def conv(name, ky, kx, ic, oc):
        t(name, ky, kx, ic, oc, 1, 1)
        floats(ky, kx, ic, oc)

    def bn(name, c):
        t(name, c, 1e-5, 1, 1)
        floats(c)                      # mean
        toks.extend(["1.0"] * c)       # variance
        floats(c)                      # scale
        floats(c)                      # bias

    def act(name):
        t(name)
        if version >= 11:
            t("ACTIVATION_RELU")

    def matmul(name, ic, oc):
        t(name, ic, oc)
        floats(ic, oc)

    def matbias(name, c):
        t(name, c)
        floats(c)

    t("testnet", version, n_sp, n_gl)
    if version >= 13:
        t(20.0, 20.0, 20.0, 20.0, 40.0, 0.25, 30.0)
    if version >= 15:
        t(0, 0, 0, 0, 0, 0, 0, 0)     # metaEncoderVersion, passAlive, 6 rsv
    t("trunk", 1, tc, tc, tc, 0, gc)
    if version >= 15:
        t(0, 0, 0, 0, 0, 0)           # norm kind + 5 reserved
    conv("initconv", 3, 3, n_sp, tc)
    matmul("initmm", n_gl, tc)
    t("ordinary_block", "b0")
    bn("b0prebn", tc)
    act("b0preact")
    conv("b0conv1", 3, 3, tc, tc)
    bn("b0midbn", tc)
    act("b0midact")
    conv("b0conv2", 3, 3, tc, tc)
    bn("tipbn", tc)
    act("tipact")
    t("policyhead")
    conv("p1conv", 1, 1, tc, pc)
    conv("g1conv", 1, 1, tc, gc)
    bn("g1bn", gc)
    act("g1act")
    matmul("g2b", 3 * gc, pc)
    bn("p1bn", pc)
    act("p1act")
    conv("p2conv", 1, 1, pc, npol)
    matmul("gpass", 3 * gc, npol)
    if version >= 15:
        matbias("passbias", npol)
        act("passact")
        matmul("gpass2", npol, npol)
    t("valuehead")
    conv("v1conv", 1, 1, tc, vc)
    bn("v1bn", vc)
    act("v1act")
    matmul("v2mul", 3 * vc, v2)
    matbias("v2bias", v2)
    act("v2act")
    matmul("v3mul", v2, 3)
    matbias("v3bias", 3)
    matmul("sv3mul", v2, nsv)
    matbias("sv3bias", nsv)
    conv("ownconv", 1, 1, vc, 1)
    with gzip.open(path, "wb") as f:
        f.write(" ".join(toks).encode("ascii"))


@pytest.mark.parametrize("version", sorted(VERSION_TABLE))
def test_parse_and_forward_all_versions(version, tmp_path):
    path = str(tmp_path / f"v{version}.txt.gz")
    _write_tiny_model(path, version, np.random.default_rng(version))
    net = D.load_model(path)
    assert net.version == version
    iv, nsv = VERSION_TABLE[version]
    assert net.input_version == iv
    assert net.num_spatial_inputs == F.NUM_SPATIAL_BY_VERSION[iv]
    assert net.num_global_inputs == F.NUM_GLOBAL_BY_VERSION[iv]
    assert net.value_head["sv3_mul"].out_ch == nsv

    b, size = 2, 9
    sp = jnp.asarray(np.random.default_rng(1).standard_normal(
        (b, size, size, net.num_spatial_inputs)).astype(np.float32))
    gl = jnp.zeros((b, net.num_global_inputs), jnp.float32)
    out = D.apply_desc_model(net, sp, gl)
    assert out["policy_logits"].shape == (b, 1 if version < 12 else 2,
                                          size * size + 1)
    assert out["miscvalue"].shape == (b, 10)
    assert out["moremiscvalue"].shape == (b, 8)
    assert np.isfinite(np.asarray(out["miscvalue"])).all()
    if version < 9:
        assert out["supports_shortterm_error"] is False
    else:
        assert "supports_shortterm_error" not in out


def _engine_consume(mv, mmv01):
    """The fixed engine postprocess (mcts.nn_leaf_eval conventions)."""
    score_mean = mv[0] * 20.0
    stdev = np.log1p(np.exp(mv[1])) * 20.0
    lead = mv[2] * 20.0
    vtime = np.log1p(np.exp(mv[3])) * 40.0
    st_wl = np.log1p(np.exp(mmv01[0] * 0.5)) * 0.5
    st_sc = np.log1p(np.exp(mmv01[1] * 0.5)) * np.sqrt(30.0)
    return score_mean, stdev, lead, vtime, st_wl, st_sc


def _norm(version, sv, area=361.0, pp=None):
    class Fake:
        pass

    d = Fake()
    d.version = version
    d.post_process = pp or {
        "td_score_mult": 20.0, "scoremean_mult": 20.0,
        "scorestdev_mult": 20.0, "lead_mult": 20.0,
        "variance_time_mult": 40.0, "shortterm_value_error_mult": 0.25,
        "shortterm_score_error_mult": 30.0}
    mask_sum = jnp.full((sv.shape[0], 1, 1, 1), area)
    mv, mmv = D._normalize_value_channels(d, jnp.asarray(sv), mask_sum)
    return ([np.asarray(x) for x in mv], [np.asarray(x) for x in mmv])


def softplus(x):
    return np.log1p(np.exp(x))


def test_v3_scorevalue_conversion():
    # v3 packs pre-atan scoreValue: whiteScoreMean = sv0 * 2 * sqrtArea
    # (nneval.cpp:1063-1094 with inverse_atan(atan(x)) == x)
    sv = np.array([[0.31]], np.float32)
    mv, mmv = _norm(3, sv, area=361.0)
    sm, stdev, lead, vtime, st_wl, st_sc = _engine_consume(
        [m[0] for m in mv], [m[0] for m in mmv])
    np.testing.assert_allclose(sm, 0.31 * 2 * 19.0, rtol=1e-5)
    assert stdev < 1e-3 and vtime < 1e-3
    np.testing.assert_allclose(lead, sm, rtol=1e-5)


def test_v4_lead_falls_back_to_scoremean():
    sv = np.array([[0.5, -0.2]], np.float32)
    mv, _ = _norm(5, sv)
    sm, stdev, lead, vtime, _, _ = _engine_consume(
        [m[0] for m in mv], [0.0, 0.0])
    np.testing.assert_allclose(sm, 10.0, rtol=1e-6)
    np.testing.assert_allclose(stdev, softplus(-0.2) * 20.0, rtol=1e-5)
    np.testing.assert_allclose(lead, sm, rtol=1e-6)
    assert vtime < 1e-3


@pytest.mark.parametrize("version,wl_fn,sc_fn", [
    # engine-side error stdevs by version (nneval.cpp:1163-1186)
    (9, lambda x: softplus(x), lambda x: softplus(x) * 10.0),
    (10, lambda x: np.sqrt(softplus(x) * 0.25),
     lambda x: np.sqrt(softplus(x) * 30.0)),
    (14, lambda x: softplus(x * 0.5) * 0.5,
     lambda x: softplus(x * 0.5) * np.sqrt(30.0)),
])
def test_shortterm_error_normalization(version, wl_fn, sc_fn):
    sv = np.array([[0.1, 0.2, 0.3, 0.4, 0.7, -0.9]], np.float32)
    mv, mmv = _norm(version, sv)
    _, _, _, _, st_wl, st_sc = _engine_consume(
        [m[0] for m in mv], [m[0] for m in mmv])
    np.testing.assert_allclose(st_wl, wl_fn(0.7), rtol=1e-4)
    np.testing.assert_allclose(st_sc, sc_fn(-0.9), rtol=1e-4)


def test_custom_multipliers_folded():
    pp = {"td_score_mult": 20.0, "scoremean_mult": 10.0,
          "scorestdev_mult": 5.0, "lead_mult": 40.0,
          "variance_time_mult": 40.0, "shortterm_value_error_mult": 1.0,
          "shortterm_score_error_mult": 30.0}
    sv = np.array([[0.5, 0.3, 0.25, 0.4, 0.7, -0.9]], np.float32)
    mv, mmv = _norm(14, sv, pp=pp)
    sm, stdev, lead, _, st_wl, _ = _engine_consume(
        [m[0] for m in mv], [m[0] for m in mmv])
    np.testing.assert_allclose(sm, 0.5 * 10.0, rtol=1e-5)
    np.testing.assert_allclose(stdev, softplus(0.3) * 5.0, rtol=1e-4)
    np.testing.assert_allclose(lead, 0.25 * 40.0, rtol=1e-5)
    np.testing.assert_allclose(st_wl, softplus(0.35) * 1.0, rtol=1e-4)


def test_old_net_search_weight_is_one(tmp_path):
    """Pre-v9 nets disable uncertainty weighting like the reference's
    supportsShorttermError() guard."""
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    path = str(tmp_path / "v5.txt.gz")
    _write_tiny_model(path, 5, np.random.default_rng(5))
    net = D.load_model(path)
    size = 5
    sp_arr = SearchParams(use_uncertainty=True).to_arr()
    raw = D.apply_desc_model(
        net, jnp.zeros((1, size, size, net.num_spatial_inputs)),
        jnp.zeros((1, net.num_global_inputs)))
    raw1 = jax.tree.map(lambda x: x[0],
                        {k: v for k, v in raw.items()
                         if k != "supports_shortterm_error"})
    raw1["supports_shortterm_error"] = raw["supports_shortterm_error"]
    legal = jnp.ones((size * size + 1,), bool)
    ev = mcts.nn_leaf_eval(raw1, legal, jnp.int32(1), sp_arr,
                           jnp.float32(0.0), jnp.float32(size),
                           jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(ev.weight), 1.0)
