"""Model family tests: shapes, init sanity, masking invariance, featurizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import config as MC
from katago_tpu.models import features as F
from katago_tpu.models.model import KataGoModel, postprocess_outputs


def make_inputs(bsz, size, key):
    k1, k2 = jax.random.split(key)
    spatial = jax.random.bernoulli(k1, 0.3, (bsz, size, size, 22)).astype(jnp.float32)
    glob = jax.random.normal(k2, (bsz, 19)) * 0.1
    return spatial, glob


@pytest.mark.parametrize("name", ["b1c6", "b6c96", "b5c192nbt"])
def test_forward_shapes(name):
    cfg = MC.get_config(name)
    size = 9
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    spatial, glob = make_inputs(2, size, key)
    params = model.init(key, spatial, glob)
    out = model.apply(params, spatial, glob)
    nn1 = size * size + 1
    assert out["policy_logits"].shape == (2, cfg.num_policy_outputs, nn1)
    assert out["value_logits"].shape == (2, 3)
    assert out["miscvalue"].shape == (2, 10)
    assert out["moremiscvalue"].shape == (2, 8)
    assert out["ownership_pretanh"].shape == (2, size, size)
    assert out["scorebelief_logprobs"].shape == (2, cfg.scorebelief_len(size))
    # all finite
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # scorebelief is a log-distribution
    np.testing.assert_allclose(
        np.exp(np.asarray(out["scorebelief_logprobs"])).sum(-1), 1.0, rtol=1e-4)


def test_fixup_init_residuals_start_at_zero():
    """With fixup, every residual branch's last conv is zero-init, so the
    trunk output before heads equals the stem output."""
    cfg = MC.get_config("b6c96")
    size = 9
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    key = jax.random.PRNGKey(1)
    spatial, glob = make_inputs(1, size, key)
    params = model.init(key, spatial, glob)
    # check zero-init convs exist: the second NormActConv of each ResBlock
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    zero_kernels = [np.asarray(v) for p, v in flat
                    if "Conv" in str(p) and np.asarray(v).ndim == 4
                    and not np.asarray(v).any()]
    assert len(zero_kernels) >= len(cfg.block_kind)


def test_policy_outputs_respond_to_input():
    cfg = MC.get_config("b1c6")
    size = 7
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    s1, g1 = make_inputs(1, size, key)
    params = model.init(key, s1, g1)
    s2 = s1.at[0, 3, 3, 1].set(1.0 - s1[0, 3, 3, 1])
    o1 = model.apply(params, s1, g1)
    o2 = model.apply(params, s2, g1)
    assert not np.allclose(np.asarray(o1["policy_logits"]),
                           np.asarray(o2["policy_logits"]))


def test_mask_zeroes_offboard_policy():
    """With a sub-board mask, off-board policy logits ~ -5000."""
    cfg = MC.get_config("b1c6")
    size = 9
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    spatial, glob = make_inputs(1, size, key)
    mask = np.zeros((1, size, size, 1), np.float32)
    mask[0, :7, :7, 0] = 1.0
    spatial = spatial * mask
    params = model.init(key, spatial, glob, jnp.asarray(mask))
    out = model.apply(params, spatial, glob, jnp.asarray(mask))
    pol = np.asarray(out["policy_logits"][0, 0, :size * size]).reshape(size, size)
    assert (pol[7:, :] < -1000).all() and (pol[:, 7:] < -1000).all()
    assert (pol[:7, :7] > -1000).all()


def test_featurizer_planes_and_globals():
    size = 7
    nn = size * size
    rules = R.Rules.tromp_taylorish()
    gs = H.new_game(size, H.RulesArr.from_rules(rules), 128)
    # play a few moves: B(3,3), W(3,2), B pass
    gs, _ = H.step(gs, jnp.int32(B.loc_of_xy(3, 3, size)), size)
    gs, _ = H.step(gs, jnp.int32(B.loc_of_xy(3, 2, size)), size)
    gs, _ = H.step(gs, jnp.int32(nn), size)
    sp, gl = F.fill_features_v7(gs, size, F.FeatureParams.default())
    sp, gl = np.asarray(sp), np.asarray(gl)
    assert sp.shape == (nn, 22) and gl.shape == (19,)
    # white to move now: plane 1 = white stones, plane 2 = black
    assert sp[B.loc_of_xy(3, 2, size), 1] == 1.0
    assert sp[B.loc_of_xy(3, 3, size), 2] == 1.0
    assert sp[:, 0].sum() == nn
    # history: prev move (B's pass) -> global 0; prev2 = W(3,2) on plane 10
    assert gl[0] == 1.0
    assert sp[B.loc_of_xy(3, 2, size), 10] == 1.0
    assert sp[B.loc_of_xy(3, 3, size), 11] == 1.0
    # komi from white's perspective: 7.5/20
    assert gl[5] == pytest.approx(7.5 / 20.0)
    # positional ko rule: globals 6,7 = 1, 0.5
    assert gl[6] == 1.0 and gl[7] == 0.5
    # suicide legal
    assert gl[8] == 1.0
    # area scoring -> gl9 == 0; pass would end phase (1 consec pass)
    assert gl[9] == 0.0 and gl[14] == 1.0


def test_featurizer_liberty_planes():
    size = 5
    diagram = """
        XO...
        .....
        .....
        .....
        .....
    """
    stones, _ = B.board_from_string(diagram)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 64)
    gs = H.replace_pos(gs, board=gs.board._replace(stones=jnp.asarray(stones)))
    sp, gl = F.fill_features_v7(gs, size, F.FeatureParams.default())
    sp = np.asarray(sp)
    # X at corner: 1 liberty (below); O: 2 liberties
    assert sp[0, 3] == 1.0 and sp[0, 4] == 0.0
    assert sp[1, 4] == 1.0 and sp[1, 3] == 0.0


def test_featurizer_ko_plane():
    size = 5
    diagram = """
        .XO..
        X.XO.
        .XO..
        .....
        .....
    """
    stones, _ = B.board_from_string(diagram)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 64)
    gs = H.replace_pos(gs, board=gs.board._replace(stones=jnp.asarray(stones)),
                       to_move=jnp.int32(B.WHITE))
    gs, _ = H.step(gs, jnp.int32(B.loc_of_xy(1, 1, size)), size)  # W takes ko
    sp, gl = F.fill_features_v7(gs, size, F.FeatureParams.default())
    sp = np.asarray(sp)
    assert sp[B.loc_of_xy(2, 1, size), 6] == 1.0  # banned retake marked
    assert sp[:, 6].sum() == 1.0


def test_featurizer_pass_alive_planes():
    size = 5
    diagram = """
        .X.X.
        XXXX.
        .....
        .....
        .....
    """
    stones, _ = B.board_from_string(diagram)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 64)
    gs = H.replace_pos(gs, board=gs.board._replace(stones=jnp.asarray(stones)))
    sp, _ = F.fill_features_v7(gs, size, F.FeatureParams.default())
    sp = np.asarray(sp)
    # black to move: plane 18 = own pass-alive area incl. the two eyes
    assert sp[0, 18] == 1.0 and sp[2, 18] == 1.0
    assert sp[B.loc_of_xy(0, 1, size), 18] == 1.0


def test_model_on_real_features_jit():
    size = 9
    cfg = MC.get_config("b1c6")
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 128)
    featurize = jax.jit(
        jax.vmap(F.fill_features_v7, in_axes=(0, None, None)),
        static_argnums=1)
    G = 4
    batch = jax.vmap(lambda _: gs)(jnp.arange(G))
    sp, gl = featurize(batch, size, F.FeatureParams.default())
    sp = sp.reshape(G, size, size, 22)
    params = model.init(jax.random.PRNGKey(0), sp, gl)
    out = jax.jit(model.apply)(params, sp, gl)
    post = postprocess_outputs(out)
    probs = np.exp(np.asarray(post["policy_log_probs"]))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    assert np.asarray(post["score_stdev"]).min() >= 0.0


def test_transformer_configs_forward():
    """v17 transformer blocks (attnrope + ffng/ffnsg) produce finite heads
    and respect the board mask (model_pytorch.py:2079, 2485)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel

    size = 7
    cfg = MC.get_config("b5c48h3tfr")
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    sp = jax.random.bernoulli(jax.random.PRNGKey(1), 0.3,
                              (2, size, size, 22)).astype(jnp.float32)
    gl = jnp.zeros((2, 19))
    params = model.init(jax.random.PRNGKey(0), sp, gl)
    out = model.apply(params, sp, gl)
    assert out["policy_logits"].shape == (2, 8, size * size + 1)
    for v in jax.tree.leaves(out):
        assert np.isfinite(np.asarray(v)).all()
    # grouped-query attention config also runs
    cfg2 = MC.get_config("b7c96h6kv3tfrs")
    assert cfg2.transformer_heads != cfg2.transformer_kv_heads


def test_nbttf_gab_blocks_forward():
    """Nested-bottleneck transformer hybrids with RoPE or GAB
    (NestedBottleneckTransformerBlock model_pytorch.py:1921,
    GABTemplateMLP :1423): finite heads; GAB params exist only in GAB
    configs; GAB bias responds to board state (the per-head template
    mixture is pooled from the position)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel

    size = 5
    base = MC.get_config("b5c384h6nbttfgabs")
    tiny = dataclasses.replace(
        base, name="tiny_gab", trunk_num_channels=32, mid_num_channels=16,
        gpool_num_channels=8, transformer_ffn_channels=32,
        transformer_heads=2, transformer_kv_heads=2, gab_num_templates=6,
        gab_num_fourier_features=4, gab_mlp_hidden=16, gab_d1=8, gab_d2=8,
        block_kind=("bottlenest2transformergabsg",) * 2,
        p1_num_channels=8, g1_num_channels=8, v1_num_channels=8,
        v2_size=16, sbv2_num_channels=16, num_scorebeliefs=2)
    tiny_rope = dataclasses.replace(
        tiny, name="tiny_rope",
        block_kind=("bottlenest2transformerropesg",) * 2)
    for cfg in (tiny, tiny_rope):
        model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 22)),
                            jnp.zeros((1, 19)))
        sp = np.zeros((2, size, size, 22), np.float32)
        sp[:, :, :, 0] = 1.0
        sp[1, 2, 2, 1] = 1.0   # a stone on board 1 only
        out = model.apply(params, jnp.asarray(sp), jnp.zeros((2, 19)))
        pl = np.asarray(out["policy_logits"])
        assert np.isfinite(pl).all()
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        has_gab = any("gab" in "/".join(str(k) for k in p)
                      for p, _ in flat)
        assert has_gab == ("gab" in cfg.block_kind[0])
        # the two boards differ -> outputs differ (positional info flows)
        assert not np.allclose(pl[0], pl[1])
    import numpy as np
    from katago_tpu.models.model import rope_cos_sin_2d
    cos, sin = rope_cos_sin_2d(8, 5, theta=100.0)
    # rotation preserves norm: cos^2 + sin^2 = 1 pointwise
    np.testing.assert_allclose(cos ** 2 + sin ** 2, 1.0, atol=1e-6)
    assert cos.shape == (25, 8)


def test_input_feature_versions():
    """V3-V7 featurizer rows: shapes, shared planes, and the version
    deltas (fillRowV3/V4/V5/V6, modelversion.cpp)."""
    import jax.numpy as jnp

    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.models import features as F
    from katago_tpu.models import modelversion as MV

    assert MV.get_inputs_version(8) == 7
    assert MV.get_inputs_version(17) == 7
    assert MV.get_inputs_version(7) == 6
    assert MV.get_inputs_version(6) == 5
    assert MV.get_inputs_version(5) == 4
    assert MV.get_inputs_version(3) == 3
    assert MV.get_num_spatial_features(6) == 13
    assert MV.get_num_global_features(7) == 16

    size = 5
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=16)
    gs, _ = H.step(gs, jnp.int32(12), size)
    gs, _ = H.step(gs, jnp.int32(7), size)
    legal = H.legal_moves(gs, size)
    rows = {}
    for v in (3, 4, 5, 6, 7):
        sp, gl = F.fill_features(gs, size, F.FeatureParams.default(),
                                 legal, version=v)
        assert sp.shape == (size * size, F.NUM_SPATIAL_BY_VERSION[v])
        assert gl.shape == (F.NUM_GLOBAL_BY_VERSION[v],)
        rows[v] = (np.asarray(sp), np.asarray(gl))

    sp7, gl7 = rows[7]
    # board planes 0-5 identical across all versions
    for v in (3, 4, 5, 6):
        assert np.array_equal(rows[v][0][:, :6], sp7[:, :6])
    # V6 spatial == V7 spatial (semantics unchanged, globals differ)
    assert np.array_equal(rows[6][0], sp7)
    assert rows[6][1].shape == (16,)
    # V6 globals: wave at 15 equals V7's wave at 18, passEnds at 14
    assert rows[6][1][15] == gl7[18] and rows[6][1][14] == gl7[14]
    # V5: history planes relocated to 6-10
    assert np.array_equal(rows[5][0][:, 6:11], sp7[:, 9:14])
    # V3/V4 komi scaled /15 instead of /20
    assert np.isclose(rows[3][1][5], gl7[5] * 20.0 / 15.0)
    # V4 territory (pass-alive only) differs from V3 under area scoring
    # on a nearly-empty board both are all-zero; shapes already checked
    assert rows[3][1][13] == gl7[18]  # V3 wave at 13


def test_intermediate_heads():
    """Auxiliary mid-trunk heads (model_pytorch.py:3073,3510-3521) and the
    main+intermediate loss combination (metrics_pytorch.py:443-484)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.train.losses import compute_losses

    size = 5
    base = MC.get_config("b2c16")
    cfg = dataclasses.replace(base, has_intermediate_head=True,
                              intermediate_head_blocks=1)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    sp = jnp.zeros((2, size, size, 22))
    gl = jnp.zeros((2, 19))
    params = model.init(jax.random.PRNGKey(0), sp, gl)
    raw = model.apply(params, sp, gl)
    assert "intermediate_policy_logits" in raw
    assert "intermediate_value_logits" in raw
    assert raw["intermediate_policy_logits"].shape == \
        raw["policy_logits"].shape
    # intermediate heads have their own parameters
    assert any("intermediate" in k for k in params["params"])

    # loss combination: fabricate a minimal batch
    nn = size * size
    sb = cfg.scorebelief_len(size)
    batch = {
        "binaryInputNCHW": np.ones((2, 22, size, size), np.float32),
        "globalTargetsNC": np.zeros((2, 80), np.float32),
        "policyTargetsNCMove": np.ones((2, 2, nn + 1), np.float32),
        "scoreDistrN": np.ones((2, sb), np.float32),
        "valueTargetsNCHW": np.zeros((2, 5, size, size), np.float32),
        "qValueTargetsNCMove": np.zeros((2, 3, nn + 1), np.float32),
    }
    batch["globalTargetsNC"][:, 25] = 1.0   # global weight
    batch["globalTargetsNC"][:, 26] = 1.0   # policy weight
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    total, metrics, _ = compute_losses(raw, batch,
                                       intermediate_loss_scale=0.5)
    assert "intermediate_loss" in metrics
    assert np.isfinite(float(total))
    # scale moves the total
    total0, _, _ = compute_losses(raw, batch, intermediate_loss_scale=0.0)
    assert float(total) != float(total0)
