"""HumanSL metadata tests (cpp/neuralnet/sgfmetadata.{h,cpp})."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.models import sgfmetadata as SM


def test_profiles_parse():
    p = SM.get_profile("rank_5d")
    assert p.initialized and p.inverse_b_rank == 5 and p.inverse_w_rank == 5
    p2 = SM.get_profile("preaz_9d")
    assert p2.inverse_b_rank == 1 and p2.game_date.year == 2016
    p3 = SM.get_profile("rank_3d_2k")
    assert p3.inverse_b_rank == 7 and p3.inverse_w_rank == 11
    p4 = SM.get_profile("proyear_1990")
    assert p4.source == SM.SOURCE_GOGOD
    assert not SM.get_profile("").initialized
    with pytest.raises(ValueError):
        SM.get_profile("rank_42x")


def test_fill_row_structure():
    p = SM.get_profile("rank_1d")
    row = SM.fill_metadata_row(p, next_player_is_white=False, board_area=361)
    assert row.shape == (192,)
    assert row[0] == 1.0 and row[1] == 1.0            # both human
    # 1d -> inverse rank 9: thermometer of 9 ones per player
    assert row[6:6 + 9].sum() == 9 and row[6 + 9] == 0.0
    assert row[40:40 + 9].sum() == 9
    assert row[74] == 0.5                              # ratedness unknown
    assert row[75:82].sum() == 1.0                     # one tc flag
    assert row[86] == 0.0                              # area masked at 361
    # date features are unit-circle pairs
    pairs = row[87:151].reshape(32, 2)
    np.testing.assert_allclose((pairs ** 2).sum(-1), 1.0, atol=1e-5)
    assert row[151 + SM.SOURCE_KGS] == 1.0


def test_perspective_flip():
    p = SM.get_profile("rank_3d_2k")
    rb = SM.fill_metadata_row(p, next_player_is_white=False, board_area=81)
    rw = SM.fill_metadata_row(p, next_player_is_white=True, board_area=81)
    # black mover sees own rank 3d (7 ones); white mover sees own 2k (11)
    assert rb[6:40].sum() == 7 and rb[40:74].sum() == 11
    assert rw[6:40].sum() == 11 and rw[40:74].sum() == 7


def test_metadata_encoder_conditions_model():
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    cfg = dataclasses.replace(MC.get_config("b1c6"), metadata_encoder=True,
                              metadata_encoder_channels=16)
    m = KataGoModel(cfg, pos_len=5, dtype=jnp.float32)
    sp = jnp.zeros((1, 5, 5, 22))
    gl = jnp.zeros((1, 19))
    meta1 = jnp.asarray(SM.fill_metadata_row(
        SM.get_profile("rank_9d"), False, 25))[None, :]
    meta2 = jnp.asarray(SM.fill_metadata_row(
        SM.get_profile("rank_20k"), False, 25))[None, :]
    params = m.init(jax.random.PRNGKey(0), sp, gl, metadata=meta1)
    o1 = m.apply(params, sp, gl, metadata=meta1)
    o2 = m.apply(params, sp, gl, metadata=meta2)
    # different metadata conditions the policy
    diff = np.abs(np.asarray(o1["policy_logits"]) -
                  np.asarray(o2["policy_logits"])).max()
    assert diff > 1e-6
