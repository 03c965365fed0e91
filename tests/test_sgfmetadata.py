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


def test_search_with_human_sl_profile():
    """sgf_meta threads through the search evaluator: a metadata-encoder
    net conditions every eval on the profile row, and different profiles
    change the search's root values."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.models.sgfmetadata import get_profile
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    size = 5
    cfg = dataclasses.replace(MC.get_config("b1c6"),
                              metadata_encoder=True,
                              metadata_encoder_channels=8)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)),
                        metadata=jnp.zeros((1, 192)))

    def apply_fn(p, sp_, gl_, metadata=None):
        if metadata is None:
            metadata = jnp.zeros((sp_.shape[0], 192))
        return model.apply(params, sp_, gl_, metadata=metadata)

    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=32)
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                         gs)
    sp = SearchParams(root_noise_enabled=False).to_arr()

    def run_prof(profile):
        return mcts.run_search(
            apply_fn, None, roots, sp, jax.random.PRNGKey(2), size=size,
            num_sims=8, max_nodes=12,
            sgf_meta=get_profile(profile) if profile else None)

    r_none = run_prof(None)
    r_5d = run_prof("rank_5d")
    r_20k = run_prof("rank_20k")
    for r in (r_none, r_5d, r_20k):
        assert (np.asarray(r.root_visits) == 9).all()
    # conditioning changes the evaluation (random net: any difference)
    assert not np.allclose(np.asarray(r_5d.root_winloss),
                           np.asarray(r_20k.root_winloss))
