"""GameInitializer selfplay diversity (selfplay/gameinit.py vs the
reference's cpp/program/play.{h,cpp}): per-game rules/komi/handicap
sampling, fixed handicap placement, komi compensation, fork openings,
resignation, and mixed-rules lockstep batches."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.selfplay import gameinit as GI


def test_sample_specs_distribution():
    p = GI.GameInitParams(
        allowed_sizes=(7, 9), size_rel_probs=(1.0, 3.0),
        komi_mean=7.0, komi_stdev=1.0, handicap_prob=0.5)
    rng = np.random.default_rng(0)
    specs = GI.sample_game_specs(p, 400, rng)
    sizes = np.asarray([s.size for s in specs])
    assert 0.6 < (sizes == 9).mean() < 0.9       # 3:1 odds
    komis = np.asarray([s.komi for s in specs])
    assert np.all(komis * 2 == np.round(komis * 2))  # half-integer grid
    assert komis.std() > 0.5
    nh = np.asarray([s.num_handicap for s in specs])
    assert 0.3 < (nh > 0).mean() < 0.7
    assert np.all((nh == 0) | (nh >= 2))
    # button only with area scoring
    for s in specs:
        if s.button:
            assert s.scoring_rule == R.SCORING_AREA


def test_from_config():
    p = GI.GameInitParams.from_config({
        "bSizes": "9,13", "bSizeRelProbs": "1,2",
        "koRules": "SIMPLE,SITUATIONAL", "scoringRules": "AREA",
        "taxRules": "NONE,SEKI", "komiStdev": "2.0",
        "handicapProb": "0.1"})
    assert p.allowed_sizes == (9, 13)
    assert p.allowed_ko_rules == (R.KO_SIMPLE, R.KO_SITUATIONAL)
    assert p.allowed_scoring_rules == (R.SCORING_AREA,)
    assert p.komi_stdev == 2.0


def test_specs_to_rules_arrays_mixed_batch():
    p = GI.GameInitParams(allowed_sizes=(7,), komi_stdev=2.0)
    rng = np.random.default_rng(1)
    specs = GI.sample_game_specs(p, 8, rng)
    rules, nh, comp, fork, starts = GI.specs_to_rules_arrays(specs)
    assert rules.ko_rule.shape == (8,)
    assert rules.komi.shape == (8,)


def test_fixed_handicap_locs():
    locs = GI.fixed_handicap_locs(9, 4)
    assert len(locs) == 4 and len(set(locs)) == 4
    locs5 = GI.fixed_handicap_locs(9, 5)
    assert 4 * 9 + 4 in locs5  # center for odd handicap
    locs19 = GI.fixed_handicap_locs(19, 9)
    assert all(l // 19 in (3, 9, 15) and l % 19 in (3, 9, 15)
               for l in locs19)


def test_play_games_with_gameinit_diversity():
    """Mixed rules + handicap + fork + resignation run end-to-end in one
    lockstep batch; handicap boards start with black stones and white to
    move; superko hashing stays consistent (games step fine)."""
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.selfplay import loop as SL

    size = 7
    p = GI.GameInitParams(
        allowed_sizes=(size,),
        allowed_ko_rules=(R.KO_SIMPLE, R.KO_POSITIONAL),
        allowed_scoring_rules=(R.SCORING_AREA, R.SCORING_TERRITORY),
        allowed_tax_rules=(R.TAX_NONE, R.TAX_SEKI),
        komi_mean=7.0, komi_stdev=2.0, handicap_prob=0.5,
        handicap_compensate_komi_prob=1.0, early_fork_game_prob=0.5)
    rng = np.random.default_rng(3)
    specs = GI.sample_game_specs(p, 6, rng)
    # force at least one handicap and one fork
    specs[0].num_handicap = 2
    specs[0].compensate_komi = True
    specs[1].early_fork = True
    grules, nh, comp, fork, starts = GI.specs_to_rules_arrays(specs)

    cfg = MC.get_config("b1c6")
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    data, stats = SL.play_games(
        model.apply, params, size=size, num_games=6, visits=6,
        max_moves=14, rng=jax.random.PRNGKey(4),
        game_rules=grules, num_handicap=nh, compensate_komi=comp,
        early_fork=fork, resign_threshold=-0.95)
    assert stats["moves_per_game"].shape == (6,)
    # handicap game: komi was compensated (lead-adjusted, on the grid)
    k0 = float(stats["komi_white"][0])
    assert k0 * 2 == round(k0 * 2)
    # rows exist and are finite
    assert data.spatial.shape[0] > 0
    assert np.isfinite(data.value_target).all()


def test_handicap_placement_state_consistency():
    """_place_handicap rebuilds hashes so superko legality still works."""
    from katago_tpu.selfplay.loop import _place_handicap
    size = 9
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=16)
    games = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape).copy(),
                         gs)
    games = _place_handicap(games, np.asarray([3, 0]), size)
    st = np.asarray(games.board.stones)
    assert (st[0] == B.BLACK).sum() == 3
    assert (st[1] != B.EMPTY).sum() == 0
    assert int(games.pos.to_move[0]) == B.WHITE
    assert int(games.pos.to_move[1]) == B.BLACK
    # hash consistency: replaying the same stones onto an empty board
    # must give the same pos_hash
    ref = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                     max_hist=16)
    b = ref.board
    from katago_tpu.selfplay.gameinit import fixed_handicap_locs
    for l in fixed_handicap_locs(size, 3):
        b, _ = B.play_move(b, jnp.int32(l), jnp.int32(B.BLACK), size)
    np.testing.assert_array_equal(np.asarray(b.pos_hash),
                                  np.asarray(games.board.pos_hash[0]))
    # and the games still step legally
    legal = H.legal_moves(jax.tree.map(lambda x: x[0], games), size)
    assert not bool(legal[fixed_handicap_locs(size, 3)[0]])


def test_no_handicap_below_size7():
    # sampling must never request handicap stones a small board can't place
    import numpy as np
    from katago_tpu.selfplay import gameinit as GI
    p = GI.GameInitParams(allowed_sizes=(5,), size_rel_probs=(1.0,),
                          handicap_prob=1.0)
    rng = np.random.default_rng(0)
    specs = GI.sample_game_specs(p, 50, rng)
    assert all(s.num_handicap == 0 for s in specs)
