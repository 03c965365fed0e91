"""Time controls tests (reference cpp/search/timecontrols.cpp)."""

from katago_tpu.search import timecontrols as TC


def test_absolute_time_divides_over_game():
    tc = TC.TimeControls.absolute_time(600.0)
    mn, rec, mx = tc.get_time(board_area=361, num_stones_on_board=0,
                              lag_buffer=1.0)
    # early game on 19x19: ~ (0.95*361+20)/2 ~ 181 turns -> ~3.3s/move
    assert 1.0 < rec < 10.0
    assert mx >= rec >= mn
    # later in the game with little time left, recommendation shrinks
    tc.main_time_left = 30.0
    _, rec2, mx2 = tc.get_time(361, 250, 1.0)
    assert rec2 < rec
    assert mx2 <= 30.0


def test_fischer_increment_floor():
    tc = TC.TimeControls.fischer_time(60.0, 5.0)
    _, rec, mx = tc.get_time(361, 100, 0.5)
    # with a 5s increment we should spend at least the increment
    assert rec >= 5.0
    assert mx <= 60.0
    # out of main time: live on the increment
    tc.main_time_left = 2.0
    _, rec2, mx2 = tc.get_time(361, 100, 0.5)
    assert rec2 <= 2.0 and mx2 <= 2.0


def test_byo_yomi_overtime_per_stone():
    tc = TC.TimeControls.canadian_or_byo_yomi_time(
        0.0, 30.0, 1, 10)  # canadian: 30s / 10 stones, no main time
    tc.update_from_gtp_time_left(30.0, 10)
    mn, rec, mx = tc.get_time(361, 100, 0.5)
    assert abs(rec - 3.0) < 1.5         # ~3s per stone
    assert mx >= rec
    # last stone of the period: must use the full remaining period time
    tc.update_from_gtp_time_left(4.0, 1)
    mn3, rec3, mx3 = tc.get_time(361, 100, 0.5)
    assert mn3 > 0.0


def test_unlimited_detection():
    tc = TC.TimeControls()
    assert tc.is_effectively_unlimited()
    tc2 = TC.TimeControls.absolute_time(300.0)
    assert not tc2.is_effectively_unlimited()


def test_visit_budget_geometric():
    assert TC.visits_for_time_budget(10.0, 100.0, 8, 8192) == 512
    assert TC.visits_for_time_budget(0.001, 100.0, 8, 8192) == 8
    assert TC.visits_for_time_budget(1e30, 100.0, 8, 8192) == 8192
    v1 = TC.visits_for_time_budget(3.0, 50.0)
    v2 = TC.visits_for_time_budget(3.2, 50.0)
    assert v1 == v2  # grid stability: small changes don't recompile


def test_recompute_search_time_limit():
    """Search::recomputeSearchTimeLimit scaling (searchtimehelpers.cpp)."""
    from katago_tpu.search.params import SearchParams
    from katago_tpu.search.timecontrols import (
        num_visits_needed_to_be_non_futile, recompute_search_time_limit)

    base = SearchParams(midgame_time_factor=2.0,
                        overallocate_time_factor=1.1)
    # opening: weight ramps from 0 -> rec barely scaled
    t_open = recompute_search_time_limit(base, 10.0, 100.0, turn_number=0,
                                         board_area=361)
    # at the peak turn: full midgame factor
    t_mid = recompute_search_time_limit(base, 10.0, 100.0,
                                        turn_number=130, board_area=361)
    # deep endgame: decays back toward 1x
    t_end = recompute_search_time_limit(base, 10.0, 100.0,
                                        turn_number=600, board_area=361)
    assert abs(t_open - 11.0) < 1e-6          # overallocate only
    assert abs(t_mid - 22.0) < 1e-6           # x2 at the peak
    assert t_open < t_end < t_mid
    # obvious-move discount engages on low entropy + low surprise
    ob = SearchParams(obvious_moves_time_factor=0.25)
    t_obvious = recompute_search_time_limit(
        ob, 10.0, 100.0, turn_number=50, board_area=361,
        policy_entropy=0.01, policy_surprise=0.01)
    t_unclear = recompute_search_time_limit(
        ob, 10.0, 100.0, turn_number=50, board_area=361,
        policy_entropy=3.0, policy_surprise=1.0)
    assert t_obvious < 0.5 * t_unclear
    # max cap applies
    assert recompute_search_time_limit(base, 10.0, 15.0, turn_number=130,
                                       board_area=361) == 15.0

    sp = SearchParams(futile_visits_threshold=0.3,
                      chosen_move_temperature=0.0,
                      chosen_move_temperature_early=0.0)
    assert num_visits_needed_to_be_non_futile(sp, 1000.0, 10, 361) == 300.0
    # high temperature lowers the requirement (1:100 odds bound)
    sp_t = SearchParams(futile_visits_threshold=0.9,
                        chosen_move_temperature=0.5,
                        chosen_move_temperature_early=0.5)
    req = num_visits_needed_to_be_non_futile(sp_t, 1000.0, 10, 361)
    assert req < 900.0


def test_driver_dynamic_time_smoke():
    """Driver accepts time_rec/host_params and completes a search."""
    import jax
    import jax.numpy as jnp

    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.search.driver import SearchDriver
    from katago_tpu.search.params import SearchParams

    size = 5
    model = KataGoModel(MC.get_config("b1c6"), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    sp = SearchParams(futile_visits_threshold=0.2,
                      midgame_time_factor=1.5,
                      obvious_moves_time_factor=0.5)
    driver = SearchDriver(model.apply, params, sp.to_arr(), size=size,
                          max_nodes=20, chunk_size=4)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=32)
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape), gs)
    # generous budget: chunk COMPILE time counts against the clock, so a
    # small time_rec can legitimately stop after one chunk on a loaded box
    res = driver.search(roots, jax.random.PRNGKey(1), max_visits=16,
                        time_rec=600.0, time_max=1200.0, turn_number=5,
                        host_params=sp)
    assert int(res.root_visits[0]) == 16
