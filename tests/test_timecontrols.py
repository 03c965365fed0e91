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
