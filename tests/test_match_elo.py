"""Tests for multi-player Elo (utils/elo.py, reference cpp/core/elo.{h,cpp})
and the round-robin tournament driver (cli/match_cmd.py, reference
MatchPairer play.h:214-264)."""

import numpy as np
import pytest

from katago_tpu.utils import elo as E


def test_compute_elos_two_player_dominance():
    # A beats B 90-10: A's Elo should be clearly above B's
    # wm[x][y] = (x's wins, y's wins) in games x played first
    wm = np.zeros((2, 2, 2))
    wm[0, 1] = (45, 5)    # A first: A wins 45, B wins 5
    wm[1, 0] = (5, 45)    # B first: B wins 5, A wins 45
    elos = E.compute_elos(wm)
    assert elos[0] > elos[1]
    diff = elos[0] - elos[1]
    # raw MLE on 90/10 is ~381 Elo; the prior (2 virtual W/L vs Elo 0)
    # pulls both toward 0 and shrinks the gap
    assert 150 < diff < 400


def test_compute_elos_symmetric_is_zero():
    wm = np.zeros((3, 3, 2))
    for a in range(3):
        for b in range(3):
            if a != b:
                wm[a, b] = (10, 10)  # even record in every seating
    elos = E.compute_elos(wm)
    assert max(abs(e) for e in elos) < 1.0


def test_compute_elos_transitive_ordering():
    # A > B > C by record; Elos must order the same way
    wm = np.zeros((3, 3, 2))
    wm[0, 1] = (8, 2); wm[1, 0] = (2, 8)
    wm[1, 2] = (8, 2); wm[2, 1] = (2, 8)
    wm[0, 2] = (9, 1); wm[2, 0] = (1, 9)
    elos = E.compute_elos(wm)
    assert elos[0] > elos[1] > elos[2]


def test_elo_stdevs_shrink_with_games():
    def stdev_for(n):
        wm = np.zeros((2, 2, 2))
        wm[0, 1] = (n / 4, n / 4)
        wm[1, 0] = (n / 4, n / 4)
        elos = E.compute_elos(wm)
        return E.compute_approx_elo_stdevs(elos, wm)[0]
    assert stdev_for(200) < stdev_for(20) < stdev_for(2)


def test_round_robin_tournament_smoke():
    """3 stub bots of different strength: the strongest (value-greedy
    deterministic policy toward the center) should not rank below the
    uniform-random one; result dict has the full shape."""
    import jax
    import jax.numpy as jnp

    from katago_tpu.cli.match_cmd import play_round_robin

    size = 5
    nn = size * size

    def make_bot(center_logit):
        def apply(params, spatial, glob):
            b = spatial.shape[0]
            pol = jnp.zeros((b, nn + 1))
            pol = pol.at[:, nn // 2].set(center_logit)
            return {
                "policy_logits": jnp.broadcast_to(pol[:, None, :],
                                                  (b, 6, nn + 1)),
                "value_logits": jnp.zeros((b, 3)),
                "miscvalue": jnp.zeros((b, 10)),
                "moremiscvalue": jnp.zeros((b, 8)),
            }
        return apply

    bots = [("uniform", make_bot(0.0), None),
            ("center", make_bot(3.0), None),
            ("center2", make_bot(3.0), None)]
    out = play_round_robin(bots, size=size, games_per_pair=4, visits=8,
                           seed=3, log=lambda s: None)
    assert set(out["elos"]) == {"uniform", "center", "center2"}
    assert len(out["pair_records"]) == 3
    assert all(s >= 0 for s in out["elo_stdevs"].values())
