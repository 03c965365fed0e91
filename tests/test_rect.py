"""Rectangular / shaped boards (reference board.h:14-16 x_size/y_size).

TPU-native form: an x*y board embeds in the max(x,y) square grid with
off-board cells holding WALL stones, which behave identically to the
edge padding everywhere in the engine (unplayable, zero liberties,
never captured, score nothing, no zobrist keys)."""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R


def rect_mask(xs, ys, size):
    m = np.zeros((size, size), bool)
    m[:ys, :xs] = True
    return jnp.asarray(m.reshape(-1))


def test_rect_legality_and_capture():
    """5x3 board on a 5-grid: WALL rows unplayable; captures against the
    interior wall behave like edge captures."""
    size = 5
    mask = rect_mask(5, 3, size)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=32, shape_mask=mask)
    legal = np.asarray(H.legal_moves(gs, size))
    # off-board rows illegal, on-board legal, pass legal
    assert not legal[3 * size:5 * size].any()
    assert legal[:3 * size].all()
    assert legal[size * size]
    # white stone at the rect's bottom edge (row 2), black surrounds:
    # (2,2) has neighbors (1,2), (3,2), (2,1), and WALL below
    moves = [(B.WHITE, 2 * size + 2), (B.BLACK, 2 * size + 1),
             (B.WHITE, 0), (B.BLACK, 2 * size + 3),
             (B.WHITE, 1), (B.BLACK, size + 2)]
    for pla, loc in moves:
        gs = H.replace_pos(gs, to_move=jnp.int32(pla))
        gs, _ = H.step(gs, jnp.int32(loc), size)
    stones = np.asarray(gs.pos.board.stones)
    assert stones[2 * size + 2] == B.EMPTY   # captured against the wall
    # WALL cells untouched
    assert (stones[3 * size:] == B.WALL).all()


def test_rect_features_and_area():
    size = 5
    mask = rect_mask(4, 3, size)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=16, shape_mask=mask)
    gs, _ = H.step(gs, jnp.int32(6), size)
    from katago_tpu.models import features as F
    legal = H.legal_moves(gs, size)
    sp, gl = F.fill_features_v7(gs, size, F.FeatureParams.default(), legal)
    sp = np.asarray(sp)
    # plane 0 is exactly the shape mask
    assert np.array_equal(sp[:, 0] > 0, np.asarray(mask))
    # off-board cells carry no stone/liberty/territory features
    off = ~np.asarray(mask)
    assert sp[off, 1:6].sum() == 0
    assert sp[off, 18:20].sum() == 0


def test_rect_scoring():
    """Black filling a 3x2 board entirely scores +area for black."""
    size = 3
    mask = rect_mask(3, 2, size)
    gs = H.new_game(size, H.RulesArr.from_rules(
        R.Rules.tromp_taylorish()), max_hist=32, shape_mask=mask)
    # black plays 4 stones leaving 2 empties that become territory
    for loc in [0, 1, 2, 3]:
        gs = H.replace_pos(gs, to_move=jnp.int32(B.BLACK))
        gs, _ = H.step(gs, jnp.int32(loc), size)
    own, score = H.final_score(gs, size)
    # white_minus_black: black owns all 6 points, komi 7.5 -> 7.5 - 6
    assert abs(float(score) - (gs.rules.komi - 6.0)) < 1e-4
    own = np.asarray(own)
    assert (own[:6] == B.BLACK).all()
    assert (own[6:] != B.BLACK).all() and (own[6:] != B.WHITE).all()


def test_rect_search_runs():
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    size = 5
    mask = rect_mask(5, 3, size)
    model = KataGoModel(MC.get_config("b1c6"), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=64, shape_mask=mask)
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape),
                         gs)
    sp = SearchParams().to_arr()
    res = mcts.run_search(model.apply, params, roots, sp,
                          jax.random.PRNGKey(1), size=size, num_sims=12,
                          max_nodes=16)
    cv = np.asarray(res.child_visits)
    assert (np.asarray(res.root_visits) == 13).all()
    # no visits on off-board moves
    off = ~np.asarray(rect_mask(5, 3, size))
    assert cv[:, :size * size][:, off].sum() == 0


def test_rect_gtp_vertices():
    from katago_tpu.cli.gtp import gtp_to_loc, loc_to_gtp
    size, xs, ys = 7, 7, 5
    # A1 is the rect's bottom-left = row ys-1 of the grid
    assert gtp_to_loc("A1", size, xs, ys) == (ys - 1) * size
    assert loc_to_gtp((ys - 1) * size, size, xs, ys) == "A1"
    assert gtp_to_loc("G5", size, xs, ys) == 6
    for bad in ("A6", "H1"):
        try:
            gtp_to_loc(bad, size, xs, ys)
            raise AssertionError(f"{bad} should be off board")
        except ValueError:
            pass


def test_rect_sgf_replay():
    from katago_tpu.cli.sgf_cmds import _replay
    from katago_tpu.dataio import sgf as S
    game = S.parse_sgf("(;GM[1]FF[4]SZ[5:3]KM[6.5];B[cb];W[db];B[cc])")[0]
    assert game.size == (5, 3)
    size, rules, states, moves = _replay(game)
    assert size == 5
    stones = np.asarray(states[-1].pos.board.stones)
    # 'cb' = x2,y1 -> grid loc 1*5+2; 'cc' = x2,y2 -> 2*5+2
    assert stones[1 * 5 + 2] == B.BLACK
    assert stones[1 * 5 + 3] == B.WHITE
    assert stones[2 * 5 + 2] == B.BLACK
    # off-board rows walled
    assert (stones[3 * 5:] == B.WALL).all()


def test_rect_analysis_request():
    import json

    from katago_tpu.cli.analysis import AnalysisEngine
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel

    size = 5
    model = KataGoModel(MC.get_config("b1c6"), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    eng = AnalysisEngine(None, default_visits=8)
    eng.model_apply = lambda p, s, g: model.apply(params, s, g)
    resp = eng.handle({"id": "r1", "boardXSize": 5, "boardYSize": 3,
                       "rules": "tromp-taylor",
                       "moves": [["B", "C2"]], "maxVisits": 8})[0]
    assert "error" not in resp, resp
    assert resp["moveInfos"]
    # no suggested move off the 5x3 rect; PVs are multi-move capable
    for mi in resp["moveInfos"]:
        v = mi["move"]
        if v != "pass":
            assert int(v[1:]) <= 3
        assert isinstance(mi["pv"], list) and len(mi["pv"]) >= 1
