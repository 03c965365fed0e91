"""Reference-format model loading: parse + forward with real released nets.

Uses the small real net shipped in the reference's test suite
(/root/reference/cpp/tests/models/, the same file its golden tests use) as a
fixture: a correctly-loaded trained net fed by our V7 featurizer must show
basic Go knowledge, which cross-validates the featurizer plane order, BN
merge, gpool structure, and head wiring end to end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import desc as D
from katago_tpu.models import features as F

MODEL = "/root/reference/cpp/tests/models/g170-b6c96-s175395328-d26788732.bin.gz"

pytestmark = pytest.mark.skipif(not os.path.exists(MODEL),
                                reason="reference test model not mounted")


@pytest.fixture(scope="module")
def net():
    return D.load_model(MODEL)


def featurize(gs, size):
    sp, gl = F.fill_features_v7(gs, size, F.FeatureParams.default())
    return (jnp.asarray(sp).reshape(1, size, size, 22),
            jnp.asarray(gl).reshape(1, 19))


def test_parse_header(net):
    assert net.version == 8
    assert net.num_spatial_inputs == 22 and net.num_global_inputs == 19
    assert net.trunk["num_blocks"] == 6
    assert net.trunk["trunk_ch"] == 96
    assert len(net.sha256) == 64


def test_opening_policy_knowledge(net):
    size = 19
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 64)
    sp, gl = featurize(gs, size)
    out = D.apply_desc_model(net, sp, gl)
    pol = np.asarray(jax.nn.softmax(out["policy_logits"][0, 0]))
    board_pol = pol[:361].reshape(size, size)
    # classic opening points must dominate; 1-1 points must be negligible
    good = [(3, 3), (15, 3), (3, 15), (15, 15), (2, 3), (3, 2), (16, 15),
            (15, 16)]
    good_mass = sum(board_pol[y, x] for x, y in good)
    assert good_mass > 0.3
    assert board_pol[0, 0] < 1e-3 and board_pol[18, 18] < 1e-3
    # value: near-even game, black slightly behind at komi 7.5
    val = np.asarray(jax.nn.softmax(out["value_logits"][0]))
    assert 0.3 < val[0] < 0.6
    assert val[2] < 0.01  # no-result negligible


def test_atari_awareness(net):
    """A stone in atari: the net's policy should strongly consider the
    capture/escape point."""
    size = 9
    diagram = """
        .........
        .........
        ...X.....
        ..XOX....
        .........
        .........
        .........
        .........
        .........
    """
    stones, _ = B.board_from_string(diagram)
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 64)
    gs = H.replace_pos(gs, board=gs.board._replace(stones=jnp.asarray(stones)),
                       to_move=jnp.int32(B.BLACK))
    sp, gl = featurize(gs, size)
    out = D.apply_desc_model(net, sp, gl)
    pol = np.asarray(jax.nn.softmax(out["policy_logits"][0, 0]))
    capture_pt = B.loc_of_xy(3, 4, size)  # the white stone's last liberty
    # capture should be a prominent candidate (many big opening points also
    # compete on a mostly-empty board): well above uniform, top-10 overall
    assert pol[capture_pt] > 2.0 / 81.0
    assert capture_pt in np.argsort(pol[:81])[::-1][:10]


def test_search_with_real_net_prefers_center_9x9(net):
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    size = 9
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()), 64)
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(), gs)
    sp = SearchParams().to_arr()
    res = mcts.run_search(D.make_desc_apply(net), None, roots, sp,
                          jax.random.PRNGKey(0), size=size, num_sims=50,
                          max_nodes=53)
    cv = np.asarray(res.child_visits[0])
    best = int(cv.argmax())
    bx, by = best % size, best // size
    # best move within 1 of center (tengen-area opening on 9x9)
    assert abs(bx - 4) <= 1 and abs(by - 4) <= 1, (bx, by)
