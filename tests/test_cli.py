"""GTP / analysis-protocol / SGF tests with a tiny random-init net.

Models the reference's tier-3 CLI tests (cpp/runcmdtests.sh driving gtp and
analysis binaries with scripted command files) at reduced scale.
"""

import io
import json

import numpy as np
import pytest

from katago_tpu.cli.analysis import AnalysisEngine
from katago_tpu.cli.gtp import GTPEngine, gtp_to_loc, loc_to_gtp, run_gtp
from katago_tpu.dataio import sgf as S


@pytest.fixture(scope="module")
def engine():
    return GTPEngine(model_path=None, size=7, visits=10)


def gtp_session(engine, commands: str) -> list[str]:
    out = io.StringIO()
    run_gtp(engine, infile=io.StringIO(commands), outfile=out)
    # split into responses ("= ..." / "? ..." blocks)
    blocks = out.getvalue().strip().split("\n\n")
    return blocks


def test_gtp_coordinates():
    assert loc_to_gtp(0, 19) == "A19"
    assert loc_to_gtp(19 * 19, 19) == "pass"
    assert gtp_to_loc("A19", 19) == 0
    assert gtp_to_loc("T1", 19) == 19 * 19 - 1
    assert gtp_to_loc("pass", 19) == 19 * 19
    # I column skipped
    assert gtp_to_loc("J1", 19) == 18 * 19 + 8


def test_gtp_basic_session(engine):
    blocks = gtp_session(engine, "\n".join([
        "protocol_version", "name", "clear_board", "play b D4",
        "play w C3", "showboard", "undo", "final_score", "quit"]))
    assert blocks[0] == "= 2"
    assert blocks[1] == "= katago_tpu"
    assert all(not b.startswith("?") for b in blocks)


def test_gtp_genmove_legal(engine):
    gtp_session(engine, "clear_board\n")
    blocks = gtp_session(engine, "genmove b\ngenmove w\nquit\n")
    mv1 = blocks[0].split()[1]
    loc = gtp_to_loc(mv1, engine.size)
    assert 0 <= loc <= engine.size * engine.size


def test_gtp_illegal_move_rejected(engine):
    gtp_session(engine, "clear_board\nplay b D4\n")
    blocks = gtp_session(engine, "play w D4\nquit\n")
    assert blocks[0].startswith("?")


def test_gtp_id_echo_and_unknown(engine):
    blocks = gtp_session(engine, "42 name\n7 bogus_command\nquit\n")
    assert blocks[0].startswith("=42")
    assert blocks[1].startswith("?7")


def test_gtp_rules_roundtrip(engine):
    blocks = gtp_session(engine, "\n".join([
        "kata-set-rules japanese", "kata-get-rules", "quit"]))
    rules = json.loads(blocks[1][2:])
    assert rules["scoring"] == "TERRITORY" and rules["ko"] == "SIMPLE"
    gtp_session(engine, "kata-set-rules tromp-taylor\n")


def test_analysis_protocol():
    eng = AnalysisEngine(None, default_visits=8)
    # no model -> analysis of moves must error cleanly, version must work
    resp = eng.handle({"id": "x", "action": "query_version"})[0]
    assert resp["version"]

    from katago_tpu.models import config as MC
    import jax
    import jax.numpy as jnp
    from katago_tpu.models.model import KataGoModel
    cfg = MC.get_config("b1c6")
    model = KataGoModel(cfg, pos_len=7, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 7, 22)),
                        jnp.zeros((1, 19)))
    eng.model_apply = lambda p, s, g: model.apply(params, s, g)

    out = eng.handle({"id": "q", "moves": [["B", "D4"]], "rules": "chinese",
                      "boardXSize": 7, "boardYSize": 7, "maxVisits": 8})
    assert len(out) == 1
    r = out[0]
    assert r["id"] == "q" and r["turnNumber"] == 1
    assert r["rootInfo"]["currentPlayer"] == "W"
    assert len(r["moveInfos"]) > 0
    assert 0.0 <= r["moveInfos"][0]["winrate"] <= 1.0
    assert sum(mi["visits"] for mi in r["moveInfos"]) <= r["rootInfo"]["visits"]

    err = eng.handle({"id": "bad", "moves": [["B", "Z9"]],
                      "boardXSize": 7, "boardYSize": 7})[0]
    assert "error" in err


def test_sgf_roundtrip():
    moves = [(1, 60), (2, 72), (1, 61), (2, 19 * 19)]  # incl. a pass
    text = S.write_sgf(moves, 19, 19, komi=6.5, result="B+R",
                       black_name="x", white_name="y")
    games = S.parse_sgf(text)
    assert len(games) == 1
    g = games[0]
    assert g.size == (19, 19)
    assert g.komi == 6.5
    assert g.result == "B+R"
    assert g.moves() == moves


def test_sgf_variations_and_escapes():
    text = r"(;FF[4]SZ[9]C[hi \] there];B[dd](;W[cc];B[ee])(;W[ff]))"
    g = S.parse_sgf(text)[0]
    assert g.root.get("C") == "hi ] there"
    # main line takes the first variation
    assert g.moves() == [(1, S.parse_sgf_loc("dd", 9, 9)),
                         (2, S.parse_sgf_loc("cc", 9, 9)),
                         (1, S.parse_sgf_loc("ee", 9, 9))]


def test_sgf_setup_stones_and_handicap():
    text = "(;FF[4]SZ[9]HA[2]AB[cc][gg];W[ee])"
    g = S.parse_sgf(text)[0]
    assert g.handicap == 2
    setup = g.setup_stones()
    assert (1, S.parse_sgf_loc("cc", 9, 9)) in setup
    assert g.moves() == [(2, S.parse_sgf_loc("ee", 9, 9))]


def test_sgf_multi_game():
    text = "(;FF[4]SZ[9];B[aa])(;FF[4]SZ[13];B[bb])"
    games = S.parse_sgf(text)
    assert len(games) == 2
    assert games[0].size == (9, 9) and games[1].size == (13, 13)


def test_analysis_avoid_allow_moves(tmp_path):
    """avoidMoves / allowMoves restrict the searched root moves
    (Analysis_Engine.md request fields)."""
    import jax
    import jax.numpy as jnp
    from katago_tpu.models import config as MC, export as E
    from katago_tpu.models.model import KataGoModel
    cfg = MC.get_config("b1c6")
    m = KataGoModel(cfg, pos_len=5, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 5, 22)),
                    jnp.zeros((1, 19)))
    path = str(tmp_path / "t.bin.gz")
    E.export_model(params, cfg, path)
    eng = AnalysisEngine(path, default_visits=10)
    out = eng.handle({"id": "a", "boardXSize": 5, "boardYSize": 5,
                      "moves": [], "maxVisits": 12,
                      "allowMoves": [{"player": "B",
                                      "moves": ["A1", "B1"],
                                      "untilDepth": 1}]})
    moves = {mi["move"] for mi in out[0]["moveInfos"]}
    assert moves <= {"A1", "B1"}
    out2 = eng.handle({"id": "b", "boardXSize": 5, "boardYSize": 5,
                       "moves": [], "maxVisits": 12,
                       "avoidMoves": [{"player": "B", "moves": ["C3"],
                                       "untilDepth": 1}]})
    assert "C3" not in {mi["move"] for mi in out2[0]["moveInfos"]}


def test_analysis_report_during_search(tmp_path):
    """reportDuringSearchEvery streams partial responses with
    isDuringSearch=true before the final one (Analysis_Engine.md)."""
    import jax
    import jax.numpy as jnp

    from katago_tpu.cli.analysis import AnalysisEngine
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel

    size = 5
    model = KataGoModel(MC.get_config("b1c6"), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    eng = AnalysisEngine(None, default_visits=16)
    eng.model_apply = lambda p, s, g: model.apply(params, s, g)
    partial = []
    out = eng.handle({"id": "s1", "boardXSize": 5, "boardYSize": 5,
                      "rules": "tromp-taylor", "moves": [],
                      "maxVisits": 24,
                      "reportDuringSearchEvery": 0.0},
                     emit=partial.append)
    assert len(out) == 1
    final = out[0]
    assert final.get("isDuringSearch") is False
    assert final["rootInfo"]["visits"] == 24
    # at least one partial report streamed, marked and well-formed
    assert partial
    assert all(p["isDuringSearch"] for p in partial)
    assert all("moveInfos" in p for p in partial)
    # partial visits never exceed the final count
    assert all(p["rootInfo"]["visits"] <= 24 for p in partial)
