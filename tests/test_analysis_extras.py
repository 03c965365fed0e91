"""Round-5 analysis-engine surface tests: moveInfo extras, per-move
ownership, overrideSettings mapping, priority/terminate scheduling, the
cross-search tree cache, and the SGF data-mining commands.

Reference surface: cpp/command/analysis.cpp + docs/Analysis_Engine.md;
cpp/command/startposes.cpp (samplesgfs/dataminesgfs/viewstartposes/
checksgfhintpolicy)."""

import contextlib
import glob
import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.cli.analysis import AnalysisEngine, run_protocol
from katago_tpu.models import config as MC
from katago_tpu.models.model import KataGoModel

SIZE = 5


@pytest.fixture(scope="module")
def engine():
    model = KataGoModel(MC.get_config("b1c6"), pos_len=SIZE,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, SIZE, SIZE, 22)),
                        jnp.zeros((1, 19)))
    eng = AnalysisEngine(None, default_visits=10)
    eng.model_apply = lambda p, s, g: model.apply(params, s, g)
    return eng


def _base_query(**kw):
    q = {"id": "q", "moves": [["B", "C3"]], "rules": "chinese",
         "boardXSize": SIZE, "boardYSize": SIZE, "maxVisits": 12}
    q.update(kw)
    return q


def test_move_info_extra_fields(engine):
    """lcb / utilityLcb / scoreStdev / weight / edgeVisits / edgeWeight
    (searchresults.cpp getJson moveInfo fields)."""
    out = engine.handle(_base_query(includePVVisits=True))
    final = [r for r in out if "moveInfos" in r][-1]
    mi = final["moveInfos"][0]
    for field in ("lcb", "utilityLcb", "scoreStdev", "weight",
                  "edgeVisits", "edgeWeight", "scoreSelfplay"):
        assert field in mi, field
    # lcb is below the winrate by a nonnegative radius (mover persp)
    assert mi["lcb"] <= mi["winrate"] + 1e-6
    assert mi["scoreStdev"] >= 0.0
    assert len(mi["pvVisits"]) == len(mi["pv"])
    root = final["rootInfo"]
    assert len(root["thisHash"]) == 16 and len(root["symHash"]) == 16
    assert root["weight"] > 0


def test_moves_ownership(engine):
    out = engine.handle(_base_query(includeMovesOwnership=True,
                                    includeMovesOwnershipStdev=True,
                                    includeOwnership=True))
    final = [r for r in out if "moveInfos" in r][-1]
    assert len(final["ownership"]) == SIZE * SIZE
    top = final["moveInfos"][0]
    assert len(top["ownership"]) == SIZE * SIZE
    assert all(-1.0 <= v <= 1.0 for v in top["ownership"])
    assert len(top["ownershipStdev"]) == SIZE * SIZE
    assert all(v >= 0.0 for v in top["ownershipStdev"])


def test_override_settings_mapping(engine):
    """Arbitrary SearchParams keys are accepted; unknown keys warn
    (tests/analysis/badoverride.txt behavior)."""
    out = engine.handle(_base_query(overrideSettings={
        "rootPolicyTemperature": 1.4, "maxVisits": 14,
        "playoutDoublingAdvantage": 0.5, "notAKey": 3}))
    warn = [r for r in out if r.get("field") == "overrideSettings"]
    assert warn and "notAKey" in warn[0]["warning"]
    final = [r for r in out if "moveInfos" in r][-1]
    assert final["rootInfo"]["visits"] == 14


def test_priority_and_terminate(engine):
    reqs = [
        {"id": "low", "boardXSize": SIZE, "boardYSize": SIZE,
         "rules": "chinese", "moves": [], "maxVisits": 6, "priority": 0},
        {"id": "high", "boardXSize": SIZE, "boardYSize": SIZE,
         "rules": "chinese", "moves": [], "maxVisits": 6, "priority": 9},
        {"id": "kill", "boardXSize": SIZE, "boardYSize": SIZE,
         "rules": "chinese", "moves": [], "maxVisits": 6},
        {"id": "t", "action": "terminate", "terminateId": "kill"},
    ]
    inp = io.StringIO("".join(json.dumps(r) + "\n" for r in reqs))
    outbuf = io.StringIO()
    run_protocol(engine, inp, outbuf)
    lines = [json.loads(l) for l in outbuf.getvalue().splitlines()]
    killed = [l for l in lines if l.get("noResults")]
    assert killed and killed[0]["id"] == "kill"
    order = [l["id"] for l in lines if "turnNumber" in l
             and "moveInfos" in l]
    assert order.index("high") < order.index("low")


def test_tree_cache_hit(engine):
    engine._tree_cache.clear()
    engine._tree_cache_hits = 0
    q = _base_query(maxVisits=16, moves=[["B", "B2"]])
    out1 = engine.handle(q)
    out2 = engine.handle(dict(q, id="q2"))
    assert engine._tree_cache_hits == 1
    f1 = [r for r in out1 if "moveInfos" in r][-1]
    f2 = [r for r in out2 if "moveInfos" in r][-1]
    assert f2["rootInfo"]["visits"] == 16
    assert (max(f1["moveInfos"], key=lambda m: m["visits"])["move"]
            == max(f2["moveInfos"], key=lambda m: m["visits"])["move"])


SGFS = [
    "(;FF[4]SZ[9]KM[7];B[ee];W[cc];B[gc];W[cf];B[gf];W[dd];B[fe];W[cg]"
    ";B[gg];W[ce];B[dg];W[ch];B[dh];W[bg];B[eg])",
    "(;FF[4]SZ[9]KM[7];B[dd];W[ff];B[fd];W[df];B[cf];W[cg];B[ce];W[dg]"
    ";B[gf];W[gg];B[fg];W[ge];B[hf];W[ff])",
    "(;FF[4]SZ[9]KM[7];B[ee];W[gc](;B[cc];W[cg];B[gg];W[gd];B[dc];W[ec]"
    ";B[eb])(;B[ge];W[cf];B[cd];W[dg];B[fc];W[gb];B[fb]))",
]


@pytest.fixture(scope="module")
def sgf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sgfs")
    for i, s in enumerate(SGFS):
        (d / f"g{i}.sgf").write_text(s)
    return str(d)


def _run_cmd(argv):
    from katago_tpu.cli.sgf_cmds import main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    lines = buf.getvalue().strip().splitlines()
    return json.loads(lines[-1]), lines


def test_samplesgfs(sgf_dir, tmp_path):
    out = str(tmp_path / "poses")
    res, _ = _run_cmd(["samplesgfs", "--sgfdir", sgf_dir,
                       "--outdir", out, "--sample-prob", "1.0",
                       "--turn-weight-lambda", "0.02"])
    assert res["kept"] > 10
    files = glob.glob(os.path.join(out, "startposes.*.txt"))
    assert files and os.path.exists(os.path.join(out, "sgfhashes.txt"))
    # weights decay with turn (lambda); all positive
    from katago_tpu.dataio.poses import load_poses
    poses = load_poses(files[0])
    assert all(p.weight > 0 for p in poses)
    # exclude-hashes removes everything on a rerun
    res2, _ = _run_cmd(["samplesgfs", "--sgfdir", sgf_dir,
                        "--outdir", str(tmp_path / "poses2"),
                        "--sample-prob", "1.0",
                        "--exclude-hashes",
                        os.path.join(out, "sgfhashes.txt")])
    assert res2["kept"] == 0


def test_viewstartposes(sgf_dir, tmp_path):
    out = str(tmp_path / "poses")
    _run_cmd(["samplesgfs", "--sgfdir", sgf_dir, "--outdir", out,
              "--sample-prob", "1.0"])
    f = glob.glob(os.path.join(out, "startposes.*.txt"))[0]
    res, lines = _run_cmd(["viewstartposes", "--start-poses-file", f])
    assert res["shown"] == res["poses"] > 0
    res2, _ = _run_cmd(["viewstartposes", "--start-poses-file", f,
                        "--check-legality"])
    assert res2["illegal"] == 0


def test_dataminesgfs_and_hintpolicy(sgf_dir, tmp_path):
    out = str(tmp_path / "mined")
    res, _ = _run_cmd(["dataminesgfs", "--sgfdir", sgf_dir,
                       "--outdir", out, "--game-mode", "--size", "9",
                       "--config", "b1c6", "--visits", "12",
                       "--max-policy", "1.0"])
    assert res["candidates"] > 0 and res["searched"] > 0
    files = glob.glob(os.path.join(out, "hintposes.*.txt"))
    if files:   # random-net searches rarely agree with the played move
        res2, _ = _run_cmd(["checksgfhintpolicy",
                            "--start-poses-file", files[0],
                            "--config", "b1c6"])
        assert res2["hints"] > 0
