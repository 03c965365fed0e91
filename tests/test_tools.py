"""Aux tool tests: play helpers, summarize_sgfs, humanslnet server,
checkpoint tools, forward command (python/ tool-family equivalents)."""

import io
import json
import os
import sys

import numpy as np
import pytest

from katago_tpu.game import board as B


def test_play_cmd_vertex_helpers():
    from katago_tpu.cli.play_cmd import board_str, loc_str, parse_vertex
    size = 9
    for loc in [0, 8, 72, 80, 40, size * size]:
        assert parse_vertex(loc_str(loc, size), size) == loc
    assert parse_vertex("pass", size) == size * size
    assert parse_vertex("Z9", size) is None
    assert parse_vertex("A99", size) is None
    stones = np.zeros(81, np.int64)
    stones[40] = B.BLACK
    s = board_str(stones, size, 40)
    assert "(X)" in s and s.count("\n") == size + 1


def _fake_sgf(black, white, result):
    return (f"(;GM[1]FF[4]SZ[5]KM[6.5]PB[{black}]PW[{white}]"
            f"RE[{result}];B[cc];W[dd])")


def test_summarize_sgfs(tmp_path, capsys):
    d = tmp_path / "games"
    d.mkdir()
    (d / "a.sgf").write_text(_fake_sgf("alice", "bob", "B+2.5"))
    (d / "b.sgf").write_text(_fake_sgf("alice", "bob", "B+R"))
    (d / "c.sgf").write_text(_fake_sgf("bob", "alice", "W+1.5"))
    from katago_tpu.cli.summarize_sgfs_cmd import collect_records, main
    players, wm, n = collect_records([str(d)])
    assert players == ["alice", "bob"] and n == 3
    # alice won all three games
    assert wm[0][1][0] == 2 and wm[1][0][1] == 1
    main([str(d), "-json"])
    out = json.loads(capsys.readouterr().out)
    assert out["games"] == 3
    assert out["players"][0]["name"] == "alice"
    assert out["players"][0]["elo"] > out["players"][1]["elo"]


def test_sgfmetadata_wire_roundtrip():
    from katago_tpu.models.sgfmetadata import SGFMetadata
    m = SGFMetadata.of_dict({
        "inverseBRank": 3, "inverseWRank": 5, "bIsHuman": True,
        "wIsHuman": True, "tcIsByoYomi": True,
        "mainTimeSeconds": 600.0, "gameDate": "2011-05-02", "source": 2})
    assert m.initialized and m.inverse_b_rank == 3
    assert m.game_date.year == 2011 and m.source == 2
    back = m.to_dict()
    assert back["inverseWRank"] == 5 and back["gameDate"] == "2011-05-02"
    assert SGFMetadata.of_dict(back).inverse_b_rank == 3


def test_humanslnet_server_protocol(monkeypatch, capsys):
    """Drive the JSON-lines protocol end to end with a tiny net."""
    from katago_tpu.cli import humanslnet_server as HS
    cmds = [
        {"command": "start", "board_x_size": 5, "board_y_size": 5,
         "rules": "japanese"},
        {"command": "play", "pla": 1, "loc": 12},
        {"command": "get_model_outputs",
         "sgfmeta": {"inverseBRank": 4, "inverseWRank": 4,
                     "bIsHuman": True, "wIsHuman": True,
                     "gameDate": "2015-01-01"}},
        {"command": "undo"},
        {"command": "redo"},
    ]
    monkeypatch.setattr(
        sys, "stdin", io.StringIO("\n".join(json.dumps(c) for c in cmds)))
    HS.main(["-config", "b1c6", "-size", "5"])
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    out = lines[2]["outputs"]
    assert len(out["value"]) == 3
    assert 0.0 <= out["value"][0] <= 1.0
    moves = out["moves_and_probs0"]
    assert moves and all(len(m) == 2 for m in moves)
    # probabilities sorted descending and on legal moves only
    assert moves[0][1] >= moves[-1][1]
    assert all(m[0] != 12 for m in moves)  # occupied point not suggested


def test_checkpoint_tools(tmp_path, capsys):
    from katago_tpu.cli import checkpoint_tools_cmd as CT
    from katago_tpu.train import checkpoint as C
    import jax.numpy as jnp
    state, _ = CT._template_state("b1c6", 5)
    state = state._replace(step=jnp.int32(7))
    ckpt_dir = str(tmp_path / "ckpts")
    path = C.save_checkpoint(ckpt_dir, state, 7,
                             metadata={"samples": 123})
    CT.main(["show", "-ckpt", path])
    out = json.loads(capsys.readouterr().out)
    assert out["step"] == 7 and out["metadata"]["samples"] == 123
    assert out["params_count"] > 0

    CT.main(["edit", "-ckpt", path, "-set", "note=hello", "-set",
             "samples=456"])
    out = json.loads(capsys.readouterr().out)
    assert out["metadata"]["note"] == "hello"
    assert out["metadata"]["samples"] == 456

    CT.main(["clean", "-ckpt", path, "-out", str(tmp_path / "rel"),
             "-name", "release1", "-config", "b1c6", "-size", "5"])
    out = json.loads(capsys.readouterr().out)
    assert out["source_step"] == 7
    assert os.path.isdir(out["export"])


def test_forward_cmd(capsys):
    from katago_tpu.cli.forward_cmd import main
    main(["-config", "b1c6", "-size", "5"])
    out = json.loads(capsys.readouterr().out)
    assert abs(out["win"] + out["loss"] + out["noResult"] - 1.0) < 1e-4
    assert out["topPolicy"] and "move" in out["topPolicy"][0]
    assert out["toMove"] == "black"


def test_genboard_fill_and_train(tmp_path, capsys):
    """GenBoard model: masked-fill invariants + train/run CLI round trip
    (genboard_common.py / genboard_train.py / genboard_run.py)."""
    import jax
    import jax.numpy as jnp
    from katago_tpu.models import genboard as GB

    size = 5
    nn_ = size * size
    model = GB.GenBoardModel(num_channels=8, num_blocks=4)
    dummy = jnp.zeros((1, size, size, GB.NUM_INPUT_CHANNELS))
    params = model.init(jax.random.PRNGKey(0), dummy)
    pl, al = model.apply(params, dummy)
    assert pl.shape == (1, 3) and al.shape == (1, size, size, 3)

    stones = np.zeros((2, nn_), np.int32)
    known = np.zeros((2, nn_), bool)
    stones[:, 0] = 1
    known[:, 0] = True     # fixed black stone
    known[:, 1] = True     # fixed empty
    out = GB.sample_fill(model.apply, params, jnp.asarray(stones),
                         jnp.asarray(known), size=size,
                         rng=jax.random.PRNGKey(1), turn=20.0,
                         turn_stdev=0.0, source=0.0)
    out = np.asarray(out)
    assert (out[:, 0] == 1).all() and (out[:, 1] == 0).all()
    assert ((out >= 0) & (out <= 2)).all()

    # train + run CLI round trip on tiny SGFs
    d = tmp_path / "sgfs"
    d.mkdir()
    (d / "g1.sgf").write_text(
        "(;GM[1]FF[4]SZ[5]KM[6.5];B[cc];W[dd];B[bd];W[db];B[cd])")
    (d / "g2.sgf").write_text(
        "(;GM[1]FF[4]SZ[5]KM[6.5];B[dc];W[cd];B[bb];W[dd];B[cb])")
    from katago_tpu.cli.genboard_cmd import main
    out_path = str(tmp_path / "gb.npz")
    main(["train", "-sgf-dir", str(d), "-out", out_path, "-size", "5",
          "-channels", "8", "-blocks", "4", "-steps", "3", "-batch", "4"])
    assert os.path.exists(out_path)
    capsys.readouterr()
    main(["run", "-model", out_path, "-board", "X" + "?" * 23 + ".",
          "-turn", "10", "-turnstdev", "5", "-source", "0",
          "-batchsize", "2"])
    text = capsys.readouterr().out.strip()
    boards = [b for b in text.split("\n\n") if b.strip()]
    assert len(boards) == 2
    assert boards[0].split()[0] == "X"   # known stone preserved


def test_npz_tools(tmp_path, capsys):
    """add-meta stamps metadataInputNC; summarize header-scans rows
    (add_kata_selfplay_meta_to_npzs.py / summarize_old_selfplay_files.py)."""
    import numpy as np

    from katago_tpu.cli.npz_tools_cmd import main, npz_row_count
    d = tmp_path / "data"
    d.mkdir()
    f = str(d / "a.npz")
    np.savez_compressed(
        f,
        binaryInputNCHWPacked=np.zeros((4, 22, 4), np.uint8),
        globalInputNC=np.zeros((4, 19), np.float32))
    assert npz_row_count(f) == 4
    main(["summarize", str(d)])
    out = json.loads(capsys.readouterr().out)
    assert out[0]["files"] == 1 and out[0]["rows"] == 4
    main(["add-meta", "-dir", str(d), "-profile", "rank_5d",
          "-board-area", "25"])
    res = json.loads(capsys.readouterr().out)
    assert res["stamped"] == 1
    with np.load(f) as z:
        assert z["metadataInputNC"].shape == (4, 192)
        assert z["metadataInputNC"].any()
    # idempotent unless forced
    main(["add-meta", "-dir", str(d)])
    assert json.loads(capsys.readouterr().out)["skipped"] == 1


def test_train_benchmark(capsys):
    """Training-step rows/s benchmark (benchmark_fresh_model.py role)."""
    from katago_tpu.cli.benchmark_cmd import main
    main(["-train", "-config", "b1c6", "-size", "5", "-batches", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["train_results"][0]["rows_per_s"] > 0
