"""Position-sample files and start-position selfplay
(cpp/dataio/sgf.h:108-135 PositionSample, poswriter.{h,cpp},
selfplay startPosesProb)."""

import json
import os

import numpy as np

from katago_tpu.game import board as B


def _sample(size=5):
    from katago_tpu.dataio.poses import PositionSample
    stones = np.zeros(size * size, np.int8)
    stones[12] = B.BLACK
    stones[7] = B.WHITE
    return PositionSample(x_size=size, y_size=size, stones=stones,
                          next_pla=B.BLACK,
                          moves=[(B.BLACK, 6), (B.WHITE, 18)],
                          initial_turn_number=4, hint_loc=11, weight=2.0,
                          metadata="t.sgf")


def test_position_sample_roundtrip():
    from katago_tpu.dataio.poses import PositionSample
    ps = _sample()
    line = ps.to_json_line()
    data = json.loads(line)
    # reference wire format fields
    assert data["xSize"] == 5 and data["nextPla"] == "B"
    assert data["board"].count("/") == 5
    assert data["moveLocs"] == ["B4", "D2"]
    assert data["movePlas"] == ["B", "W"]
    back = PositionSample.of_json_line(line)
    assert (back.stones == ps.stones).all()
    assert back.moves == ps.moves
    assert back.hint_loc == 11 and back.weight == 2.0


def test_pos_writer_rotation(tmp_path):
    from katago_tpu.dataio.poses import PosWriter, load_poses
    w = PosWriter("startposes.jsonl", str(tmp_path), max_poses_per_file=2)
    for _ in range(5):
        w.write_pos(_sample())
    w.flush_and_stop()
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 3
    assert len(load_poses([str(tmp_path / f) for f in files])) == 5


def test_startposes_cmd(tmp_path, capsys):
    from katago_tpu.cli.sgf_cmds import main
    d = tmp_path / "sgfs"
    d.mkdir()
    (d / "g.sgf").write_text(
        "(;GM[1]FF[4]SZ[5]KM[6.5];B[cc];W[dd];B[bd];W[db];B[cd];W[bb])")
    out = str(tmp_path / "poses.jsonl")
    main(["startposes", "-sgf-dir", str(d), "-output", out,
          "-sample-prob", "1.0"])
    res = json.loads(capsys.readouterr().out)
    assert res["positions"] == 6
    from katago_tpu.dataio.poses import load_poses
    poses = load_poses(out)
    assert len(poses) == 6
    # context moves bounded and hint set
    assert all(len(p.moves) <= 2 and p.hint_loc >= 0 for p in poses)


def test_gameinit_start_poses(tmp_path):
    from katago_tpu.dataio.poses import PosWriter
    from katago_tpu.selfplay import gameinit as GI
    pf = str(tmp_path / "p.jsonl")
    w = PosWriter("x", str(tmp_path))
    for _ in range(3):
        w.write_pos(_sample())
    w.flush_and_stop()
    pf = os.path.join(str(tmp_path), sorted(os.listdir(tmp_path))[0])
    p = GI.GameInitParams(allowed_sizes=(5,), size_rel_probs=(1.0,),
                          start_poses_prob=1.0, start_poses_files=(pf,))
    rng = np.random.default_rng(0)
    specs = GI.sample_game_specs(p, 4, rng)
    assert all(s.start_pos is not None and s.size == 5 for s in specs)
    rules, nh, comp, fork, starts = GI.specs_to_rules_arrays(specs)
    assert all(st is not None for st in starts)
    assert (nh == 0).all()


def test_play_games_from_start_positions():
    """Selfplay games seeded from a PositionSample start where the
    sample's stones stand and history context is replayed."""
    import jax
    import jax.numpy as jnp
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.selfplay.loop import play_games

    size = 5
    model = KataGoModel(MC.get_config("b1c6"), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)),
                        jnp.zeros((1, 19)))
    sample = _sample(size)
    data, stats = play_games(model.apply, params, size=size, num_games=2,
                             visits=6, rng=jax.random.PRNGKey(1),
                             start_samples=[sample, None])
    # both games completed with finite scores
    assert np.isfinite(stats["white_minus_black"]).all()
    # game 0's recorded rows start from a position containing the
    # sample's stones (turn numbers offset by initialTurnNumber)
    rows0 = np.flatnonzero(np.asarray(data.game_idx) == 0)
    assert rows0.size > 0


def test_genposes_cmd(tmp_path, capsys):
    """Random/clumpy pose generation (genrandomposes.py role): legal
    batched positions, fairness-filtered, PositionSample output."""
    from katago_tpu.cli.genposes_cmd import main
    out = str(tmp_path / "poses.jsonl")
    main(["-out", out, "-n", "6", "-size", "5", "-mode", "clumpy",
          "-min-moves", "4", "-max-moves", "10", "-config", "b1c6",
          "-max-score", "1000", "-score-rejection-pickiness", "0.0"])
    res = json.loads(capsys.readouterr().out)
    assert res["generated"] == 6 and res["kept"] == 6
    from katago_tpu.dataio.poses import load_poses
    poses = load_poses(out)
    assert len(poses) == 6
    for p in poses:
        stones = np.asarray(p.stones)
        n_stones = (stones > 0).sum()
        assert 1 <= n_stones <= 10
        # no zero-liberty chains survive a legal game
        import jax.numpy as jnp

        from katago_tpu.game import board as GB
        lab = GB.connected_labels(jnp.asarray(stones, jnp.int32), 5)
        libs = GB.chain_liberties(jnp.asarray(stones, jnp.int32), lab, 5)
        occ = stones > 0
        assert (np.asarray(libs)[occ] > 0).all()
