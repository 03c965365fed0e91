"""Closed-loop integration: selfplay -> shuffle -> train -> gatekeeper.

The reference's synchronous_loop.sh cycle at micro scale, including
checkpoint resume and npz schema round-trip.
"""

import glob
import json
import os

import numpy as np
import pytest

from katago_tpu.cli.loop_cmd import run_loop
from katago_tpu.dataio import trainingwrite as TW


def test_one_loop_cycle(tmp_path):
    summary = run_loop(
        str(tmp_path), cycles=1, size=5, config_name="b1c6",
        games_per_cycle=4, visits=10, train_steps=10, batch_size=16,
        lr=1e-3, gate_games=2, log=lambda *a: None)
    assert len(summary) == 1
    c = summary[0]
    assert c["selfplay"]["games"] == 4
    assert c["train"]["steps"] == 10
    assert np.isfinite(c["train"]["final_loss"])
    # first model accepted unconditionally
    assert c["gatekeeper"][0]["accepted"]
    # directory layout holds the artifacts
    assert glob.glob(str(tmp_path / "selfplay" / "*" / "tdata" / "*.npz"))
    assert glob.glob(str(tmp_path / "selfplay" / "*" / "sgfs" / "*.sgfs"))
    assert glob.glob(str(tmp_path / "ckpts" / "step_*"))
    assert glob.glob(str(tmp_path / "models" / "*"))


def test_npz_schema_roundtrip(tmp_path):
    size = 5
    area = size * size
    n = 7
    rng = np.random.default_rng(0)
    spatial = rng.integers(0, 2, (n, size, size, 22)).astype(np.float32)
    pol = rng.random((n, area + 1)).astype(np.float32)
    pol /= pol.sum(-1, keepdims=True)
    arrays = TW.pack_rows(
        spatial=spatial,
        global_in=rng.random((n, 19)).astype(np.float32),
        policy_target=pol, next_policy_target=np.zeros_like(pol),
        value_target=np.tile([[1, 0, 0]], (n, 1)).astype(np.float32),
        td_targets=np.zeros((n, 4), np.float32),
        score_target=np.linspace(-10, 10, n).astype(np.float32),
        lead_target=np.zeros(n, np.float32),
        ownership_target=rng.uniform(-1, 1, (n, area)).astype(np.float32),
        self_komi=np.full(n, 7.5, np.float32),
        turn_idx=np.arange(n, dtype=np.float32),
        visits=np.full(n, 100, np.float32), size=size)

    # schema names + dtypes match the reference layout
    assert arrays["binaryInputNCHWPacked"].dtype == np.uint8
    assert arrays["policyTargetsNCMove"].shape == (n, 2, area + 1)
    assert arrays["globalTargetsNC"].shape == (n, 80)
    assert arrays["scoreDistrN"].shape == (n, 2 * area + 120)
    assert arrays["valueTargetsNCHW"].shape == (n, 5, size, size)
    # score distr sums to ~100 per row (two-hot)
    np.testing.assert_allclose(
        arrays["scoreDistrN"].astype(np.int32).sum(-1), 100, atol=1)

    path = str(tmp_path / "t.npz")
    TW.write_npz(path, arrays)
    back = TW.read_npz(path, size)
    np.testing.assert_array_equal(
        back["binaryInputNCHW"].transpose(0, 2, 3, 1), spatial)
    pol_back = back["policyTargetsNCMove"][:, 0]
    pol_back = pol_back / pol_back.sum(-1, keepdims=True)
    np.testing.assert_allclose(pol_back, pol, atol=2e-4)
    np.testing.assert_allclose(back["globalTargetsNC"][:, 20],
                               np.linspace(-10, 10, n), rtol=1e-5)


def test_td_blend_limits():
    # white_targets: per-turn [win,loss,nr,score], final row = game result
    wt = np.array([[0.55, 0.45, 0.0, 0.1],
                   [0.40, 0.60, 0.0, -0.2],
                   [0.75, 0.25, 0.0, 0.5],
                   [1.00, 0.00, 0.0, 3.0]], np.float32)  # final: white win
    # nowFactor 1 -> the immediate estimate at each turn
    t1 = TW.td_blend(wt, 1.0)
    np.testing.assert_allclose(t1, wt[:3], atol=1e-6)
    # nowFactor 0 -> the final result everywhere
    t0 = TW.td_blend(wt, 0.0)
    np.testing.assert_allclose(t0, np.tile(wt[3], (3, 1)), atol=1e-6)
    # intermediate blends move monotonically toward the final result
    tm = TW.td_blend(wt, 0.3)
    assert (tm[:, 0] >= np.minimum(t1[:3, 0], 1.0) - 1e-6).all()
    groups = TW.td_groups(wt, board_area=81)
    assert groups.shape == (3, 5, 4)
    np.testing.assert_allclose(groups[:, 0], t0, atol=1e-6)  # C0-3 = final
    np.testing.assert_allclose(groups[:, 4], t1, atol=1e-6)  # C16-19 = now


def test_variance_time_target():
    wl = np.array([0.0, 0.5, 0.5, -0.5], np.float32)
    out = TW.variance_time_target(wl)
    # turn 2: |Δ|²=1 at distance 1 -> 1
    # turn 1: 0*... + 1*2 = 2 ; turn 0: 0.25*1 + 0 + 1*3 = 3.25
    np.testing.assert_allclose(out, [3.25, 2.0, 1.0], atol=1e-6)


def test_async_loop_cycle(tmp_path):
    """Asynchronous mode: selfplay producer thread + concurrent learner
    (SelfplayTraining.md asynchronous training)."""
    from katago_tpu.cli.loop_cmd import run_loop_async
    summary = run_loop_async(
        str(tmp_path), cycles=1, size=5, config_name="b1c6",
        games_per_cycle=2, visits=6, train_steps=4, batch_size=8,
        lr=1e-3, gate_games=2, log=lambda *a: None)
    cycles = [c for c in summary if "cycle" in c]
    totals = [c for c in summary if "selfplay_totals" in c]
    assert len(cycles) == 1 and totals
    assert cycles[0]["train"]["steps"] == 4
    assert totals[0]["selfplay_totals"].get("games", 0) >= 2
