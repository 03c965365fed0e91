"""Trainer production pieces: resumable data serving (datagen.py vs the
reference's python/katago/utils/training_data_generator.py contract), LR
schedules (train.py:86,169-190,504-546), SWA bookkeeping, and the
two-phase disk shuffler (shuffle.py:199,406-436)."""

import os
import random

import numpy as np
import pytest

from katago_tpu.train import schedules as SCH
from katago_tpu.train import shuffle as SH
from katago_tpu.train.datagen import DataFileServer


def _make_files(d, names):
    os.makedirs(d, exist_ok=True)
    for n in names:
        np.savez(os.path.join(d, n), x=np.zeros(1))
    return [os.path.join(d, n) for n in names]


# ---- datagen ---------------------------------------------------------------

def test_datagen_serves_each_file_once_per_epoch(tmp_path):
    d = str(tmp_path / "data")
    files = _make_files(d, [f"f{i}.npz" for i in range(8)])
    state = {}
    gen = DataFileServer(state, no_repeat_files=False,
                         rng=random.Random(0))
    assert gen.set_data_dir_if_has_remaining_files(d)
    served = [gen.pop() for _ in range(8)]
    assert sorted(served) == sorted(files)
    # second epoch reshuffles and serves all again
    served2 = [gen.pop() for _ in range(8)]
    assert sorted(served2) == sorted(files)


def test_datagen_no_repeat_stops(tmp_path):
    d = str(tmp_path / "data")
    _make_files(d, ["a.npz", "b.npz"])
    gen = DataFileServer({}, no_repeat_files=True, rng=random.Random(0))
    assert gen.set_data_dir_if_has_remaining_files(d)
    assert gen.pop() is not None
    assert gen.pop() is not None
    assert gen.pop() is None
    assert not gen.has_any_remaining_data()


def test_datagen_resume_mid_epoch_no_repeats(tmp_path):
    """Kill-and-resume mid-epoch: the restored state must serve exactly
    the unserved files (the contract the reference unit-tests)."""
    d = str(tmp_path / "data")
    files = _make_files(d, [f"f{i}.npz" for i in range(10)])
    state = {}
    gen = DataFileServer(state, no_repeat_files=True,
                         rng=random.Random(1))
    assert gen.set_data_dir_if_has_remaining_files(d)
    first = [gen.pop() for _ in range(4)]

    # "checkpoint" = deep copy of state; new process restores it
    import copy
    state2 = copy.deepcopy(state)
    gen2 = DataFileServer(state2, no_repeat_files=True,
                          rng=random.Random(99))
    assert gen2.set_data_dir_if_has_remaining_files(d)
    rest = []
    while True:
        f = gen2.pop()
        if f is None:
            break
        rest.append(f)
    assert sorted(first + rest) == sorted(files)
    assert not set(first) & set(rest)


def test_datagen_declines_fully_used_dir_in_no_repeat(tmp_path):
    d = str(tmp_path / "data")
    _make_files(d, ["a.npz"])
    state = {}
    gen = DataFileServer(state, no_repeat_files=True, rng=random.Random(0))
    assert gen.set_data_dir_if_has_remaining_files(d)
    gen.pop()
    gen2 = DataFileServer(state, no_repeat_files=True,
                          rng=random.Random(0))
    assert not gen2.set_data_dir_if_has_remaining_files(d)


def test_datagen_new_files_appear(tmp_path):
    d = str(tmp_path / "data")
    _make_files(d, ["a.npz", "b.npz"])
    state = {}
    gen = DataFileServer(state, no_repeat_files=True, rng=random.Random(2))
    assert gen.set_data_dir_if_has_remaining_files(d)
    got = {gen.pop(), gen.pop()}
    new = _make_files(d, ["c.npz", "d.npz"])[2:]
    assert gen.set_data_dir_if_has_remaining_files(d)
    got2 = {gen.pop(), gen.pop()}
    assert got2 == set(new) or got2 <= set(
        os.path.join(d, n) for n in ["c.npz", "d.npz"])
    assert gen.pop() is None


def test_datagen_gap_delay_reshuffle():
    """A file may not recur within ~1/3 of the dataset of its previous
    position (the reservoir gap-delay)."""
    rng = random.Random(3)
    state = {"data_files_used": [f"f{i}" for i in range(30)],
             "rev_data_files_remaining": [],
             "old_train_data_dirs": []}
    gen = DataFileServer(state, no_repeat_files=False, rng=rng)
    gen._all_files = [f"f{i}" for i in range(30)]
    order = gen._reshuffle_for_new_epoch()
    assert sorted(order) == sorted(gen._all_files)
    # the last-served file of the previous epoch (f29) cannot land in the
    # first ~1/3 of the new order
    prev_pos = 29
    new_pos = order.index("f29")
    assert new_pos >= (30 - prev_pos) - 1  # trivially true for f29...
    # the strong property: file at prev position p enters the reservoir
    # only after (p - 2n/3) pops, so it cannot appear before that index
    k0 = (30 * 2 + 1) // 3
    for p in range(k0, 30):
        pos = order.index(f"f{p}")
        assert pos >= p - k0


# ---- schedules -------------------------------------------------------------

def test_parse_suffixed_count():
    assert SCH.parse_suffixed_count("20M") == 20_000_000
    assert SCH.parse_suffixed_count("1.5B") == 1_500_000_000
    assert SCH.parse_suffixed_count("250k") == 250_000
    assert SCH.parse_suffixed_count("123") == 123


def test_parse_lr_schedule():
    pts = SCH.parse_lr_schedule("(0,12.0),(20M,9.0),(40M,6.0)")
    assert pts == [(0, 12.0), (20_000_000, 9.0), (40_000_000, 6.0)]
    with pytest.raises(ValueError):
        SCH.parse_lr_schedule("(5,1.0)")  # must start at 0
    with pytest.raises(ValueError):
        SCH.parse_lr_schedule("(0,1.0),(10,2.0),(10,3.0)")  # increasing


def test_lr_schedule_lookup():
    sched = SCH.make_lr_schedule(1e-4, 256,
                                 lr_schedule_str="(0,8.0),(1k,4.0)")
    assert sched(0) == pytest.approx(8e-4)
    assert sched(3) == pytest.approx(8e-4)   # 768 samples < 1000
    assert sched(4) == pytest.approx(4e-4)   # 1024 >= 1000
    auto = SCH.make_lr_schedule(1e-4, 1, lr_scale_auto=True)
    assert auto(0) == pytest.approx(8e-4)
    assert auto(600_000_000) == pytest.approx(6e-4)
    with pytest.raises(ValueError):
        SCH.make_lr_schedule(1e-4, 1, lr_scale=2.0, lr_scale_auto=True)


def test_swa_tracker():
    import jax.numpy as jnp
    swa = SCH.SwaTracker(period_samples=100, scale=4.0)
    fires = [swa.step(40) for _ in range(5)]  # 40,80,120,160,200
    assert fires == [False, False, True, False, True]
    p = {"w": jnp.ones(3)}
    s = {"w": jnp.zeros(3)}
    out = swa.update(s, p)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.25)


# ---- two-phase shuffler ----------------------------------------------------

def _write_shards(d, sizes, key="x"):
    os.makedirs(d, exist_ok=True)
    paths, start = [], 0
    for i, n in enumerate(sizes):
        p = os.path.join(d, f"in{i}.npz")
        np.savez(p, **{key: np.arange(start, start + n),
                       "y": np.arange(start, start + n) * 2})
        paths.append(p)
        start += n
    return paths, start


@pytest.mark.parametrize("rows_per_bucket", [1 << 20, 64])
def test_shuffle_two_phase_exact_permutation(tmp_path, rows_per_bucket):
    """Multi-bucket disk shuffle = exact permutation of the window, rows
    kept aligned across keys; bucket files cleaned up."""
    d = str(tmp_path / "in")
    out = str(tmp_path / "out")
    paths, total = _write_shards(d, [100, 150, 50])
    got = SH.shuffle_npz_files(paths, out, rows_per_shard=64,
                               window_rows=200, seed=7,
                               rows_per_bucket=rows_per_bucket)
    xs, ys = [], []
    for p in got:
        with np.load(p) as z:
            xs.append(z["x"])
            ys.append(z["y"])
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    # window keeps the NEWEST 200 rows (100..299)
    assert sorted(x.tolist()) == list(range(100, 300))
    np.testing.assert_array_equal(y, x * 2)   # row alignment preserved
    assert not np.all(np.diff(x) > 0)          # actually shuffled
    assert not [f for f in os.listdir(out) if f.startswith(".bucket")]


def test_window_power_law():
    w0 = SH.compute_window_size(250_000)
    assert w0 == 250_000
    w1 = SH.compute_window_size(10_000_000)
    assert 250_000 < w1 < 10_000_000
    assert SH.compute_window_size(10_000_000, max_rows=300_000) == 300_000


def test_longterm_checkpoint_snapshots(tmp_path):
    """Never-pruned periodic snapshots (train.py longterm checkpoints)."""
    import os
    import time

    import jax.numpy as jnp

    from katago_tpu.cli.checkpoint_tools_cmd import _template_state
    from katago_tpu.train import checkpoint as C

    state, _ = _template_state("b1c6", 5)
    ckpt = str(tmp_path)
    p1 = C.maybe_save_longterm(ckpt, state, 5, every_s=3600.0,
                               metadata={"a": 1})
    assert p1 and os.path.isdir(p1)
    # within the interval: no new snapshot
    assert C.maybe_save_longterm(ckpt, state, 6, every_s=3600.0) is None
    # expired interval: snapshot saved, old one KEPT
    old = os.path.join(ckpt, "longterm_checkpoints")
    past = time.time() - 7200
    for d in os.listdir(old):
        os.utime(os.path.join(old, d), (past, past))
    p2 = C.maybe_save_longterm(ckpt, state, 7, every_s=3600.0)
    assert p2 and os.path.isdir(p1) and os.path.isdir(p2)
    assert len(os.listdir(old)) == 2
