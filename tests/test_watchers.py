"""GnormWatcher / MetricsLogger tests (trainloop_helpers.py:300-357,
metrics_logging.py)."""

import json
import math

import pytest

from katago_tpu.train.watchers import (GnormWatcher, GnormWatcherError,
                                       MetricsLogger)


def test_consecutive_bad_triggers_after_good():
    w = GnormWatcher(consecutive_warn_threshold=3)
    w.observe(1.0)                      # good arms the watcher
    w.observe(float("nan"))
    w.observe(float("inf"))
    with pytest.raises(GnormWatcherError):
        w.observe(float("nan"))


def test_startup_calibration_tolerated():
    # an unbroken nonfinite run from batch 0 must not false-positive until
    # startup_good_limit
    w = GnormWatcher(consecutive_warn_threshold=3, startup_good_limit=10)
    for _ in range(9):
        w.observe(float("nan"))
    with pytest.raises(GnormWatcherError):
        w.observe(float("nan"))         # 10th with no good batch


def test_extreme_magnitude_counts_as_bad():
    w = GnormWatcher(consecutive_warn_threshold=2, extreme_cap_factor=50.0)
    w.observe(1.0, gnorm_cap=1.0)
    w.observe(100.0, gnorm_cap=1.0)
    with pytest.raises(GnormWatcherError):
        w.observe(100.0, gnorm_cap=1.0)


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.json")
    ml = MetricsLogger(path)
    ml.accumulate({"loss": 2.0}, batch_size=4)
    ml.accumulate({"loss": 1.0}, batch_size=4)
    out = ml.log_line({"step": 7})
    assert out["loss"] == pytest.approx(1.5)
    ml.accumulate({"loss": float("nan")}, batch_size=4)
    ml.clear_nonfinite(log=lambda *_: None)
    assert math.isfinite(ml.snapshot().get("loss", 0.0))
    ml.close()
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 7
