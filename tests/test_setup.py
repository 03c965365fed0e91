"""Setup config->SearchParams mapping tests (cpp/program/setup.cpp)."""

from katago_tpu.utils.config_parser import ConfigParser
from katago_tpu.utils.setup import (load_search_params, search_limits,
                                    warn_unused)


def _cfg(text, tmp_path):
    p = tmp_path / "c.cfg"
    p.write_text(text)
    return ConfigParser(str(p))


def test_search_params_from_reference_keys(tmp_path):
    cfg = _cfg("""
cpuctExploration = 1.2
cpuctExplorationLog = 0.5
useLcbForSelection = true
lcbStdevs = 6.0
staticScoreUtilityFactor = 0.2
rootNoiseEnabled = true
chosenMoveTemperature = 0.15
maxVisits = 777
lagBuffer = 0.75
numSearchThreads = 16
""", tmp_path)
    sp = load_search_params(cfg)
    assert sp.cpuct_exploration == 1.2
    assert sp.cpuct_exploration_log == 0.5
    assert sp.use_lcb_for_selection is True
    assert sp.lcb_stdevs == 6.0
    assert sp.static_score_utility_factor == 0.2
    assert sp.root_noise_enabled is True
    assert sp.chosen_move_temperature == 0.15
    lim = search_limits(cfg)
    assert lim["max_visits"] == 777 and lim["lag_buffer"] == 0.75
    # numSearchThreads is accepted-and-ignored, never warned about
    warned = warn_unused(cfg, log=lambda *_: None)
    assert "numSearchThreads" not in warned


def test_unknown_keys_warn(tmp_path):
    cfg = _cfg("bogusKnob = 3\ncpuctExploration = 1.0\n", tmp_path)
    load_search_params(cfg)
    warned = warn_unused(cfg, log=lambda *_: None)
    assert "bogusKnob" in warned


def test_reference_gtp_config_parses(tmp_path):
    """The reference's shipped gtp config parses through our setup."""
    import shutil, os
    src = "/root/reference/cpp/configs/gtp_example.cfg"
    if not os.path.exists(src):
        import pytest
        pytest.skip("reference configs not mounted")
    cfg = ConfigParser(src)
    sp = load_search_params(cfg)
    assert sp is not None


def test_get_mem_suffixes():
    """Global::readMem suffix parsing (core/global.cpp:643-685)."""
    from katago_tpu.utils.config_parser import ConfigError, ConfigParser

    cp = ConfigParser(contents=(
        "a = 17\nb = 4K\nc = 4KB\nd = 2M\ne = 3GB\nf = 1T\ng = 100B\n"
        "bad = 4X\n"))
    assert cp.get_mem("a") == 17
    assert cp.get_mem("b") == 4 << 10
    assert cp.get_mem("c") == 4 << 10
    assert cp.get_mem("d") == 2 << 20
    assert cp.get_mem("e") == 3 << 30
    assert cp.get_mem("f") == 1 << 40
    assert cp.get_mem("g") == 100
    assert cp.get_mem("missing", default=64) == 64
    try:
        cp.get_mem("bad")
        raise AssertionError("expected ConfigError")
    except ConfigError:
        pass
