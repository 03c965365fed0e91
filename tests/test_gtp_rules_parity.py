"""GTP rules parity against the reference's own fixture: run the script
/root/reference/cpp/tests/gtp/rules.txt through our GTP engine and
compare every kata-get-rules JSON against the reference's committed
expected output (cpp/tests/results/gtp/rules.txt.stdout), field by field
on the rule keys both emit."""

import io
import json
import os

import pytest

REF_SCRIPT = "/root/reference/cpp/tests/gtp/rules.txt"
REF_STDOUT = "/root/reference/cpp/tests/results/gtp/rules.txt.stdout"

RULE_KEYS = ["ko", "scoring", "tax", "suicide", "hasButton",
             "friendlyPassOk", "whiteHandicapBonus"]


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference fixtures unavailable")
def test_rules_transitions_match_reference():
    from katago_tpu.cli.gtp import GTPEngine, run_gtp
    from katago_tpu.game import rules as R

    script = open(REF_SCRIPT).read()
    expected = [ln[2:].strip() for ln in open(REF_STDOUT)
                if ln.startswith("= ")]

    # the reference's GTP default config is tromp-taylor; ours defaults to
    # the no-suicide variant, so pin the start state to match the fixture
    engine = GTPEngine(size=9, visits=4,
                       rules=R.Rules.parse("tromp-taylor"))
    out = io.StringIO()
    run_gtp(engine, infile=io.StringIO(script + "\nquit\n"), outfile=out)
    got = [b.strip() for b in out.getvalue().split("\n\n") if b.strip()]
    got = [g[1:].strip() for g in got if g.startswith("=")]

    ref_jsons = [json.loads(e) for e in expected if e.startswith("{")]
    our_jsons = [json.loads(g) for g in got if g.startswith("{")]
    assert len(our_jsons) == len(ref_jsons) != 0
    for i, (ref, ours) in enumerate(zip(ref_jsons, our_jsons)):
        for k in RULE_KEYS:
            assert k in ours, f"response {i} missing {k}"
            assert str(ours[k]) == str(ref[k]), \
                f"response {i} key {k}: ours={ours[k]!r} ref={ref[k]!r}"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/cpp/tests/results/gtp/"
                       "handicap.txt.stdout"),
    reason="reference fixtures unavailable")
def test_fixed_handicap_placement_matches_reference():
    """Stone sets of fixed_handicap match the reference fixture
    (playutils.cpp placeFixedHandicap patterns)."""
    from katago_tpu.cli.gtp import GTPEngine, run_gtp

    def vertices(size, n):
        engine = GTPEngine(size=size, visits=4)
        out = io.StringIO()
        run_gtp(engine, infile=io.StringIO(f"fixed_handicap {n}\nquit\n"),
                outfile=out)
        resp = out.getvalue().split("\n\n")[0]
        assert resp.startswith("= "), resp
        return set(resp[2:].split())

    # 19x19 handicap 7 — the fixture's literal response
    assert vertices(19, 7) == {"D16", "Q16", "D10", "K10", "Q10", "D4",
                               "Q4"}
    # 13x13 handicap 3 — the fixture's showboard stones
    assert vertices(13, 3) == {"D10", "K10", "D4"}
    # 19x19 handicap 2/3/4/9 per the reference pattern
    assert vertices(19, 2) == {"D4", "Q16"}
    assert vertices(19, 3) == {"D4", "Q16", "D16"}
    assert vertices(19, 4) == {"D4", "Q16", "D16", "Q4"}
    assert vertices(19, 9) == {"D4", "Q16", "D16", "Q4", "D10", "Q10",
                               "K4", "K16", "K10"}
