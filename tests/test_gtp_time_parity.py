"""Clock-state parity with the reference's GTP time fixture: replay
cpp/tests/gtp/time.txt command-for-command through our GTP engine and
compare each kata-debug-print-tc's clock state (mainTimeLeft,
inOvertime, numPeriodsLeftIncludingCurrent when byo-yomi) against the
fields in the reference's committed expected stdout."""

import io
import os
import re

import pytest

REF_SCRIPT = "/root/reference/cpp/tests/gtp/time.txt"
REF_STDOUT = "/root/reference/cpp/tests/results/gtp/time.txt.stdout"


def _ref_tc_states():
    """Per kata-debug-print-tc response: {player: {field: value}}."""
    out = []
    blocks = open(REF_STDOUT).read().split("\n\n")
    for b in blocks:
        b = b.strip()
        if not b.startswith("=") or "originalMainTime" not in b:
            continue
        state = {}
        for line in b.splitlines():
            line = line.lstrip("= ").strip()
            m = re.match(r"(Black|White) (.*)", line)
            if not m:
                continue
            fields = dict(
                (k, v) for k, v in re.findall(r"(\w+) (-?[\d.e+]+)",
                                              m.group(2)))
            state[m.group(1)] = fields
        out.append(state)
    return out


@pytest.mark.skipif(not os.path.exists(REF_SCRIPT),
                    reason="reference fixtures unavailable")
def test_time_settings_state_matches_reference():
    from katago_tpu.cli.gtp import GTPEngine, run_gtp
    from katago_tpu.game import board as B

    refs = _ref_tc_states()
    assert refs, "no reference clock states parsed"

    engine = GTPEngine(size=19, visits=4)
    states = []
    script = [ln.strip() for ln in open(REF_SCRIPT) if ln.strip()]

    out = io.StringIO()
    # replay command by command, snapshotting our clocks at each
    # kata-debug-print-tc instead of parsing our debug format
    for cmd in script:
        if cmd == "kata-debug-print-tc":
            snap = {}
            for name, pla in (("Black", B.BLACK), ("White", B.WHITE)):
                tc = engine.time_controls[pla]
                snap[name] = tc
            states.append({
                name: None if tc is None else
                {"mainTimeLeft": tc.main_time_left,
                 "inOvertime": tc.in_overtime,
                 "numPeriodsLeftIncludingCurrent":
                     tc.num_periods_left_including_current}
                for name, tc in snap.items()})
            continue
        run_gtp(engine, infile=io.StringIO(cmd + "\nquit\n"), outfile=out)

    assert len(refs) == len(states), (len(refs), len(states))
    paired = 0
    for i, (ref, mine) in enumerate(zip(refs, states)):
        if mine["Black"] is None or mine["Black"]["mainTimeLeft"] > 1e20:
            continue   # our unlimited / no-clock state
        if float(ref["Black"].get("originalMainTime", 0)) > 1e20:
            continue   # reference unlimited sentinel
        paired += 1
        for name in ("Black", "White"):
            rf, mf = ref[name], mine[name]
            assert abs(float(rf["mainTimeLeft"])
                       - mf["mainTimeLeft"]) < 1e-6, (i, name, rf, mf)
            assert bool(int(rf["inOvertime"])) == mf["inOvertime"], \
                (i, name, rf, mf)
            if "numPeriodsLeftIncludingCurrent" in rf:
                assert (int(rf["numPeriodsLeftIncludingCurrent"])
                        == mf["numPeriodsLeftIncludingCurrent"]), \
                    (i, name, rf, mf)
    assert paired >= 6, f"only {paired} clock states compared"
