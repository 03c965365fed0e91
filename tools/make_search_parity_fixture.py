"""Generate the cross-engine search-trace parity fixture.

Drives a CPU (Eigen) build of the reference KataGo's analysis engine
(cpp/command/analysis.cpp) with the committed g170-b6c96 test net and the
pinned config tests/data/search_parity.cfg, on a spread of positions
sampled by the reference's own policy, and records per-position visit
distributions / values. tests/test_search_parity.py replays the same
positions through katago_tpu's search (same net, SearchParams loaded from
the same config file) and asserts distribution-level agreement — the
analogue of the reference's runsearchtests golden-trace regime
(cpp/main.cpp:60-71, cpp/tests/results/).

Usage:
  python tools/make_search_parity_fixture.py \
      --katago native/refbuild/katago \
      --model /root/reference/cpp/tests/models/g170-b6c96-*.bin.gz \
      --out tests/data/ref_search_b6c96.json.gz
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import subprocess
import sys

import numpy as np

DEFAULT_MODEL = ("/root/reference/cpp/tests/models/"
                 "g170-b6c96-s175395328-d26788732.bin.gz")


class RefAnalysis:
    def __init__(self, katago: str, model: str, cfg: str):
        self.proc = subprocess.Popen(
            [katago, "analysis", "-model", model, "-config", cfg,
             "-quit-without-waiting"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1)
        self._n = 0

    def query(self, req: dict) -> dict:
        self._n += 1
        req = dict(req, id=f"q{self._n}")
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()
        while True:
            line = self.proc.stdout.readline()
            if line == "":
                raise RuntimeError("reference analysis engine died")
            resp = json.loads(line)
            if resp.get("id") == req["id"] and (
                    "moveInfos" in resp or "error" in resp):
                if "error" in resp:
                    raise RuntimeError(f"ref error: {resp}")
                return resp

    def close(self):
        try:
            self.proc.stdin.close()
        except Exception:  # noqa: BLE001
            pass
        self.proc.wait(timeout=30)


def sample_games(eng: RefAnalysis, rng: np.random.Generator, size: int,
                 rules: str, komi: float, n_games: int,
                 turns: list[int], visits: int) -> list[dict]:
    """Play policy-sampled games with the reference net; record analysis
    fixtures at the requested turn numbers."""
    out = []
    letters = "ABCDEFGHJKLMNOPQRST"[:size]

    def to_gtp(flat):
        if flat == size * size:
            return "pass"
        y, x = divmod(flat, size)
        return f"{letters[x]}{size - y}"

    for g in range(n_games):
        moves = []
        for turn in range(max(turns) + 1):
            pla = "B" if turn % 2 == 0 else "W"
            if turn in turns:
                resp = eng.query({
                    "moves": moves, "rules": rules, "komi": komi,
                    "boardXSize": size, "boardYSize": size,
                    "maxVisits": visits, "includePolicy": True,
                })
                out.append({
                    "size": size, "rules": rules, "komi": komi,
                    "moves": list(moves), "visits": visits,
                    "rootInfo": {k: resp["rootInfo"][k] for k in
                                 ("visits", "winrate", "scoreLead",
                                  "currentPlayer")},
                    "moveInfos": [
                        {k: mi[k] for k in ("move", "visits", "winrate",
                                            "scoreLead", "prior", "order")}
                        for mi in resp["moveInfos"]],
                })
                policy = np.asarray(resp["policy"], np.float64)
            else:
                resp = eng.query({
                    "moves": moves, "rules": rules, "komi": komi,
                    "boardXSize": size, "boardYSize": size,
                    "maxVisits": 8, "includePolicy": True,
                })
                policy = np.asarray(resp["policy"], np.float64)
            # sample the next move from the raw policy (temperature ~1.2
            # early for variety, greedy-ish later), skipping pass while
            # the board is this empty
            p = np.where(policy > 0, policy, 0.0)
            p[size * size] = 0.0
            if p.sum() <= 0:
                break
            t = 1.25 if turn < 12 else 0.75
            p = p ** (1.0 / t)
            p /= p.sum()
            mv = int(rng.choice(len(p), p=p))
            moves.append([pla, to_gtp(mv)])
        print(f"  game {g}: {len(moves)} moves, "
              f"{sum(1 for o in out if o['moves'] is not None)} fixtures",
              file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--katago", default="native/refbuild/katago")
    ap.add_argument("--model", default=DEFAULT_MODEL)
    ap.add_argument("--cfg", default="tests/data/search_parity.cfg")
    ap.add_argument("--out", default="tests/data/ref_search_b6c96.json.gz")
    ap.add_argument("--visits", type=int, default=200)
    args = ap.parse_args()
    model = glob.glob(args.model)[0] if "*" in args.model else args.model

    eng = RefAnalysis(args.katago, model, args.cfg)
    rng = np.random.Generator(np.random.PCG64(0xA11CE))
    fixtures = []
    # 19x19: opening / early-middle / middle positions
    fixtures += sample_games(eng, rng, 19, "tromp-taylor", 7.5,
                             n_games=4, turns=[0, 11, 24, 49],
                             visits=args.visits)
    # 9x9: denser tactics, different komi and rules
    fixtures += sample_games(eng, rng, 9, "chinese", 7.0,
                             n_games=4, turns=[0, 9, 19, 29],
                             visits=args.visits)
    eng.close()

    with gzip.open(args.out, "wt") as f:
        json.dump({"model": model.rsplit("/", 1)[-1],
                   "cfg": "tests/data/search_parity.cfg",
                   "fixtures": fixtures}, f)
    print(f"wrote {len(fixtures)} fixtures to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
