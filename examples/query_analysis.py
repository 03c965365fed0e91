"""Example client for the JSON analysis engine
(python/query_analysis_engine_example.py).

Starts `python -m katago_tpu.cli.analysis` as a subprocess and queries
positions over the JSON-lines protocol, including streaming partial
reports (reportDuringSearchEvery).

Usage:
  PYTHONPATH=/root/repo python examples/query_analysis.py \
      [-model M.bin.gz] [-size 9] [-visits 32]
"""

import argparse
import json
import subprocess
import sys


class KataGoAnalysis:
    def __init__(self, model: str | None = None):
        cmd = [sys.executable, "-m", "katago_tpu.cli.analysis"]
        if model:
            cmd += ["-model", model]
        self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                     stdout=subprocess.PIPE, text=True)

    def query(self, req: dict):
        """Send one request; yield responses until the final one for its
        id arrives (partials have isDuringSearch=true)."""
        self.proc.stdin.write(json.dumps(req) + "\n")
        self.proc.stdin.flush()
        while True:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError("analysis engine closed")
            resp = json.loads(line)
            yield resp
            if resp.get("id") == req["id"] and \
                    not resp.get("isDuringSearch", False):
                return

    def close(self):
        self.proc.stdin.write(json.dumps({"action": "terminate",
                                          "id": "end"}) + "\n")
        self.proc.stdin.flush()
        self.proc.wait(timeout=30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-model", default=None)
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-visits", type=int, default=32)
    args = ap.parse_args()

    engine = KataGoAnalysis(args.model)
    req = {
        "id": "q1",
        "boardXSize": args.size,
        "boardYSize": args.size,
        "rules": "tromp-taylor",
        "komi": 7.5,
        "moves": [["B", "D4"], ["W", "E5"]],
        "maxVisits": args.visits,
        "includeOwnership": False,
        "reportDuringSearchEvery": 1.0,
    }
    for resp in engine.query(req):
        if "error" in resp:
            print("error:", resp["error"])
            break
        tag = "partial" if resp.get("isDuringSearch") else "final"
        ri = resp["rootInfo"]
        best = resp["moveInfos"][0] if resp["moveInfos"] else {}
        print(f"[{tag}] visits={ri['visits']} "
              f"winrate={ri['winrate']:.3f} "
              f"best={best.get('move')} pv={' '.join(best.get('pv', []))}")
    engine.close()


if __name__ == "__main__":
    main()
