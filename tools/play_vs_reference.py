"""Cross-engine GTP match: katago_tpu vs the reference C++ KataGo.

Plays fixed-visit games between our GTP engine and an Eigen CPU build of
the reference, both loading the SAME net (the committed g170-b6c96 test
net), alternating colors. This turns "capabilities match" into a
measured Elo difference — BASELINE.md's strength-validation requirement.

The reference side runs `katago gtp` (cpp/command/gtp.cpp); our side
runs in-process. Both engines get the same maxVisits, no pondering, no
resignation, no time controls; the match loop is the same
alternating-color pairing scheme as cli/match_cmd.py.

Usage:
  python tools/play_vs_reference.py --games 40 --size 9 --visits 100 \
      --out match_vs_ref.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

import numpy as np

REF_KATAGO = "native/refbuild/katago"
MODEL = ("/root/reference/cpp/tests/models/"
         "g170-b6c96-s175395328-d26788732.bin.gz")


class RefGtp:
    """Minimal GTP client around the reference binary."""

    def __init__(self, katago: str, model: str, visits: int, size: int,
                 komi: float, seed: str):
        overrides = ",".join([
            f"maxVisits={visits}", "numSearchThreads=1",
            "ponderingEnabled=false", "allowResignation=false",
            "nnRandomize=false", f"nnRandSeed={seed}",
            f"searchRandSeed={seed}", "rootNoiseEnabled=false",
            "lagBuffer=0",
        ])
        self.proc = subprocess.Popen(
            [katago, "gtp", "-model", model, "-config",
             "/root/reference/cpp/configs/gtp_example.cfg",
             "-override-config", overrides],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, bufsize=1)
        self.send(f"boardsize {size}")
        self.send(f"komi {komi}")

    def send(self, cmd: str) -> str:
        self.proc.stdin.write(cmd + "\n")
        self.proc.stdin.flush()
        lines = []
        while True:
            line = self.proc.stdout.readline()
            if line == "":
                raise RuntimeError(f"reference gtp died on: {cmd}")
            line = line.rstrip("\n")
            if line == "" and lines:
                break
            if line:
                lines.append(line)
        resp = lines[-1]
        if resp.startswith("?"):
            raise RuntimeError(f"gtp error for {cmd!r}: {resp}")
        return resp[1:].strip() if resp.startswith("=") else resp

    def close(self):
        try:
            self.send("quit")
        except Exception:  # noqa: BLE001
            pass
        self.proc.wait(timeout=20)


def build_our_engine(model: str, size: int, komi: float, visits: int):
    from katago_tpu.cli.gtp import GTPEngine
    from katago_tpu.game import rules as R
    rules = R.Rules.tromp_taylorish()
    rules = R.Rules(**{**rules.__dict__, "komi": komi})
    return GTPEngine(model_path=model, size=size, rules=rules,
                     visits=visits, ponder=False,
                     allow_resignation=False, anti_mirror=False)


def random_opening(rng: np.random.Generator, size: int,
                   n_moves: int = 4) -> list[int]:
    """Seeded random opening (distinct interior points) — both engines
    are deterministic here (fixed seeds, no noise), so game pairs need
    injected variety; the same opening is replayed with colors swapped
    (the reference match's sameness-avoidance via openings)."""
    pts = [y * size + x
           for y in range(1, size - 1) for x in range(1, size - 1)]
    return [int(p) for p in rng.choice(pts, size=n_moves, replace=False)]


def play_game(our, ref: RefGtp, our_is_black: bool, size: int,
              max_moves: int, opening: list[int] | None = None
              ) -> tuple[float, int]:
    """Returns (result for OUR side: 1 win, 0 loss, 0.5 draw, moves)."""
    from katago_tpu.cli.gtp import loc_to_gtp, gtp_to_loc
    from katago_tpu.game import board as B

    our.clear_board()
    ref.send("clear_board")
    for i, loc in enumerate(opening or []):
        pla = B.BLACK if i % 2 == 0 else B.WHITE
        pla_s = "b" if i % 2 == 0 else "w"
        our.play(pla, loc)
        ref.send(f"play {pla_s} {loc_to_gtp(loc, size, size, size)}")
    passes = 0
    start = len(opening or [])
    for turn in range(start, max_moves):
        black_turn = (turn % 2 == 0)
        pla = B.BLACK if black_turn else B.WHITE
        pla_s = "b" if black_turn else "w"
        if black_turn == our_is_black:
            loc = our.genmove(pla)
            mv = "pass" if loc is None or loc == size * size \
                else loc_to_gtp(loc, size, size, size)
            ref.send(f"play {pla_s} {mv}")
        else:
            mv = ref.send(f"genmove {pla_s}").lower()
            if mv == "resign":
                return 1.0, turn
            loc = gtp_to_loc(mv, size, size, size)
            our.play(pla, loc)
        passes = passes + 1 if mv.lower() == "pass" else 0
        if passes >= 2:
            break
    # score with OUR engine's Tromp-Taylor scorer; cross-check with the
    # reference's final_score (they agree on double-pass TT finishes)
    from katago_tpu.game import history as H
    _, score = H.final_score_area(our.gs, size)
    s = float(score)
    ours_score = "0" if s == 0 else (f"W+{s:g}" if s > 0 else f"B+{-s:g}")
    refs_score = ref.send("final_score")

    def norm(sc):
        sc = sc.strip().upper()
        if sc in ("0", "DRAW"):
            return "0"
        side, _, num = sc.partition("+")
        return f"{side}+{float(num):g}"

    if norm(ours_score) != norm(refs_score):
        print(f"  [scorer disagreement ours={ours_score} "
              f"ref={refs_score}] using ref", file=sys.stderr)
        ours_score = refs_score
    if ours_score.startswith("0") or ours_score == "draw":
        return 0.5, turn
    black_won = ours_score.upper().startswith("B")
    return (1.0 if black_won == our_is_black else 0.0), turn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=40)
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--visits", type=int, default=100)
    ap.add_argument("--komi", type=float, default=7.0)
    ap.add_argument("--model", default=MODEL)
    ap.add_argument("--katago", default=REF_KATAGO)
    ap.add_argument("--out", default="match_vs_ref.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from katago_tpu.utils.elo import estimate_elo

    our = build_our_engine(args.model, args.size, args.komi, args.visits)
    # one persistent reference process; clear_board between games (the
    # per-game nnRandSeed doesn't matter with nnRandomize=false)
    ref = RefGtp(args.katago, args.model, args.visits, args.size,
                 args.komi, seed="match")
    wins = losses = draws = 0
    t0 = time.time()
    rng = np.random.Generator(np.random.PCG64(12345))
    opening = None
    for g in range(args.games):
        our_is_black = (g % 2 == 0)
        if g % 2 == 0:   # fresh opening per color-swapped pair
            opening = random_opening(rng, args.size)
        r, moves = play_game(our, ref, our_is_black, args.size,
                             max_moves=3 * args.size * args.size,
                             opening=opening)
        if r == 1.0:
            wins += 1
        elif r == 0.0:
            losses += 1
        else:
            draws += 1
        print(f"game {g}: our_is_black={our_is_black} result={r} "
              f"moves={moves} | W-L-D {wins}-{losses}-{draws} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
        # incremental summary after every game: long matches survive
        # interruption with a valid partial result on disk
        elo, stdev = estimate_elo(wins, losses, draws)
        summary = {
            "games": wins + losses + draws, "size": args.size,
            "visits": args.visits,
            "wins": wins, "losses": losses, "draws": draws,
            "elo_vs_reference": round(elo, 1),
            "elo_stdev": round(stdev, 1),
            "model": args.model.rsplit("/", 1)[-1],
        }
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=2)
    ref.close()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
