"""gatekeeper command — candidate-vs-champion gating (reference cpp/command/gatekeeper.cpp).

Polls test-models/ for candidates, plays each against the current best in
models/, and accepts (moves into models/) if the candidate's win proportion
meets the threshold (default 0.5, gatekeeper.cpp:52-188), rejecting
otherwise (into rejected-models/). Model exports are param checkpoints from
the train command; matches run through cli.match_cmd's batched engine.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import jax
import jax.numpy as jnp

from katago_tpu.cli.match_cmd import play_match
from katago_tpu.train import checkpoint as C


def _bot_from_export(path: str, size: int, config_name: str):
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    cfg = MC.get_config(config_name)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    params = C.load_params(path, template)
    return lambda p, s, g: model.apply(params, s, g)


def run_gatekeeper(test_models_dir: str, models_dir: str,
                   rejected_dir: str, *, size: int, config_name: str,
                   games: int, visits: int, win_threshold: float = 0.5,
                   seed: int = 0, log=print) -> list[dict]:
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(rejected_dir, exist_ok=True)
    results = []
    candidates = sorted(
        d for d in os.listdir(test_models_dir)
        if os.path.isdir(os.path.join(test_models_dir, d))
        and not d.startswith("."))
    for cand in candidates:
        cand_path = os.path.join(test_models_dir, cand)
        champ_path = C.find_latest_model(models_dir)
        apply_cand = _bot_from_export(cand_path, size, config_name)
        if champ_path is None:
            # first model is accepted unconditionally (reference behavior)
            dest = os.path.join(models_dir, cand)
            shutil.move(cand_path, dest)
            log(f"gatekeeper: no champion, accepted {cand}")
            results.append({"candidate": cand, "accepted": True,
                            "reason": "first model"})
            continue
        apply_champ = _bot_from_export(champ_path, size, config_name)
        record = play_match(apply_cand, None, apply_champ, None, size=size,
                            num_games=games, visits=visits, seed=seed,
                            log=log)
        win_prop = (record["a_wins"] + 0.5 * record["draws"]) / record["games"]
        accepted = win_prop >= win_threshold
        dest = os.path.join(models_dir if accepted else rejected_dir, cand)
        shutil.move(cand_path, dest)
        log(f"gatekeeper: {cand} vs {os.path.basename(champ_path)}: "
            f"win prop {win_prop:.2f} -> "
            f"{'ACCEPTED' if accepted else 'rejected'}")
        results.append({"candidate": cand, "accepted": accepted,
                        "win_prop": win_prop, **record})
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-test-models-dir", required=True)
    ap.add_argument("-models-dir", required=True)
    ap.add_argument("-rejected-models-dir", required=True)
    ap.add_argument("-size", type=int, default=9)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-games", type=int, default=8)
    ap.add_argument("-visits", type=int, default=24)
    ap.add_argument("-win-threshold", type=float, default=0.5)
    args = ap.parse_args(argv)
    out = run_gatekeeper(args.test_models_dir, args.models_dir,
                         args.rejected_models_dir, size=args.size,
                         config_name=args.config, games=args.games,
                         visits=args.visits,
                         win_threshold=args.win_threshold)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
