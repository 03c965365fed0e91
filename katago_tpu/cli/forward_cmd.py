"""forward — run the raw net on positions, print every head
(python/forward_model.py).

Debugging tool: loads a checkpoint export or a .bin.gz model, featurizes
a position (empty board, or an SGF at a given turn), runs one forward
pass (no search), and prints the post-processed outputs as JSON: value,
lead, score stats, shortterm errors, top-policy moves, and optionally
full policy/ownership grids.

Usage:
  python -m katago_tpu.cli.forward_cmd [-model M.bin.gz | -config b6c96]
      [-size 19] [-sgf game.sgf [-turn N]] [-full]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import history as H
from katago_tpu.game import rules as R


def load_position(args):
    if args.sgf:
        from katago_tpu.cli.sgf_cmds import _replay
        from katago_tpu.dataio import sgf as S
        with open(args.sgf) as f:
            game = S.parse_sgf(f.read())[0]
        _, _, states, _ = _replay(game, upto=args.turn)
        return states[-1], game.size[0]
    size = args.size
    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=8)
    return gs, size


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-model", default=None)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-size", type=int, default=19)
    ap.add_argument("-sgf", default=None)
    ap.add_argument("-turn", type=int, default=None)
    ap.add_argument("-full", action="store_true",
                    help="include full policy/ownership grids")
    args = ap.parse_args(argv)

    gs, size = load_position(args)

    if args.model:
        from katago_tpu.models import desc as D
        net = D.load_model(args.model)
        apply_fn = D.make_desc_apply(net)
        params = None
        name = net.name
    else:
        from katago_tpu.models import config as MC
        from katago_tpu.models.model import KataGoModel
        model = KataGoModel(MC.get_config(args.config), pos_len=size,
                            dtype=jnp.float32)
        p = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
        apply_fn = lambda _, s, g: model.apply(p, s, g)  # noqa: E731
        params = None
        name = f"random-init-{args.config}"

    from katago_tpu.models import features as F
    from katago_tpu.models.model import postprocess_outputs
    legal = H.legal_moves(gs, size)
    sp_feat, gl_feat = F.fill_features_v7(gs, size, F.FeatureParams.default(),
                                          legal)
    raw = apply_fn(params, sp_feat.reshape(1, size, size, F.NUM_SPATIAL_V7),
                   gl_feat[None])
    out = postprocess_outputs(raw)
    pol = np.exp(np.asarray(out["policy_log_probs"][0]))
    pol = np.where(np.asarray(legal), pol, 0.0)
    vp = np.asarray(out["value_probs"][0])
    to_move = int(np.asarray(gs.pos.to_move))
    cols = "ABCDEFGHJKLMNOPQRSTUVWXYZ"

    def loc_str(a):
        if a >= size * size:
            return "pass"
        return f"{cols[a % size]}{size - a // size}"

    top = np.argsort(pol)[::-1][:10]
    result = {
        "model": name,
        "toMove": "black" if to_move == 1 else "white",
        "win": float(vp[0]), "loss": float(vp[1]),
        "noResult": float(vp[2]) if vp.shape[0] > 2 else 0.0,
        "scoreMean": float(np.asarray(out["score_mean"][0])),
        "scoreStdev": float(np.asarray(out["score_stdev"][0])),
        "lead": float(np.asarray(out["lead"][0])),
        "varianceTime": float(np.asarray(out["variance_time"][0])),
        "shorttermWinlossError":
            float(np.asarray(out["shortterm_value_error"][0])),
        "shorttermScoreError":
            float(np.asarray(out["shortterm_score_error"][0])),
        "topPolicy": [{"move": loc_str(int(a)), "prob": float(pol[a])}
                      for a in top if pol[a] > 0],
    }
    if args.full:
        result["policy"] = pol.tolist()
        result["ownership"] = np.asarray(
            out["ownership"][0]).reshape(-1).tolist()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
