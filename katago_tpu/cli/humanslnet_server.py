"""humanslnet server — JSON-lines eval server for human-SL nets
(python/humanslnet_server.py).

Protocol (one JSON object per line on stdin, one response per line on
stdout):
  {"command":"start","board_x_size":N,"board_y_size":N,"rules":...}
  {"command":"play","pla":1|2,"loc":loc}       loc: 0..NN-1, NN=pass
  {"command":"undo"} / {"command":"redo"}
  {"command":"get_model_outputs","sgfmeta":{...camelCase SGFMetadata...}}
      -> {"outputs": {"moves_and_probs0": [[loc,prob]...],
                      "value": [win,loss,noresult],
                      "lead": x, "scorestdev": y}}

The sgfmeta conditioning rides the MetadataEncoder when the loaded model
has one (cfg.metadata_encoder); for plain nets it is accepted and
ignored, matching the reference's behavior with non-humanSL checkpoints.

Usage:
  python -m katago_tpu.cli.humanslnet_server [-model M.bin.gz]
      [-config b2c16meta] [-size 19]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import features as F
from katago_tpu.models.sgfmetadata import SGFMetadata, fill_metadata_row


class _Session:
    def __init__(self, apply_fn, size: int, rules: R.Rules):
        self.size = size
        self.rules = rules
        self.apply_fn = apply_fn
        gs = H.new_game(size, H.RulesArr.from_rules(rules),
                        max_hist=2 * size * size + 64)
        self.states = [gs]
        self.redo_stack: list = []

    @property
    def gs(self):
        return self.states[-1]

    def play(self, pla: int, loc: int):
        gs = H.replace_pos(self.gs, to_move=jnp.int32(pla))
        gs, _ = H.step(gs, jnp.int32(loc), self.size)
        self.states.append(gs)
        self.redo_stack = []

    def undo(self):
        if len(self.states) > 1:
            self.redo_stack.append(self.states.pop())

    def redo(self):
        if self.redo_stack:
            self.states.append(self.redo_stack.pop())

    def model_outputs(self, sgfmeta: SGFMetadata) -> dict:
        gs = self.gs
        size = self.size
        legal = H.legal_moves(gs, size)
        sp, gl = F.fill_features_v7(gs, size, F.FeatureParams.default(),
                                    legal)
        to_move = int(np.asarray(gs.pos.to_move))
        meta_row = fill_metadata_row(sgfmeta, next_player_is_white=(
            to_move == 2), board_area=size * size)
        raw = self.apply_fn(
            sp.reshape(1, size, size, F.NUM_SPATIAL_V7), gl[None],
            jnp.asarray(meta_row)[None])
        from katago_tpu.models.model import postprocess_outputs
        out = postprocess_outputs(raw)
        pol = np.exp(np.asarray(out["policy_log_probs"][0]))
        pol = np.where(np.asarray(legal), pol, 0.0)
        vp = np.asarray(out["value_probs"][0])
        moves_and_probs = [[int(a), float(pol[a])]
                           for a in np.argsort(pol)[::-1] if pol[a] > 1e-6]
        return {
            "moves_and_probs0": moves_and_probs,
            "value": [float(vp[0]), float(vp[1]),
                      float(vp[2]) if vp.shape[0] > 2 else 0.0],
            "lead": float(np.asarray(out["lead"][0])),
            "scorestdev": float(np.asarray(out["score_stdev"][0])),
        }


def make_apply(args, size: int):
    """Returns apply(spatial, global, metadata) -> raw outputs dict."""
    if args.model:
        from katago_tpu.models import desc as D
        net = D.load_model(args.model)
        if net.trunk.get("meta_encoder") is not None:
            return lambda s, g, m: D.apply_desc_model(net, s, g, metadata=m)
        return lambda s, g, m: D.apply_desc_model(net, s, g)
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    cfg = MC.get_config(args.config)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    if cfg.metadata_encoder:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, size, size, 22)),
                            jnp.zeros((1, 19)),
                            metadata=jnp.zeros((1, 192)))
        return lambda s, g, m: model.apply(params, s, g, metadata=m)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    return lambda s, g, m: model.apply(params, s, g)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-model", default=None)
    ap.add_argument("-config", default="b2c16")
    ap.add_argument("-size", type=int, default=19)
    args = ap.parse_args(argv)

    session = None
    apply_cache: dict[int, object] = {}

    def write(obj):
        sys.stdout.write(json.dumps(obj) + "\n")
        sys.stdout.flush()

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        data = json.loads(line)
        cmd = data["command"]
        if cmd == "start":
            size = int(data.get("board_x_size", args.size))
            if int(data.get("board_y_size", size)) != size:
                write({"error": "rectangular boards not supported"})
                continue
            rv = data.get("rules")
            if isinstance(rv, dict):
                rules = R.Rules.parse(json.dumps(rv))
            elif isinstance(rv, str):
                rules = R.Rules.parse(rv)
            else:
                rules = R.Rules.tromp_taylorish()
            if size not in apply_cache:
                apply_cache[size] = make_apply(args, size)
            session = _Session(apply_cache[size], size, rules)
            write({"outputs": ""})
        elif cmd == "play":
            session.play(int(data["pla"]), int(data["loc"]))
            write({"outputs": ""})
        elif cmd == "undo":
            session.undo()
            write({"outputs": ""})
        elif cmd == "redo":
            session.redo()
            write({"outputs": ""})
        elif cmd == "get_model_outputs":
            meta = SGFMetadata.of_dict(data.get("sgfmeta") or {})
            write({"outputs": session.model_outputs(meta)})
        else:
            write({"error": f"unknown command {cmd}"})


if __name__ == "__main__":
    main()
