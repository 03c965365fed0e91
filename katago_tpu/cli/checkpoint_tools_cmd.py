"""Checkpoint utilities — clean / show / edit / migrate
(python/clean_checkpoint.py, edit_checkpoint.py, migrate_*.py).

  clean    strip a full TrainState checkpoint down to a params-only
           export for release (reference clean_checkpoint.py: drop
           optimizer state, keep model or SWA weights)
  show     print metadata, step, and per-tree parameter counts
  edit     set keys in the sidecar train_metadata.json
           (edit_checkpoint.py)
  migrate  upgrade an old-layout checkpoint to the current TrainState
           (the migrate_*.py family): fills fields the old format
           lacked (e.g. swa_params := ema_params) and rewrites it

Usage:
  python -m katago_tpu.cli.checkpoint_tools_cmd clean -ckpt C -out DIR
      -name NAME [-config b6c96] [-size 19] [-use-swa] [-bin-gz]
  python -m katago_tpu.cli.checkpoint_tools_cmd show -ckpt C
  python -m katago_tpu.cli.checkpoint_tools_cmd edit -ckpt C -set k=v ...
  python -m katago_tpu.cli.checkpoint_tools_cmd migrate -ckpt C
      -config b6c96 -size 19
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _raw_restore(path: str):
    """Restore a checkpoint as a raw pytree (no template)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def _param_count(tree) -> int:
    return sum(int(np.asarray(x).size) for x in jax.tree.leaves(tree))


def _template_state(config_name: str, size: int):
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.train.train_step import init_train_state, make_optimizer
    cfg = MC.get_config(config_name)
    model = KataGoModel(cfg, pos_len=size, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    tx = make_optimizer()
    return init_train_state(params, tx), cfg


def cmd_show(args):
    from katago_tpu.train import checkpoint as C
    tree = _raw_restore(args.ckpt)
    meta = C.load_metadata(args.ckpt)
    out = {"metadata": meta}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "step":
                out["step"] = int(np.asarray(v))
            elif k in ("params", "ema_params", "swa_params", "opt_state"):
                out[f"{k}_count"] = _param_count(v)
    print(json.dumps(out, indent=2, default=str))


def cmd_edit(args):
    meta_path = os.path.join(args.ckpt, "train_metadata.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    for kv in args.set or []:
        k, v = kv.split("=", 1)
        try:
            meta[k] = json.loads(v)
        except json.JSONDecodeError:
            meta[k] = v
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    print(json.dumps({"edited": meta_path, "metadata": meta}))


def cmd_clean(args):
    from katago_tpu.train import checkpoint as C
    template, cfg = _template_state(args.config, args.size)
    state = C.restore_checkpoint(args.ckpt, template)
    params = state.swa_params if args.use_swa else state.ema_params
    path = C.export_params(args.out, args.name, params)
    result = {"export": path, "params": _param_count(params),
              "source_step": int(np.asarray(state.step))}
    if args.bin_gz:
        bp = C.export_bin_gz(args.out, args.name, params, cfg)
        result["bin_gz"] = bp
    print(json.dumps(result))


def cmd_migrate(args):
    """Fill fields an old checkpoint layout lacked and rewrite in place
    (migrate_*.py family). Currently: missing swa_params -> copy of
    ema_params; missing seki_ema -> fresh zeros; metadata untouched."""
    from katago_tpu.train import checkpoint as C
    from katago_tpu.train.train_step import TrainState
    tree = _raw_restore(args.ckpt)
    if not isinstance(tree, dict) or "params" not in tree:
        raise SystemExit("not a TrainState checkpoint")
    changed = []
    if "swa_params" not in tree or tree["swa_params"] is None:
        tree["swa_params"] = tree.get("ema_params", tree["params"])
        changed.append("swa_params")
    if "seki_ema" not in tree or tree["seki_ema"] is None:
        from katago_tpu.train.losses import SekiEma
        tree["seki_ema"] = jax.tree.map(np.asarray,
                                        SekiEma.init()._asdict())
        changed.append("seki_ema")
    if not changed:
        print(json.dumps({"migrated": [], "note": "already current"}))
        return
    template, _ = _template_state(args.config, args.size)
    state = TrainState(
        params=tree["params"], opt_state=tree["opt_state"],
        ema_params=tree["ema_params"], swa_params=tree["swa_params"],
        step=np.asarray(tree["step"]),
        seki_ema=jax.tree.map(lambda t, r: np.asarray(r),
                              template.seki_ema._asdict(),
                              tree["seki_ema"]))
    # round-trip through the template to validate structure
    meta = C.load_metadata(args.ckpt)
    step = int(np.asarray(state.step))
    out_dir = os.path.dirname(os.path.abspath(args.ckpt))
    path = C.save_checkpoint(out_dir, state, step,
                             keep=10**9, metadata=meta or None)
    print(json.dumps({"migrated": changed, "rewritten": path}))


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="command", required=True)
    p = sub.add_parser("show")
    p.add_argument("-ckpt", required=True)
    p.set_defaults(fn=cmd_show)
    p = sub.add_parser("edit")
    p.add_argument("-ckpt", required=True)
    p.add_argument("-set", action="append")
    p.set_defaults(fn=cmd_edit)
    p = sub.add_parser("clean")
    p.add_argument("-ckpt", required=True)
    p.add_argument("-out", required=True)
    p.add_argument("-name", required=True)
    p.add_argument("-config", default="b2c16")
    p.add_argument("-size", type=int, default=19)
    p.add_argument("-use-swa", action="store_true")
    p.add_argument("-bin-gz", action="store_true")
    p.set_defaults(fn=cmd_clean)
    p = sub.add_parser("migrate")
    p.add_argument("-ckpt", required=True)
    p.add_argument("-config", default="b2c16")
    p.add_argument("-size", type=int, default=19)
    p.set_defaults(fn=cmd_migrate)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
