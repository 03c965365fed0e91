"""Learning-curve parity: our trainer vs the reference python/train.py.

BASELINE.md: "Trainer matches reference `python/train.py` learning curve
within seed variance on small-board runs." This harness runs BOTH
trainers on the SAME shuffled npz dataset (our trainingwrite schema is
the reference's exact schema) with the same model family and batch size,
then overlays their loss curves and reports terminal-loss deltas.

Stages (each skippable when its output exists):
  1. data:  selfplay with a tiny net -> npz rows -> two-phase shuffle
            into  <workdir>/shuffled/{train,val}/
  2. ref:   /root/reference/python/train.py  (torch CPU)
            -> <workdir>/ref_train/metrics_train.json
  3. ours:  katago_tpu.cli.train_cmd  -> <workdir>/our_ckpt/metrics.json
  4. compare: overlay p0loss/vloss curves, write
            <workdir>/learning_curve_parity.json

Usage:
  python tools/learning_curve_parity.py --workdir /tmp/lcp --size 9 \
      --steps 400 --batch-size 64 --model-kind b2c16
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REF_TRAIN = "/root/reference/python/train.py"
REF_PYDIR = "/root/reference/python"


def stage_data(args):
    shuffled = os.path.join(args.workdir, "shuffled")
    if os.path.isdir(os.path.join(shuffled, "train")):
        print("data: reusing", shuffled, file=sys.stderr)
        return shuffled
    import glob
    import shutil
    import jax
    jax.config.update("jax_platforms", "cpu")
    selfplay_dir = os.path.join(args.workdir, "selfplay")
    os.makedirs(selfplay_dir, exist_ok=True)
    from katago_tpu.cli.selfplay_cmd import main as selfplay_main
    batches = max(1, args.games // 32)
    selfplay_main([
        "-output-dir", selfplay_dir, "-size", str(args.size),
        "-config", args.selfplay_config, "-games-per-batch", "32",
        "-max-batches", str(batches), "-visits", "24", "-seed", "7",
    ])
    from katago_tpu.train.shuffle import shuffle_npz_files
    shards = sorted(glob.glob(os.path.join(selfplay_dir, "**", "*.npz"),
                              recursive=True))
    tmp_out = os.path.join(args.workdir, "shuffled_tmp")
    out = shuffle_npz_files(shards, tmp_out, rows_per_shard=8192, seed=3)
    os.makedirs(os.path.join(shuffled, "train"), exist_ok=True)
    os.makedirs(os.path.join(shuffled, "val"), exist_ok=True)
    # last shard becomes validation (both trainers want train/ and val/)
    for i, p in enumerate(out):
        sub = "val" if i == len(out) - 1 and len(out) > 1 else "train"
        shutil.move(p, os.path.join(shuffled, sub, os.path.basename(p)))
    return shuffled


def stage_ref(args, shuffled):
    traindir = os.path.join(args.workdir, "ref_train")
    metrics = os.path.join(traindir, "metrics_train.json")
    if os.path.exists(metrics):
        print("ref: reusing", metrics, file=sys.stderr)
        return metrics
    os.makedirs(traindir, exist_ok=True)
    samples = args.steps * args.batch_size
    env = dict(os.environ, PYTHONPATH=REF_PYDIR)
    cmd = [
        sys.executable, REF_TRAIN,
        "-traindir", traindir, "-datadir", shuffled,
        "-pos-len", str(args.size), "-batch-size", str(args.batch_size),
        "-model-kind", args.model_kind,
        "-lr-scale", "1.0",
        "-max-training-samples", str(samples),
        "-max-epochs-this-instance", "1000",
        "-samples-per-epoch", str(min(samples, 25000)),
        "-sub-epochs", "1",
        "-no-export",
        "-max-train-bucket-per-new-data", "1000000",
    ]
    print("ref:", " ".join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=args.timeout)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:])
        raise SystemExit("reference trainer failed")
    return metrics


def stage_ours(args, shuffled):
    ckpt = os.path.join(args.workdir, "our_ckpt")
    metrics = os.path.join(ckpt, "metrics.json")
    if os.path.exists(metrics):
        print("ours: reusing", metrics, file=sys.stderr)
        return metrics
    import jax
    jax.config.update("jax_platforms", "cpu")
    from katago_tpu.cli.train_cmd import main as train_main
    train_main([
        "-data-dir", os.path.join(shuffled, "train"),
        "-val-dir", os.path.join(shuffled, "val"),
        "-ckpt-dir", ckpt, "-size", str(args.size),
        "-config", args.model_kind, "-batch-size", str(args.batch_size),
        "-steps", str(args.steps), "-lr-scale", "1.0",
    ])
    return metrics


# canonical term -> (reference metrics_train.json key, our metrics.json key)
KEYMAP = {
    "p0loss": ("p0loss", "policy_loss"),
    "vloss": ("vloss", "value_loss"),
}


def read_curve(path, side: int):
    """side: 0 = reference key names, 1 = ours."""
    rows = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        row = {}
        for canon, names in KEYMAP.items():
            if names[side] in d:
                row[canon] = float(d[names[side]])
        if row:
            rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/lcp")
    ap.add_argument("--size", type=int, default=9)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--model-kind", default="b2c16")
    ap.add_argument("--selfplay-config", default="b1c6")
    ap.add_argument("--games", type=int, default=160)
    ap.add_argument("--timeout", type=int, default=7200)
    ap.add_argument("--tolerance", type=float, default=0.12,
                    help="allowed |terminal loss delta| per term")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    shuffled = stage_data(args)
    ref_metrics = stage_ref(args, shuffled)
    our_metrics = stage_ours(args, shuffled)

    ref = read_curve(ref_metrics, 0)
    ours = read_curve(our_metrics, 1)
    if not ref or not ours:
        raise SystemExit(f"empty curves ref={len(ref)} ours={len(ours)}")

    def tail_mean(rows, key, frac=0.25):
        vals = [r[key] for r in rows if key in r]
        k = max(1, int(len(vals) * frac))
        return float(np.mean(vals[-k:]))

    report = {"steps": args.steps, "batch_size": args.batch_size,
              "model_kind": args.model_kind, "size": args.size,
              "points": {"ref": len(ref), "ours": len(ours)}}
    ok = True
    for key in ("p0loss", "vloss"):
        r = tail_mean(ref, key)
        o = tail_mean(ours, key)
        report[key] = {"ref": round(r, 4), "ours": round(o, 4),
                       "delta": round(o - r, 4)}
        if abs(o - r) > args.tolerance:
            ok = False
    report["within_tolerance"] = ok
    report["tolerance"] = args.tolerance
    out_path = os.path.join(args.workdir, "learning_curve_parity.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
