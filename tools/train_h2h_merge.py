"""Compose the final ``training_vae`` section of PARITY.json from the
offline-collected from-scratch training head-to-head artifacts.

Inputs (produced by ``tools/train_h2h.py`` sides + probes):
  - the equal-EPOCH comparison already merged by train_h2h.py (100 epochs
    each side, single training draw per side),
  - an eval init-seed sweep of BOTH checkpoints (the scratch checkpoints
    sit in the >0.15 m regime where the drag evaluator is seed-chaotic,
    so single-draw eval columns overstate precision),
  - the equal-WALL-CLOCK side: our trainer re-run for the reference's
    measured training budget (the TPU-native claim — our step is ~4.2x
    faster, so the same seconds buy ~4x the epochs), plus its eval sweep.

  python tools/train_h2h_merge.py \
      --eval-sweep /tmp/eval_seed_probe.json \
      --wc-train /tmp/train_h2h/ours_wc/wc_train.json \
      --wc-eval /tmp/eval_wc_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stats(rows):
    v = [r["mpjpe"] for r in rows]
    return {"per_seed": rows, "mean": float(np.mean(v)),
            "min": float(min(v)), "max": float(max(v))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval-sweep", required=True,
                    help="JSON {ours: [{seed,mpjpe,mpeepe}..], ref: [..]} "
                         "for the equal-epoch checkpoints")
    ap.add_argument("--wc-train", required=True,
                    help="JSON {model_dir, train_seconds} of the "
                         "equal-wall-clock run")
    ap.add_argument("--wc-epochs", type=int, default=600)
    ap.add_argument("--wc-eval", required=True,
                    help="JSON [{seed,mpjpe,mpeepe}..] for the "
                         "equal-wall-clock checkpoint")
    args = ap.parse_args()

    with open(args.eval_sweep) as f:
        sweep = json.load(f)
    with open(args.wc_train) as f:
        wc = json.load(f)
    with open(args.wc_eval) as f:
        wc_eval = json.load(f)
    if isinstance(wc_eval, dict):
        wc_eval = wc_eval["ours_wc"]

    from parity_matrix import artifact_lock

    out_path = os.path.join(REPO, "PARITY.json")
    with artifact_lock(out_path):
        with open(out_path) as f:
            artifact = json.load(f)
        t = artifact["training_vae"]
        ours_s = _stats(sweep["ours"])
        ref_s = _stats(sweep["ref"])
        wc_s = _stats(wc_eval)
        t["what"] += (
            ".  Both scratch checkpoints land in the >0.15 m drag regime "
            "where the evaluator is init-seed-chaotic, so each column "
            "carries a 4-seed eval sweep; the single-draw columns are the "
            "reference's own seed (2222).  equal_wallclock re-runs our "
            "trainer for the reference's measured wall-clock budget — the "
            "TPU-native comparison (same seconds, ~4x the epochs)")
        t["eval_seed_sweep"] = {"ours": ours_s, "reference": ref_s}
        t["equal_epochs_gap_eval_mean"] = (
            (ours_s["mean"] - ref_s["mean"]) / ref_s["mean"])
        t["our_checkpoint_not_worse"] = (
            ours_s["mean"] <= ref_s["mean"] * 1.02)
        t["equal_wallclock"] = {
            "epochs": args.wc_epochs,
            "train_seconds": wc["train_seconds"],
            "budget_seconds_reference": t["reference"]["train_seconds"],
            "eval_seed_sweep": wc_s,
            "our_wc_checkpoint_not_worse": (
                wc_s["mean"] <= ref_s["mean"] * 1.02),
        }
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(artifact, f, indent=2)
        os.replace(tmp, out_path)
    print(json.dumps({
        "equal_epochs": {"ours_mean": ours_s["mean"],
                         "ref_mean": ref_s["mean"],
                         "not_worse": t["our_checkpoint_not_worse"]},
        "equal_wallclock": {"ours_mean": wc_s["mean"],
                            "ref_mean": ref_s["mean"],
                            "not_worse": t["equal_wallclock"][
                                "our_wc_checkpoint_not_worse"]},
    }, indent=1))


if __name__ == "__main__":
    main()
