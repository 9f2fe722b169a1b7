"""Add the second independent 100-epoch training draw of OUR trainer to
PARITY.json's ``training_vae`` section.

The equal-epoch comparison is one training draw per side (init seed 2222,
the reference's own); the second draw (init seed 100, same recipe/epochs)
measures how much of the observed equal-epoch gap is training-draw
variance in the >0.15 m init-chaotic scratch regime, where the reference's
own EVAL seed already swings 0.269–0.359 on one checkpoint.

  python tools/train_draw2_merge.py \
      --draw2-train /tmp/train_h2h/ours_draw2/draw2_train.json \
      --draw2-eval /tmp/eval_draw2_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draw2-train", required=True,
                    help="JSON {model_dir, train_seconds, seed}")
    ap.add_argument("--draw2-eval", required=True,
                    help="JSON [{seed,mpjpe,mpeepe}..] eval sweep of the "
                         "second-draw checkpoint")
    args = ap.parse_args()

    with open(args.draw2_train) as f:
        tr = json.load(f)
    with open(args.draw2_eval) as f:
        rows = json.load(f)
    vals = [r["mpjpe"] for r in rows]

    from parity_matrix import artifact_lock

    out_path = os.path.join(REPO, "PARITY.json")
    with artifact_lock(out_path):
        with open(out_path) as f:
            artifact = json.load(f)
        t = artifact["training_vae"]
        ours_mean = t["eval_seed_sweep"]["ours"]["mean"]
        ref_mean = t["eval_seed_sweep"]["reference"]["mean"]
        t["second_training_draw"] = {
            "what": ("OUR trainer re-run at the same 100 epochs with a "
                     "different init seed; spread across training draws "
                     "bounds how much of equal_epochs_gap_eval_mean is "
                     "draw variance rather than trainer quality"),
            # loud failure, no fabricated default (advisor, r4)
            "train_seed": tr["seed"],
            "train_seconds": tr["train_seconds"],
            "eval_seed_sweep": {"per_seed": rows,
                                "mean": float(np.mean(vals)),
                                "min": float(min(vals)),
                                "max": float(max(vals))},
            "our_draw_spread": [min(float(np.mean(vals)), ours_mean),
                                max(float(np.mean(vals)), ours_mean)],
            "ref_mean_within_our_draw_spread": (
                min(float(np.mean(vals)), ours_mean) <= ref_mean
                <= max(float(np.mean(vals)), ours_mean)),
        }
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(artifact, f, indent=2)
        os.replace(tmp, out_path)
    print(json.dumps(t["second_training_draw"], indent=1)[:800])


if __name__ == "__main__":
    main()
