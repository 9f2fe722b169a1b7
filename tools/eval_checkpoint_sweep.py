"""Eval-seed sweep of one scratch VAE checkpoint through our eval_drag.

Scratch (100-epoch) checkpoints sit in the >0.15 m drag regime where the
evaluator is init-seed-chaotic, so training head-to-heads carry a 4-seed
eval sweep per checkpoint (PARITY.json.training_vae) instead of one draw.
This tool produces one such sweep as JSON rows [{seed,mpjpe,mpeepe}..] —
the input format of train_h2h_merge.py / train_draw2_merge.py /
ref_draw2_merge.py.

  python tools/eval_checkpoint_sweep.py <model_dir> \
      --out /tmp/eval_ref_draw2.json [--seeds 2222 100 107 114]

Same evaluator as tools/train_h2h.py:eval_checkpoint — 6-tracker offline
budget, no temporal guidance (each VAE would need its own temporal net;
the raw drag objective isolates generator quality), primary eval clip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SEEDS = [2222, 100, 107, 114]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=DEFAULT_SEEDS)
    ap.add_argument("--workdir", default="/tmp/eval_ckpt_sweep")
    args = ap.parse_args()

    from parity_matrix import CLIPS, materialize_clip
    from train_h2h import EVAL_CLIP
    from dragposer_tpu.cli.eval_drag import (build_engine, evaluate_file,
                                             resolve_config)
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    os.makedirs(args.workdir, exist_ok=True)
    clip = os.path.join(args.workdir, "clip.bvh")
    if not os.path.exists(clip):
        materialize_clip(clip, EVAL_CLIP, CLIPS[EVAL_CLIP]["frames"])
    bvh = BVH().load(clip)
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        args.model_dir, parents, resolve_config("6_trackers"),
        use_temporal=False, skeleton=skeleton,
    )
    rows = []
    for seed in args.seeds:
        mpjpe, mpeepe, _, _ = evaluate_file(
            engine, means, stds, skeleton, clip, save_dir=args.workdir,
            seed=seed)
        rows.append({"seed": seed, "mpjpe": float(mpjpe),
                     "mpeepe": float(mpeepe)})
        print(json.dumps(rows[-1]), flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    vals = [r["mpjpe"] for r in rows]
    print(f"mean {sum(vals)/len(vals):.4f}  min {min(vals):.4f}  "
          f"max {max(vals):.4f}  -> {args.out}")


if __name__ == "__main__":
    main()
