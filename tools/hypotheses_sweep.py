"""Measure sequential hypothesis branching (drag/hypotheses.py) on the
degenerate 3-tracker config.

Baselines (full 5052-frame eval clip, PARITY.json):
  reference default seed      0.299 m MPJPE
  reference 8-seed sweep      0.285-0.479 m (mean ~0.34)
  ours  --restarts 16         0.339 m (whole-clip best-of-N by fit loss)

Usage:
  python tools/hypotheses_sweep.py models/model_dancedb_example \
      [--config 3_trackers] [--frames N] [--grid "R,branch,sigma;..."]
"""

import argparse
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dragposer_tpu import config as cfg
from dragposer_tpu import export, metrics
from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
from dragposer_tpu.data import encoding
from dragposer_tpu.drag.hypotheses import run_hypotheses
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops.topology import Skeleton

EVAL_BVH = "/root/reference/python/data/example/eval/example.bvh"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--config", default="3_trackers")
    ap.add_argument("--bvh", default=EVAL_BVH)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--seed", type=int, default=cfg.VAE_PARAM["seed"])
    ap.add_argument("--grid", default="16,64,0.25;16,16,0.25;16,256,0.25;"
                                      "16,64,0.1;16,64,0.5;16,5052,0.25")
    args = ap.parse_args()

    bvh = BVH().load(args.bvh)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    tracker = resolve_config(args.config)
    engine, means, stds = build_engine(args.model_dir, parents, tracker,
                                       skeleton=skeleton)
    motion = encoding.encode_motion(
        offsets, pos[:, 0, :], rots, skeleton,
        downsample=cfg.VAE_PARAM["downsample"],
        height_indices=cfg.HEIGHT_INDICES,
    )
    norm = encoding.normalize(motion, means, stds)
    n = norm.dqs.shape[0] if args.frames is None else min(
        args.frames, norm.dqs.shape[0])
    dqs, gp, gr = norm.dqs[:n], norm.global_pos[:n], norm.global_rot[:n]
    initial_pose = np.tile(dqs[0][:, None], (1, cfg.VAE_PARAM["window_size"]))

    results = []
    for spec in args.grid.split(";"):
        parts = spec.split(",")
        R, branch, sigma = int(parts[0]), int(parts[1]), float(parts[2])
        K = int(parts[3]) if len(parts) > 3 else 4
        key = jax.random.PRNGKey(args.seed)
        t0 = time.time()
        out, parents, scores = run_hypotheses(
            engine, key, R, dqs, gp, gr, motion.heights[0], initial_pose,
            branch_every=branch, sigma=sigma, survivors=K)
        dt = time.time() - t0
        out_bvh = export.result_to_bvh(out.pose, means, stds, bvh, skeleton,
                                       global_pos=out.global_pos,
                                       are_root_rot_incr=False)
        tmp = "/tmp/hyp_eval.bvh"
        out_bvh.save(tmp)
        mpjpe, mpeepe = metrics.positional_error(bvh, BVH().load(tmp))
        # after each resample the incumbent lineage sits at lane 0, so a
        # non-zero parent for lane 0 marks a lead change during that chunk
        lead_changes = int((parents[:, 0] != 0).sum())
        print(f"R={R:3d} branch={branch:5d} sigma={sigma:.2f} K={K}  "
              f"MPJPE={mpjpe:.4f}  MPEEPE={mpeepe:.4f}  "
              f"lead changes={lead_changes}/{len(parents)-1}  "
              f"time={dt:.0f}s", flush=True)
        results.append((R, branch, sigma, K, float(mpjpe), float(mpeepe)))

    best = min(results, key=lambda r: r[4])
    print("best:", best)


if __name__ == "__main__":
    main()
