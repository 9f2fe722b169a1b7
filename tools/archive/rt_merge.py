"""Merge an offline-collected realtime head-to-head seed sweep into
PARITY.json's ``realtime`` section.

The two sides are measured by separate detached processes (the torch-CPU
reference via ``tools/ref_queue3.sh`` → one JSON per seed, ours via
``tools/rt_ours_sweep.py`` → one JSON keyed by seed); this tool combines
them into the same row + sweep structure ``tools/realtime_h2h.py``'s
orchestrator writes, including the dispersion-aware pass criterion
(recomputed by ``parity_matrix.recompute_pass``).

  python tools/rt_merge.py --config 3_trackers \
      --ours /tmp/rt_h2h_ours_3t.json \
      --ref-pattern '/tmp/rt_h2h_ref_example_3_trackers_{seed}.json' \
      --seeds 2222 100 107 114 121 128 --frames 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_h2h import merge  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", default="example")
    ap.add_argument("--config", required=True)
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--ours", required=True)
    ap.add_argument("--ref-pattern", required=True,
                    help="per-seed reference JSON path with a {seed} slot")
    ap.add_argument("--seeds", type=int, nargs="+", required=True)
    args = ap.parse_args()

    with open(args.ours) as f:
        ours_all = json.load(f)
    our_runs = {int(k): v for k, v in ours_all.items()}
    ref_runs = {}
    for s in args.seeds:
        path = args.ref_pattern.format(seed=s)
        with open(path) as f:
            ref_runs[s] = json.load(f)
        assert s in our_runs, f"ours missing seed {s} in {args.ours}"

    fixed = args.seeds[0]  # convention: the reference's own seed first
    ref0, our0 = ref_runs[fixed], our_runs[fixed]
    row = {
        "ref_mpjpe": ref0["mpjpe"], "our_mpjpe": our0["mpjpe"],
        "ref_mpeepe": ref0["mpeepe"], "our_mpeepe": our0["mpeepe"],
        "ref_fps": ref0["fps"], "our_fps": our0["fps"],
        "rel_diff_mpjpe": abs(our0["mpjpe"] - ref0["mpjpe"])
        / ref0["mpjpe"],
    }
    rv = [ref_runs[s]["mpjpe"] for s in args.seeds]
    ov = [our_runs[s]["mpjpe"] for s in args.seeds]
    sweep = {
        "frames": args.frames, "seeds": args.seeds,
        "reference": {str(s): {"mpjpe": ref_runs[s]["mpjpe"],
                               "mpeepe": ref_runs[s]["mpeepe"]}
                      for s in args.seeds},
        "ours": [our_runs[s] for s in args.seeds],
        "ref_mpjpe_min": min(rv), "ref_mpjpe_max": max(rv),
        "ref_mpjpe_mean": float(np.mean(rv)),
        "our_mpjpe_min": min(ov), "our_mpjpe_max": max(ov),
        "our_mpjpe_mean": float(np.mean(ov)),
        "distributions_overlap": (min(ov) <= max(rv)
                                  and min(rv) <= max(ov)),
    }
    merge(args.clip, args.config, args.frames, row, sweep)
    print(json.dumps({"config": args.config, "row": row,
                      "ref_mean": sweep["ref_mpjpe_mean"],
                      "our_mean": sweep["our_mpjpe_mean"]}, indent=1))


if __name__ == "__main__":
    main()
