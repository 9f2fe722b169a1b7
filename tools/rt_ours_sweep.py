"""Our-side realtime seed sweep driver (one process, compile amortized
across seeds).  Results land in a single JSON for later merge into
PARITY.json's ``realtime`` section (tools/realtime_h2h.py handles the
criterion).

  JAX_PLATFORMS=axon python tools/rt_ours_sweep.py --config 3_trackers \
      --seeds 2222 100 107 114 121 128 --out /tmp/rt_h2h_ours_3t.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_h2h import run_ours  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", default="example")
    ap.add_argument("--config", required=True)
    ap.add_argument("--frames", type=int, default=2000)
    ap.add_argument("--seeds", type=int, nargs="+", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for s in args.seeds:
        if str(s) in results:
            print(f"skip seed {s} (done)", flush=True)
            continue
        res = run_ours(args.clip, args.config, args.frames, s)
        results[str(s)] = {"seed": s, **res}
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"seed {s}: MPJPE {res['mpjpe']:.4f} "
              f"({res['fps']:.1f} fps)", flush=True)
    print("OURS_RT_SWEEP_DONE")


if __name__ == "__main__":
    main()
