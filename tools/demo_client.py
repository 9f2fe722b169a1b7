"""Scripted client demo session — BVHPlayback trackers → live reconstruction.

Replicates the reference Unity demo (``Applications/FBIK.cs`` +
``BVH/BVHPlayback.cs``) headlessly: the example animation drives the
trackers, the engine reconstructs every frame, the client smooths and
root-adjusts, and mid-session the mask is edited live (6 → 3 trackers → 6)
exactly as the FBIK UI allows.  Reports per-frame latency and the fps
equivalent (the reference client targets 60 fps, ``BVHPlayback.cs:12,20``).

Usage: python tools/demo_client.py [--frames 240] [--start 2000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

EXAMPLE_BVH = "/root/reference/python/data/example/eval/example.bvh"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--start", type=int, default=2000)
    ap.add_argument("--models", type=str,
                    default=os.path.join(REPO, "models/model_dancedb_example"))
    args = ap.parse_args()

    from dragposer_tpu.client.driver import ClientDragPoser
    from dragposer_tpu.client.playback import BVHPlayback

    t0 = time.time()
    poser = ClientDragPoser(EXAMPLE_BVH, args.models,
                            temporal_future_window=60, max_iter=10,
                            log_path=None)
    playback = BVHPlayback(EXAMPLE_BVH, poser.retargeter)
    playback.frame = args.start
    playback.update_trackers()
    poser.initialize_pose()
    print(f"init (models + retarget calibration + engine compile): "
          f"{time.time() - t0:.1f}s", flush=True)

    dt = 1.0 / 60.0
    ee6 = [0, 3, 7, 13, 17, 21]
    times, errs = [], []
    first_ms = None
    for k in range(args.frames):
        if k == args.frames // 3:          # live mask edit: 3-tracker mode
            poser.mask[:] = 0
            poser.mask[[13, 17, 21]] = 1
        if k == 2 * args.frames // 3:      # back to 6-tracker
            poser.mask[:] = 0
            poser.mask[ee6] = 1
        playback.update_trackers()
        t1 = time.time()
        poser.step(dt)
        ms = (time.time() - t1) * 1e3
        if first_ms is None:
            first_ms = ms
        times.append(ms)
        pos, _ = poser.world_pose()
        idx = np.nonzero(poser.mask > 0.1)[0]
        tgt = np.stack([poser.retargeter.get_retarget(int(i))[0] for i in idx])
        errs.append(float(np.linalg.norm(pos[idx] - tgt, axis=-1).mean()))

    times = np.asarray(times)
    steady = times[5:]
    print(f"first frame: {first_ms:.1f} ms (prewarmed at init)")
    print(f"steady state: mean {steady.mean():.2f} ms, p95 "
          f"{np.percentile(steady, 95):.2f} ms -> "
          f"{1000.0 / steady.mean():.0f} fps equivalent "
          f"(target 60 fps = 16.7 ms)")
    print(f"first/steady ratio: {first_ms / steady.mean():.2f}x")
    print(f"tracker position error: mean {np.mean(errs) * 100:.1f} cm "
          f"(steady {np.mean(errs[10:]) * 100:.1f} cm)")


if __name__ == "__main__":
    main()
