"""Server-side multi-avatar realtime throughput (RealtimeBatch).

Chains N frame steps on device (results fetched once at the end) — the
serving-side number; a remote client additionally pays its own transport.
Prints avatars sustainable at 60/90 fps.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AVATARS = int(os.environ.get("AVATARS", "256"))
FRAMES = int(os.environ.get("FRAMES", "120"))
# STAGGER=1: spread avatar window phases at spawn (RealtimeBatch
# init_drag_pose(stagger_phases=True)) so the W-frame rollout runs as a
# small sub-batch every frame instead of the whole crowd on the same
# frame — compare the p99/max frame time, not just the mean.
STAGGER = bool(int(os.environ.get("STAGGER", "0")))


def main():
    import jax

    from dragposer_tpu.runtime.realtime import RealtimeSession

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = RealtimeSession(log_path=None)
    s.set_reference_skeleton(
        "/root/reference/python/data/example/eval/example.bvh")
    s.load_models(os.path.join(here, "models/model_dancedb_example"))
    j = s.skeleton.n_joints
    mask = np.zeros(j, np.float32)
    mask[[0, 3, 7, 13, 17, 21]] = 1.0
    w = np.ones((j, 2), np.float32) * np.asarray([1.0, 0.01])
    w[0] = [10.0, 10.0]
    s.set_mask_and_weights(mask, w)
    s.set_optim_params(1e-4, 0.01, 10, 0.01)   # realtime budget (main.cpp:28)
    s.init_drag_pose(np.zeros((1, 3)), np.asarray([[1.0, 0, 0, 0]]))
    batch = s.make_batch(AVATARS)
    batch.init_drag_pose(np.zeros((AVATARS, 3)),
                         np.tile([[1.0, 0, 0, 0]], (AVATARS, 1)),
                         stagger_phases=STAGGER)

    tpos = np.zeros((AVATARS, j, 3), np.float32)
    tpos[:, 13] = [0.0, 0.05, 0.65]
    trot = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (AVATARS, j, 1))
    tpos_d, trot_d = jax.device_put((tpos, trot))
    model_b = jax.device_put(batch._model_b())

    state = batch._state
    # warmup
    state, local, gp = batch._step(model_b, state, tpos_d, trot_d)
    jax.block_until_ready(local)

    t0 = time.time()
    for _ in range(FRAMES):
        state, local, gp = batch._step(model_b, state, tpos_d, trot_d)
    jax.block_until_ready(local)
    dt = (time.time() - t0) / FRAMES

    # per-frame spike stats (synced each frame: a real-time server must
    # meet the deadline EVERY frame — the window-boundary rollout spike
    # is invisible in the chained mean)
    per = []
    for _ in range(FRAMES):
        f0 = time.time()
        state, local, gp = batch._step(model_b, state, tpos_d, trot_d)
        jax.block_until_ready(local)
        per.append(time.time() - f0)
    per = np.asarray(per)
    p99 = float(np.quantile(per, 0.99))
    print(f"avatars={AVATARS} stagger={int(STAGGER)}: "
          f"{dt * 1e3:.2f} ms/frame server-side "
          f"({AVATARS / dt:.0f} avatar-frames/s; "
          f"{int(AVATARS * min(1.0, (1 / 60) / dt))} avatars at 60 fps); "
          f"synced mean {per.mean() * 1e3:.2f} "
          f"p99 {p99 * 1e3:.2f} max {per.max() * 1e3:.2f} ms "
          f"(deadline misses >16.7ms: {int((per > 1 / 60).sum())}/{FRAMES})")


if __name__ == "__main__":
    main()
