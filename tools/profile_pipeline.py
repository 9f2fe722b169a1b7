"""Per-component cost of the production pipelined runtime, by ablation.

Monkeypatches one internal at a time (inner loop, rollout, output writes,
GT targets) with a cheap stand-in, re-traces ``run_batch_pipelined``
through the real entry point, and times end-to-end — so the numbers always
reflect the CURRENT pipeline structure.  NOTE: ablations change what XLA
can hoist (e.g. freezing the rollout makes it loop-invariant), so read
single deltas from 'full', not sums.

Tunnel caveat: ~29 ms per invocation is transport; each timed run is
~0.5-1 s so the skew is ≤5%.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "2048"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "240"))
SYNC_K = int(os.environ.get("BENCH_SYNC_K", "24"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.drag import fast_iter
    from dragposer_tpu.drag import pipeline as pl
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(here, "models/model_dancedb_example"), parents,
        resolve_config("6_trackers"), use_temporal=True, skeleton=skeleton)
    seg = slice(2000, 2000 + FRAMES)
    motion = encoding.encode_motion(offsets, pos[seg, 0, :], rots[seg],
                                    skeleton, height_indices=cfg.HEIGHT_INDICES)
    norm = encoding.normalize(motion, means, stds)
    dqs = np.stack([np.roll(norm.dqs, -i, axis=0) for i in range(BATCH)])
    gp = np.stack([np.roll(norm.global_pos, -i, axis=0) for i in range(BATCH)])
    gr = np.stack([np.roll(norm.global_rot, -i, axis=0) for i in range(BATCH)])
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    h0 = jnp.tile(jnp.asarray(motion.heights[0])[None], (BATCH, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)
    dqs, gp, gr = jax.device_put(dqs), jax.device_put(gp), jax.device_put(gr)

    def timed(tag):
        engine._run_pipelined = {}  # force a re-trace with current patches
        _, out = engine.run_batch_pipelined(states, dqs, gp, gr,
                                            sync_k=SYNC_K)
        jax.block_until_ready(out.pose)
        ts = []
        for _ in range(3):
            t0 = time.time()
            _, out = engine.run_batch_pipelined(states, dqs, gp, gr,
                                                sync_k=SYNC_K)
            jax.block_until_ready(out.pose)
            ts.append(time.time() - t0)
        fps = BATCH * FRAMES / min(ts)
        print(f"{tag:22s}: {min(ts):7.3f} s  ({fps:9.0f} frames/s)",
              flush=True)

    timed("full")

    # --- ablate the inner Adam loop: every lane "converges" instantly
    real_run_block = fast_iter.run_block

    def fake_run_block(ctx, hyper, sync_k, opt, lane_active, state, tpos,
                      trot, tlat, model, statics, skel):
        out = real_run_block(ctx, hyper, 1, opt, lane_active, state, tpos,
                             trot, tlat, model, statics, skel)
        return out._replace(loss_pos=jnp.zeros_like(out.loss_pos),
                            loss_rot=jnp.zeros_like(out.loss_rot))

    fast_iter.run_block = fake_run_block
    pl.fast_iter.run_block = fake_run_block
    timed("inner = 1 iter")
    fast_iter.run_block = real_run_block
    pl.fast_iter.run_block = real_run_block

    # --- ablate the rollout
    real_roll = eng._temporal_rollout_core_T

    def fake_roll(model, hyper, tparam, lat, disp_acc, heights, token0):
        w = hyper.temporal_future_window // hyper.sample_step  # noqa: F841
        n = hyper.temporal_future_window + 1
        return jnp.zeros((token0.shape[0], n, token0.shape[1]))

    eng._temporal_rollout_core_T = fake_roll
    timed("no rollout")
    eng._temporal_rollout_core_T = real_roll

    # --- ablate the output writes
    real_wf, real_w = pl._write_rows_flat, pl._write_rows
    pl._write_rows_flat = lambda flat, f, d, v, T: flat
    pl._write_rows = lambda a, f, d, v, T: a
    timed("no output writes")
    pl._write_rows_flat, pl._write_rows = real_wf, real_w

    # --- ablate GT target FK
    real_t = eng._eval_targets

    def fake_targets(model, skel, state, d, p, r):
        j = skel.n_joints
        return jnp.zeros((j, 3)), jnp.zeros((j, 3, 3))

    eng._eval_targets = fake_targets
    timed("no target FK")
    eng._eval_targets = real_t


if __name__ == "__main__":
    main()
