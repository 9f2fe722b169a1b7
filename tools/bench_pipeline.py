"""Compare run_batch vs run_batch_pipelined on the real chip (sync_k sweep)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "512"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "240"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_dir = os.path.join(here, "models/model_dancedb_example")
    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        model_dir, parents, resolve_config("6_trackers"),
        use_temporal=True, skeleton=skeleton,
    )
    seg = slice(2000, 2000 + FRAMES)
    motion = encoding.encode_motion(offsets, pos[seg, 0, :], rots[seg],
                                    skeleton, height_indices=cfg.HEIGHT_INDICES)
    norm = encoding.normalize(motion, means, stds)
    dqs = np.stack([np.roll(norm.dqs, -i, axis=0) for i in range(BATCH)])
    gp = np.stack([np.roll(norm.global_pos, -i, axis=0) for i in range(BATCH)])
    gr = np.stack([np.roll(norm.global_rot, -i, axis=0) for i in range(BATCH)])
    keys = jax.random.split(jax.random.PRNGKey(cfg.VAE_PARAM["seed"]), BATCH)
    h0 = jnp.tile(jnp.asarray(motion.heights[0])[None], (BATCH, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)
    dqs, gp, gr = jax.device_put(dqs), jax.device_put(gp), jax.device_put(gr)
    total = BATCH * FRAMES

    def timeit(fn):
        _, w = fn()
        jax.block_until_ready(w.pose)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            _, o = fn()
            jax.block_until_ready(o.pose)
            ts.append(time.time() - t0)
        return total / min(ts), total / float(np.median(ts))

    peak, med = timeit(lambda: engine.run_batch(states, dqs, gp, gr))
    print(f"run_batch           : peak {peak:9.0f} f/s  median {med:9.0f} f/s",
          flush=True)
    for k in (8, 16, 24, 32, 48):
        peak, med = timeit(
            lambda: engine.run_batch_pipelined(states, dqs, gp, gr, sync_k=k))
        print(f"pipelined sync_k={k:3d}: peak {peak:9.0f} f/s  median {med:9.0f} f/s",
              flush=True)


if __name__ == "__main__":
    main()
