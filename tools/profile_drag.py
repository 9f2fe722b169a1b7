"""Decompose batched drag throughput into per-section costs on the real TPU.

Times run_batch variants that isolate each pipeline section:

* full        — the bench configuration (rollout + while + bookkeeping)
* no_temporal — rollout removed (use_temporal=False)
* iter1       — max_iter=1: fixed per-frame cost (rollout + bookkeeping + 1 iter)
* batch sweep — dispatch/latency amortization

Usage: python tools/profile_drag.py [--frames 96] [--batches 512,1024,2048]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

START_FRAME = 2000


def build(batch, frames, *, use_temporal=True, max_iter=100):
    import jax
    import jax.numpy as jnp

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    here = os.path.dirname(os.path.abspath(__file__))
    model_dir = os.path.join(here, "..", "models/model_dancedb_example")
    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        model_dir, parents, resolve_config("6_trackers"),
        use_temporal=use_temporal, skeleton=skeleton, max_iter=max_iter,
    )
    seg = slice(START_FRAME, START_FRAME + frames)
    motion = encoding.encode_motion(
        offsets, pos[seg, 0, :], rots[seg], skeleton,
        height_indices=cfg.HEIGHT_INDICES,
    )
    norm = encoding.normalize(motion, means, stds)
    dqs = np.stack([np.roll(norm.dqs, -i, axis=0) for i in range(batch)])
    gp = np.stack([np.roll(norm.global_pos, -i, axis=0) for i in range(batch)])
    gr = np.stack([np.roll(norm.global_rot, -i, axis=0) for i in range(batch)])
    keys = jax.random.split(jax.random.PRNGKey(cfg.VAE_PARAM["seed"]), batch)
    heights0 = jnp.tile(jnp.asarray(motion.heights[0])[None], (batch, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), heights0)
    return engine, states, dqs, gp, gr


def timed(engine, states, dqs, gp, gr, reps=3):
    import jax

    _, warm = engine.run_batch(states, dqs, gp, gr)
    jax.block_until_ready(warm.pose)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _, out = engine.run_batch(states, dqs, gp, gr)
        jax.block_until_ready(out.pose)
        ts.append(time.time() - t0)
    iters = np.asarray(warm.iterations)
    return min(ts), float(iters.mean()), float(iters.max())


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--batches", type=str, default="512")
    args = ap.parse_args()
    frames = args.frames

    for batch in [int(b) for b in args.batches.split(",")]:
        for name, kw in (
            ("full", {}),
            ("no_temporal", dict(use_temporal=False)),
            ("iter1", dict(max_iter=1)),
            ("iter20", dict(max_iter=20)),
        ):
            engine, states, dqs, gp, gr = build(batch, frames, **kw)
            t, im, ix = timed(engine, states, dqs, gp, gr)
            fps = batch * frames / t
            print(f"B={batch:5d} {name:12s} {t*1e3:8.1f} ms "
                  f"{t/frames*1e3:7.2f} ms/frame  {fps:9.0f} f/s  "
                  f"iters mean {im:5.1f} max {ix:5.0f}", flush=True)


if __name__ == "__main__":
    main()
