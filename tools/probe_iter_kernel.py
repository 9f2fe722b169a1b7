"""Probe: fused Pallas iteration block vs the scan-based fast_iter block.

Times one sync-K block (K iterations of the batch-in-lanes Adam step)
through ``fast_iter.run_block`` (XLA scan) and
``iter_kernel.run_block_fused`` (one Pallas program per B-tile) across
batch sizes on the real chip.  B list via env ``BS`` (comma separated),
sync_k via ``K``.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS = [int(b) for b in os.environ.get("BS", "1024,2048,4096,8192").split(",")]
K = int(os.environ.get("K", "24"))
REPS = int(os.environ.get("REPS", "5"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.drag import fast_iter, iter_kernel
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops import quat
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    engine, _, _ = build_engine(
        os.path.join(root, "models/model_dancedb_example"), parents,
        resolve_config("6_trackers"), use_temporal=True, skeleton=sk)
    model, hyper = engine.model, engine.hyper
    ctx = fast_iter.make_context(model, sk, hyper)
    kctx = iter_kernel.make_kernel_context(ctx)

    for B in BS:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        L = model.means_latent.shape[0]
        J = sk.n_joints
        z0 = jax.random.normal(ks[0], (B, L)) * 0.7
        opt = jax.vmap(lambda z: eng._opt_init(z, J))(z0)
        gr = quat.normalize(jax.random.normal(ks[1], (B, 4)))
        tpos = jax.random.normal(ks[2], (B, J, 3)) * 0.3
        trot = quat.to_matrix(quat.normalize(
            jax.random.normal(ks[3], (B, J, 4))))
        tlat = jax.random.normal(ks[4], (B, L)) * 0.2
        active = jnp.ones((B,), bool)
        tposT = jnp.moveaxis(tpos, 0, -1)
        trotT = jnp.moveaxis(trot, 0, -1)

        class St:
            global_rot = gr

        @jax.jit
        def scan_block(o):
            return fast_iter.run_block(ctx, hyper, K, o, active, St,
                                       tposT, trotT, tlat, model,
                                       engine.statics, sk)

        @jax.jit
        def fused_block(o):
            return iter_kernel.run_block_fused(ctx, kctx, hyper, K, o,
                                               active, St, tposT, trotT,
                                               tlat)

        for name, fn in (("scan", scan_block), ("fused", fused_block)):
            try:
                r = fn(opt)
                jax.block_until_ready(r.latent)
            except Exception as e:  # noqa: BLE001
                print(f"B={B:5d} {name:6s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            ts = []
            for _ in range(REPS):
                t0 = time.time()
                r = fn(opt)
                jax.block_until_ready(r.latent)
                ts.append(time.time() - t0)
            ms = min(ts) * 1e3
            print(f"B={B:5d} {name:6s}: {ms:7.2f} ms/block "
                  f"({ms / K * 1e3:7.1f} us/iter, "
                  f"{ms / K / B * 1e6:6.1f} ns/lane-iter)", flush=True)


if __name__ == "__main__":
    main()
