"""Isolate per-block cost of the pipelined loop's components (current
structure: fast_iter inner loop + sync bookkeeping).

Runs a FIXED number of blocks (scan instead of while) with pieces stubbed
out, timing each variant.  Numerics are irrelevant here.  NOTE: the
tunneled dev TPU adds ~29 ms per invocation; at 40 blocks that inflates
every number by ~0.7 ms/block — compare variants, not absolutes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "240"))
BLOCKS = 40
K = int(os.environ.get("BENCH_SYNC_K", "32"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")
    import jax.numpy as jnp

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.drag import fast_iter
    from dragposer_tpu.drag import pipeline as pl
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
    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    h0 = jnp.tile(jnp.asarray(motion.heights[0])[None], (BATCH, 1))
    states = jax.vmap(
        lambda k, d, g, r, h: eng.init_state(
            engine.model, engine.statics, engine.hyper, k,
            d[0][:, None], g[0], r[0], h,
        )
    )(keys, jnp.asarray(dqs), jnp.asarray(gp), jnp.asarray(gr), h0)
    dqs, gp, gr = jax.device_put(dqs), jax.device_put(gp), jax.device_put(gr)

    model, statics, hyper, tparam = (engine.model, engine.statics,
                                     engine.hyper, engine.tparam)
    B, T = BATCH, FRAMES
    n_joints = skeleton.n_joints
    ctx = fast_iter.make_context(model, skeleton, hyper)

    def make_runner(do_inner, do_begin, do_targets, do_finish, do_outs):
        def begin_all(state_b):
            return jax.vmap(
                lambda s: eng._begin_frame(model, hyper, tparam, s, True)
            )(state_b)

        def targets_all(state_b, f_idx):
            take = jax.vmap(lambda a, i: jax.lax.dynamic_index_in_dim(
                a, i, 0, keepdims=False))
            d, p, r = take(dqs, f_idx), take(gp, f_idx), take(gr, f_idx)
            return jax.vmap(lambda s, dd, pp, rr: eng._eval_targets(
                model, skeleton, s, dd, pp, rr))(state_b, d, p, r)

        opt_cond_b = jax.vmap(lambda c: eng._opt_cond(c, hyper))
        opt_init_b = jax.vmap(lambda lat: eng._opt_init(lat, n_joints))

        def finish_b(state_b, opt, tbuf, tpos):
            return jax.vmap(lambda s, c, tb, tp: eng._finish_frame(
                model, hyper, s, c, tb, tp))(state_b, opt, tbuf, tpos)

        @jax.jit
        def run(states):
            tbuf0, tlat0 = begin_all(states)
            tpos0, trot0 = targets_all(states, jnp.zeros((B,), jnp.int32))
            opt0 = opt_init_b(states.latent)
            outs0 = eng.FrameOutput(
                pose=jnp.zeros((B, T, n_joints * 4)),
                global_pos=jnp.zeros((B, T, 3)),
                iterations=jnp.zeros((B, T), jnp.int32),
                loss_pos=jnp.zeros((B, T)),
                loss_rot=jnp.zeros((B, T)),
            )
            c0 = pl._PipeCarry(opt0, states, tbuf0, tlat0, tpos0, trot0,
                               jnp.zeros((B,), jnp.int32), outs0)

            def body(c, _):
                opt = c.opt
                lane_active = c.frame < T
                if do_inner:
                    opt = fast_iter.run_block(
                        ctx, hyper, K, opt, lane_active, c.state,
                        c.tpos, c.trot, c.target_latent, model, statics,
                        skeleton)
                done = (~opt_cond_b(opt)) & lane_active
                state = c.state
                if do_finish:
                    new_state, out = finish_b(c.state, opt, c.target_buffer,
                                              c.tpos)
                    state = pl._select(done, new_state, c.state)
                outs = c.outs
                if do_outs and do_finish:
                    outs = pl._write_rows(c.outs, jnp.minimum(c.frame, T - 1),
                                          done, out, T)
                frame = c.frame + done.astype(jnp.int32)
                f_next = jnp.minimum(frame, T - 1)
                tbuf, tlat = c.target_buffer, c.target_latent
                if do_begin:
                    tb_new, tl_new = begin_all(state)
                    tbuf = pl._select(done, tb_new, tbuf)
                    tlat = pl._select(done, tl_new, tlat)
                tpos, trot = c.tpos, c.trot
                if do_targets:
                    tp_new, tr_new = targets_all(state, f_next)
                    tpos = pl._select(done, tp_new, tpos)
                    trot = pl._select(done, tr_new, trot)
                opt = pl._select(done, opt_init_b(state.latent), opt)
                return pl._PipeCarry(opt, state, tbuf, tlat, tpos, trot,
                                     frame, outs), None

            final, _ = jax.lax.scan(body, c0, None, length=BLOCKS)
            return final

        return run

    variants = [
        ("full", (True, True, True, True, True)),
        ("no inner loop", (False, True, True, True, True)),
        ("no begin(rollout)", (True, False, True, True, True)),
        ("no finish+outs", (True, True, True, False, False)),
        ("no outs write", (True, True, True, True, False)),
        ("no targets", (True, True, False, True, True)),
        ("inner only", (True, False, False, False, False)),
    ]
    for name, flags in variants:
        run = make_runner(*flags)
        f = run(states)
        jax.block_until_ready(f.frame)
        ts = []
        for _ in range(3):
            t0 = time.time()
            f = run(states)
            jax.block_until_ready(f.frame)
            ts.append(time.time() - t0)
        per_block = min(ts) / BLOCKS * 1e3
        print(f"{name:20s}: {per_block:7.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
