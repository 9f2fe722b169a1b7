"""Training-step throughput on the real chip (VAE + temporal predictor).

The reference trains single-device torch (CPU here); this measures our
jitted train steps at the reference batch sizes and at a TPU-saturating
batch, in windows/second.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    from dragposer_tpu import config as cfg
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.models import temporal as tmodel
    from dragposer_tpu.models import vae
    from dragposer_tpu.ops.topology import Skeleton
    from dragposer_tpu.train import temporal as train_temporal
    from dragposer_tpu.train import vae as train_vae

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    statics = vae.build_statics(parents, cfg.VAE_PARAM)
    rng = np.random.default_rng(0)

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.time() - t0) / REPS

    # ---- VAE step (6-term loss incl. FK + grad-of-grad consecutive) ----
    vae_param = dict(cfg.VAE_PARAM)
    params = vae.init_params(jax.random.PRNGKey(0), parents, vae_param)
    optimizer = train_vae.make_optimizer(vae_param)
    opt_state = optimizer.init(params)
    step = train_vae.make_train_step(
        statics, skeleton, jnp.asarray(offsets), vae_param, True, optimizer)
    mean_dqs = jnp.zeros(176)
    std_dqs = jnp.ones(176)
    for b in (vae_param["batch_size"], 4096):
        dqs = jnp.asarray(rng.normal(size=(b, 2, 176, 1)), jnp.float32)
        disp = jnp.asarray(rng.normal(size=(b, 2, 3, 1)), jnp.float32)

        def run(p, o):
            return step(p, o, jax.random.PRNGKey(1), dqs, disp,
                        mean_dqs, std_dqs)

        dt = timeit(run, params, opt_state)
        print(f"vae train step  B={b:5d}: {dt * 1e3:8.2f} ms  "
              f"({b / dt:10.0f} windows/s)", flush=True)

    # ---- temporal step (seq2seq transformer, 15 past + 15 future) ----
    for b in (cfg.TEMPORAL_PARAM["batch_size"], 4096):
        tparam = dict(cfg.TEMPORAL_PARAM, batch_size=b)
        tparams = tmodel.init_params(jax.random.PRNGKey(2), tparam)
        topt = optax.adam(tparam["learning_rate"])
        topt_state = topt.init(tparams)
        tstep = train_temporal.make_train_step(params, statics, tparam, topt)
        p = len(tparam["past_frames"])
        f = len(tparam["future_frames"])
        dqs_past = jnp.asarray(rng.normal(size=(b, p, 176)), jnp.float32)
        dqs_future = jnp.asarray(rng.normal(size=(b, f, 176)), jnp.float32)
        disp_acc = jnp.asarray(rng.normal(size=(b, p, 3)), jnp.float32)
        heights = jnp.asarray(rng.normal(size=(b, p, 6)), jnp.float32)
        ml = jnp.zeros(24)
        sl = jnp.ones(24)

        def trun(tp, to):
            return tstep(tp, to, jax.random.PRNGKey(3), dqs_past, dqs_future,
                         disp_acc, heights, mean_dqs, std_dqs, ml, sl)

        dt = timeit(trun, tparams, topt_state)
        print(f"temporal step   B={b:5d}: {dt * 1e3:8.2f} ms  "
              f"({b / dt:10.0f} windows/s)", flush=True)


if __name__ == "__main__":
    main()
