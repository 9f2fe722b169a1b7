"""Where does the temporal train step spend its time?  (VERDICT r2 weak #2)

Times the full jitted step against its isolated pieces at B=4096 on the
current backend: frozen-VAE window re-encode (past / future), limb-noise
augmentation, and the transformer fwd+bwd+Adam alone.
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
    from dragposer_tpu.train import temporal as tt

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    _, _, parents, offsets, _ = encoding.info_from_bvh(bvh)
    statics = vae.build_statics(parents, cfg.VAE_PARAM)
    params = vae.init_params(jax.random.PRNGKey(0), parents, cfg.VAE_PARAM)
    rng = np.random.default_rng(0)

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.time() - t0) / REPS

    b = 4096
    tparam = dict(cfg.TEMPORAL_PARAM, batch_size=b)
    tparams = tmodel.init_params(jax.random.PRNGKey(2), tparam)
    topt = optax.adam(tparam["learning_rate"])
    topt_state = topt.init(tparams)
    p = len(tparam["past_frames"])
    f = len(tparam["future_frames"])
    dqs_past = jnp.asarray(rng.normal(size=(b, p, 176)), jnp.float32)
    dqs_future = jnp.asarray(rng.normal(size=(b, f, 176)), jnp.float32)
    disp_acc = jnp.asarray(rng.normal(size=(b, p, 3)), jnp.float32)
    heights = jnp.asarray(rng.normal(size=(b, p, 6)), jnp.float32)
    mean_dqs, std_dqs = jnp.zeros(176), jnp.ones(176)
    ml, sl = jnp.zeros(24), jnp.ones(24)
    key = jax.random.PRNGKey(3)

    # full step
    tstep = tt.make_train_step(params, statics, tparam, topt)
    dt = timeit(lambda: tstep(tparams, topt_state, key, dqs_past, dqs_future,
                              disp_acc, heights, mean_dqs, std_dqs, ml, sl))
    print(f"full step        : {dt*1e3:8.2f} ms ({b/dt:9.0f} windows/s)")

    # encode only (past + future, as the step does)
    @jax.jit
    def enc_both(k):
        k1, k2 = jax.random.split(k)
        lp = tt._encode_windows(params, statics, k1, dqs_past)
        lf = tt._encode_windows(params, statics, k2, dqs_future)
        return lp, lf

    dt_e = timeit(enc_both, key)
    print(f"encode past+fut  : {dt_e*1e3:8.2f} ms")

    @jax.jit
    def enc_fut(k):
        return tt._encode_windows(params, statics, k, dqs_future)

    dt_ef = timeit(enc_fut, key)
    print(f"encode future    : {dt_ef*1e3:8.2f} ms")

    # limb noise only
    @jax.jit
    def noise(k):
        return tt._limb_noise(k, dqs_past, mean_dqs, std_dqs,
                              tparam["limbs_random_prob"])

    dt_n = timeit(noise, key)
    print(f"limb noise       : {dt_n*1e3:8.2f} ms")

    # transformer fwd+bwd+adam on precomputed latents
    latents = jnp.asarray(rng.normal(size=(b, p, 24)), jnp.float32)
    latents_future = jnp.asarray(rng.normal(size=(b, f, 24)), jnp.float32)

    def make_txf(fused, param_override=None, layout="rows", remat=None,
                 fused_attn=False):
        pp = param_override or tparam

        @jax.jit
        def txf(tp, to, k):
            def loss(q):
                return tt._teacher_forced_loss(q, pp, latents, latents_future,
                                               disp_acc, heights, ml, sl,
                                               train=True, rng=k,
                                               fused_ff=fused,
                                               fused_attn=fused_attn,
                                               layout=layout)
            if remat is not None:
                loss = jax.checkpoint(loss, policy=remat)
            v, g = jax.value_and_grad(loss)(tp)
            up, to2 = topt.update(g, to, tp)
            return optax.apply_updates(tp, up), to2, v

        return txf

    dt_t = timeit(make_txf(False), tparams, topt_state, key)
    print(f"txf plain        : {dt_t*1e3:8.2f} ms ({b/dt_t:9.0f} windows/s)")
    dt_tf = timeit(make_txf(True), tparams, topt_state, key)
    print(f"txf fused-ff     : {dt_tf*1e3:8.2f} ms ({b/dt_tf:9.0f} windows/s)")
    dt_lane = timeit(make_txf(True, layout="lanes"), tparams, topt_state, key)
    print(f"txf lanes+fused  : {dt_lane*1e3:8.2f} ms ({b/dt_lane:9.0f} windows/s)")
    dt_la = timeit(make_txf(True, layout="lanes", fused_attn=True),
                   tparams, topt_state, key)
    print(f"lanes+fused+attn : {dt_la*1e3:8.2f} ms ({b/dt_la:9.0f} windows/s)")
    dt_lx = timeit(make_txf(False, layout="lanes"), tparams, topt_state, key)
    print(f"txf lanes xla-ff : {dt_lx*1e3:8.2f} ms ({b/dt_lx:9.0f} windows/s)")
    nodrop = dict(tparam, dropout=0.0)
    dt_t0 = timeit(make_txf(True, nodrop, layout="lanes"), tparams,
                   topt_state, key)
    print(f"lanes drop=0     : {dt_t0*1e3:8.2f} ms (threefry+mask cost = "
          f"{(dt_lane-dt_t0)*1e3:.2f} ms)")

    # forward only (lanes+fused, train mode)
    @jax.jit
    def fwd_only(tp, k):
        return tt._teacher_forced_loss(tp, tparam, latents, latents_future,
                                       disp_acc, heights, ml, sl,
                                       train=True, rng=k, fused_ff=True,
                                       layout="lanes")

    dt_f = timeit(fwd_only, tparams, key)
    print(f"fwd only lanes   : {dt_f*1e3:8.2f} ms (bwd+adam = "
          f"{(dt_lane-dt_f)*1e3:.2f} ms)")
    print(f"accounted        : {(dt_e+dt_n+dt_lane)*1e3:8.2f} ms of {dt*1e3:.2f}")


if __name__ == "__main__":
    main()
