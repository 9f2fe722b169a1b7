"""Micro-profile the drag Adam iteration at batch 512 on the real chip.

Times scans of N iterations of progressively larger pieces of the per-
iteration graph to locate where the ~50 µs/iter goes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "512"))
N = int(os.environ.get("N", "400"))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.models import vae
    from dragposer_tpu.ops import fk, quat
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, means, stds = build_engine(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models/model_dancedb_example"),
        parents, resolve_config("6_trackers"), use_temporal=True,
        skeleton=skeleton)
    model, statics, hyper = engine.model, engine.statics, engine.hyper

    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (B, model.means_latent.shape[0]))
    gp = jnp.zeros((B, 3))
    gr = jnp.tile(jnp.asarray([1.0, 0, 0, 0])[None], (B, 1))
    tpos = jax.random.normal(key, (B, 22, 3)) * 0.1
    trot = jnp.tile(jnp.eye(3)[None, None], (B, 22, 1, 1))
    tlat = jnp.zeros_like(lat)

    def timed(name, step):
        @jax.jit
        def run(x0):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, x0, None, length=N)
            return out
        x = lat
        r = run(x)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = run(x)
            jax.block_until_ready(r)
            ts.append(time.time() - t0)
        print(f"{name:28s}: {min(ts) / N * 1e6:8.2f} us/iter", flush=True)

    vb = jax.vmap

    # 1. decoder forward only
    def dec_only(z):
        p, d = vb(lambda zz: vae.decode_folded(
            model.decoder, zz[None], model.mean_dqs, model.std_dqs))(z)
        return z + 1e-6 * p.sum(axis=(1, 2, 3))[:, None]

    timed("decode fwd", dec_only)

    # 2. full loss forward only (no grad)
    def loss_fwd(z):
        total, aux = vb(lambda zz, g1, g2, tp, tr, tl: eng._drag_loss(
            zz, model, statics, skeleton, hyper, g1, g2, tp, tr, tl))(
            z, gp, gr, tpos, trot, tlat)
        return z + 1e-6 * total[:, None]

    timed("loss fwd", loss_fwd)

    # 3. loss + grad
    def loss_grad(z):
        g = vb(lambda zz, g1, g2, tp, tr, tl: jax.grad(
            lambda l: eng._drag_loss(l, model, statics, skeleton, hyper,
                                     g1, g2, tp, tr, tl)[0])(zz))(
            z, gp, gr, tpos, trot, tlat)
        return z - 1e-6 * g

    timed("loss fwd+bwd", loss_grad)

    # 4. the real _opt_body via carry of latent only (approx: full carry)
    carry0 = vb(lambda l: eng._opt_init(l, skeleton.n_joints))(lat)

    @jax.jit
    def run_full(c0):
        def body(c, _):
            new = vb(lambda cc, g1, g2, tp, tr, tl: eng._opt_body(
                cc, model, statics, skeleton, hyper, g1, g2, tp, tr, tl))(
                c, gp, gr, tpos, trot, tlat)
            return new, None
        out, _ = jax.lax.scan(body, c0, None, length=N)
        return out

    r = run_full(carry0)
    jax.block_until_ready(r.latent)
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = run_full(carry0)
        jax.block_until_ready(r.latent)
        ts.append(time.time() - t0)
    print(f"{'full _opt_body':28s}: {min(ts) / N * 1e6:8.2f} us/iter",
          flush=True)

    # 5. full _opt_body + select masking (the pipeline istep)
    from dragposer_tpu.drag import pipeline as pl

    @jax.jit
    def run_istep(c0):
        def body(c, _):
            active = vb(lambda cc: eng._opt_cond(cc, hyper))(c)
            new = vb(lambda cc, g1, g2, tp, tr, tl: eng._opt_body(
                cc, model, statics, skeleton, hyper, g1, g2, tp, tr, tl))(
                c, gp, gr, tpos, trot, tlat)
            return pl._select(active, new, c), None
        out, _ = jax.lax.scan(body, c0, None, length=N)
        return out

    r = run_istep(carry0)
    jax.block_until_ready(r.latent)
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = run_istep(carry0)
        jax.block_until_ready(r.latent)
        ts.append(time.time() - t0)
    print(f"{'istep (body+select)':28s}: {min(ts) / N * 1e6:8.2f} us/iter",
          flush=True)


if __name__ == "__main__":
    main()


def variants():
    """Layout experiments for the decode path."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    skeleton = Skeleton.build(parents, offsets, bvh.names)
    engine, _, _ = build_engine(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models/model_dancedb_example"),
        parents, resolve_config("6_trackers"), use_temporal=True,
        skeleton=skeleton)
    model = engine.model
    folded = model.decoder
    L = model.means_latent.shape[0]
    cpj = 4
    mean_q = np.asarray(model.mean_dqs).reshape(-1, 8)[:, :cpj].reshape(-1)
    std_q = np.asarray(model.std_dqs).reshape(-1, 8)[:, :cpj].reshape(-1)
    mean_q, std_q = jnp.asarray(mean_q), jnp.asarray(std_q)
    # group matrix: (88, 88) summing each quat's 4 squares into all 4 slots
    G = np.zeros((88, 88), np.float32)
    for j in range(22):
        G[j * 4:(j + 1) * 4, j * 4:(j + 1) * 4] = 1.0
    G = jnp.asarray(G)

    import time as _t
    from jax import nn

    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (B, L))

    def timed(name, step):
        @jax.jit
        def run(x0):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, x0, None, length=N)
            return out
        r = run(lat)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = _t.time()
            r = run(lat)
            jax.block_until_ready(r)
            ts.append(_t.time() - t0)
        print(f"{name:28s}: {min(ts) / N * 1e6:8.2f} us/iter", flush=True)

    def mats(z):  # (B, L) -> (B, 92) raw pre-norm
        h = z
        for l in range(3):
            h = jnp.einsum("bi,oi->bo", h, folded["ws"][l],
                           precision="highest") + folded["bs"][l]
            if l != 2:
                h = nn.leaky_relu(h)
        return h

    timed("flat matmuls only", lambda z: z + 1e-6 * mats(z).sum(-1, keepdims=True))

    def flat_reshape(z):
        h = mats(z)
        x = h[:, :-cpj] * std_q + mean_q
        q = x.reshape(-1, 22, 4)
        n = jnp.linalg.norm(q, axis=-1, keepdims=True)
        x = (q / n).reshape(-1, 88)
        x = (x - mean_q) / std_q
        return z + 1e-6 * x.sum(-1, keepdims=True)

    timed("flat + reshape-norm", flat_reshape)

    def flat_gmat(z):
        h = mats(z)
        x = h[:, :-cpj] * std_q + mean_q
        ss = jnp.einsum("bi,ij->bj", x * x, G, precision="highest")
        x = x * jax.lax.rsqrt(ss)
        x = (x - mean_q) / std_q
        return z + 1e-6 * x.sum(-1, keepdims=True)

    timed("flat + Gmat-norm", flat_gmat)

    def flat_strided(z):
        h = mats(z)
        x = h[:, :-cpj] * std_q + mean_q
        q2 = x * x
        ss = q2[:, 0::4] + q2[:, 1::4] + q2[:, 2::4] + q2[:, 3::4]  # (B,22)
        x = x * jnp.repeat(jax.lax.rsqrt(ss), 4, axis=1)
        x = (x - mean_q) / std_q
        return z + 1e-6 * x.sum(-1, keepdims=True)

    timed("flat + strided-norm", flat_strided)


if __name__ == "__main__" and os.environ.get("VARIANTS"):
    variants()
