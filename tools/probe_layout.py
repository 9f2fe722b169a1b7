"""Clean per-iteration cost of the drag loss fwd+bwd: current vmapped
layout vs a transposed batch-in-lanes prototype.

Times scans at two lengths and differences them, cancelling the ~29 ms
per-invocation tunnel constant (see profile_iter.py notes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(os.environ.get("B", "1024"))
N1, N2 = 400, 4000


def main():
    import jax
    import jax.numpy as jnp
    from jax import nn

    jax.config.update("jax_compilation_cache_dir", "/tmp/dragposer_jax_cache")

    from dragposer_tpu import config as cfg
    from dragposer_tpu.cli.eval_drag import build_engine, resolve_config
    from dragposer_tpu.data import encoding
    from dragposer_tpu.drag import engine as eng
    from dragposer_tpu.io.bvh import BVH
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
    L = model.means_latent.shape[0]
    lat = jax.random.normal(key, (B, L))
    gp = jnp.zeros((B, 3))
    gr = jnp.tile(jnp.asarray([1.0, 0, 0, 0])[None], (B, 1))
    tpos = jax.random.normal(key, (B, 22, 3)) * 0.1
    trot = jnp.tile(jnp.eye(3)[None, None], (B, 22, 1, 1))
    tlat = jnp.zeros_like(lat)

    def delta_time(step, x0):
        def runner(n):
            @jax.jit
            def run(x):
                def body(c, _):
                    return step(c), None
                out, _ = jax.lax.scan(body, x, None, length=n)
                return out
            r = run(x0)
            jax.block_until_ready(r)
            ts = []
            for _ in range(3):
                t0 = time.time()
                r = run(x0)
                jax.block_until_ready(r)
                ts.append(time.time() - t0)
            return min(ts)
        t1, t2 = runner(N1), runner(N2)
        return (t2 - t1) / (N2 - N1) * 1e6

    # --- current layout: vmapped per-lane value_and_grad
    def cur(z):
        g = jax.vmap(lambda zz, g1, g2, tp, tr, tl: jax.grad(
            lambda l: eng._drag_loss(l, model, statics, skeleton, hyper,
                                     g1, g2, tp, tr, tl)[0])(zz))(
            z, gp, gr, tpos, trot, tlat)
        return z - 1e-6 * g

    print(f"current layout       : {delta_time(cur, lat):8.2f} us/iter",
          flush=True)

    # --- transposed batch-in-lanes prototype
    folded = model.decoder
    cpj = 4
    J = 22
    # component-major permutation of the 88 quat channels + 3 disp rows
    perm = np.concatenate([np.arange(J) * 4 + c for c in range(4)])
    W1 = jnp.asarray(folded["ws"][0])          # (40, L)
    W2 = jnp.asarray(folded["ws"][1])          # (60, 40)
    W3 = np.asarray(folded["ws"][2])           # (92, 60)
    b1 = jnp.asarray(folded["bs"][0])[:, None]
    b2 = jnp.asarray(folded["bs"][1])[:, None]
    b3 = np.asarray(folded["bs"][2])
    W3p = jnp.asarray(np.concatenate((W3[:88][perm], W3[88:91]), 0))  # (91,60)
    b3p = jnp.asarray(np.concatenate((b3[:88][perm], b3[88:91]))[:, None])
    mean_q = np.asarray(model.mean_dqs).reshape(-1, 8)[:, :cpj].reshape(-1)
    std_q = np.asarray(model.std_dqs).reshape(-1, 8)[:, :cpj].reshape(-1)
    mq = jnp.asarray(mean_q[perm].reshape(4, J, 1))
    sq = jnp.asarray(std_q[perm].reshape(4, J, 1))
    md = jnp.asarray(np.asarray(model.mean_disp)[:, None])
    sd = jnp.asarray(np.asarray(model.std_disp)[:, None])
    P = np.zeros((J, J), np.float32)
    for j, p in enumerate(np.asarray(skeleton.parents)):
        P[j, p] = 1.0
    P = jnp.asarray(P)
    A = jnp.asarray(np.asarray(skeleton.ancestors, np.float32))
    offs = jnp.asarray(np.asarray(skeleton.offsets, np.float32).T[:, :, None])  # (3,J,1)
    w_pos = jnp.asarray((np.asarray(model.mask) *
                         np.asarray(model.weights)[:, 0])[:, None])
    w_rot = jnp.asarray((np.asarray(model.mask) *
                         np.asarray(model.weights)[:, 1])[:, None])
    n_ee = float(np.maximum(np.asarray(model.mask).sum(), 1.0))
    grT = jnp.tile(jnp.asarray([[1.0], [0], [0], [0]]), (1, B))  # (4,B)
    tposT = jnp.asarray(np.moveaxis(np.asarray(tpos), 0, -1))    # (22,3,B)
    trotT = jnp.asarray(np.moveaxis(np.asarray(trot), 0, -1))    # (22,3,3,B)
    tlatT = jnp.zeros((L, B))

    def qmul(aw, ax, ay, az, bw, bx, by, bz):
        return (aw*bw - ax*bx - ay*by - az*bz,
                aw*bx + ax*bw + ay*bz - az*by,
                aw*by - ax*bz + ay*bw + az*bx,
                aw*bz + ax*by - ay*bx + az*bw)

    def qrot(qw, qx, qy, qz, vx, vy, vz):
        # v + 2 q.w (q.xyz × v) + 2 (q.xyz × (q.xyz × v))
        cx1 = qy*vz - qz*vy
        cy1 = qz*vx - qx*vz
        cz1 = qx*vy - qy*vx
        cx2 = qy*cz1 - qz*cy1
        cy2 = qz*cx1 - qx*cz1
        cz2 = qx*cy1 - qy*cx1
        return (vx + 2*(qw*cx1 + cx2), vy + 2*(qw*cy1 + cy2),
                vz + 2*(qw*cz1 + cz2))

    def loss_T(z):  # z (L, B) -> total (B,)
        h = nn.leaky_relu(W1 @ z + b1)
        h = nn.leaky_relu(W2 @ h + b2)
        h = W3p @ h + b3p                       # (91, B)
        x = h[:88].reshape(4, J, -1) * sq + mq  # (4, J, B)
        ss = jnp.sum(x * x, axis=0)
        r = jax.lax.rsqrt(ss)[None]
        u = x * r                               # unit quats, planes (4,J,B)
        disp = h[88:91] * sd + md               # (3, B)
        rw, rx, ry, rz = grT[0], grT[1], grT[2], grT[3]      # (B,)
        q0 = u[:, 0, :]                                       # (4, B)
        Ww, Wx, Wy, Wz = qmul(rw, rx, ry, rz, q0[0], q0[1], q0[2], q0[3])
        ww, wx, wy, wz = qmul(Ww[None], Wx[None], Wy[None], Wz[None],
                              u[0], u[1], u[2], u[3])         # (J, B)
        row0 = jnp.arange(J)[:, None] == 0
        ww = jnp.where(row0, Ww[None], ww)
        wx = jnp.where(row0, Wx[None], wx)
        wy = jnp.where(row0, Wy[None], wy)
        wz = jnp.where(row0, Wz[None], wz)
        wdx, wdy, wdz = qrot(Ww, Wx, Wy, Wz, disp[0], disp[1], disp[2])
        pw, px_, py_, pz_ = P @ ww, P @ wx, P @ wy, P @ wz
        cx, cy, cz = qrot(pw, px_, py_, pz_, offs[0], offs[1], offs[2])
        posx = A @ cx + wdx[None]
        posy = A @ cy + wdy[None]
        posz = A @ cz + wdz[None]
        dx = posx - tposT[:, 0]
        dy = posy - tposT[:, 1]
        dz = posz - tposT[:, 2]
        loss_pos = jnp.sum(w_pos * (dx*dx + dy*dy + dz*dz), 0) / (n_ee * 3.0)
        # rotation matrices (9 planes)
        m00 = 1 - 2*(wy*wy + wz*wz); m01 = 2*(wx*wy - ww*wz); m02 = 2*(wx*wz + ww*wy)
        m10 = 2*(wx*wy + ww*wz); m11 = 1 - 2*(wx*wx + wz*wz); m12 = 2*(wy*wz - ww*wx)
        m20 = 2*(wx*wz - ww*wy); m21 = 2*(wy*wz + ww*wx); m22 = 1 - 2*(wx*wx + wy*wy)
        ms = [m00, m01, m02, m10, m11, m12, m20, m21, m22]
        lr_ = 0.0
        for k, m in enumerate(ms):
            d = m - trotT[:, k // 3, k % 3]
            lr_ = lr_ + w_rot * (d * d)
        loss_rot = jnp.sum(lr_, 0) / (n_ee * 9.0)
        loss_t = jnp.mean((z - tlatT) ** 2, 0)
        return jnp.sum(loss_pos + hyper.lambda_rot * loss_rot
                       + hyper.lambda_temporal * loss_t)

    gfn = jax.grad(loss_T)

    def trans(z):
        return z - 1e-6 * gfn(z)

    latT = lat.T
    print(f"transposed layout    : {delta_time(trans, latT):8.2f} us/iter",
          flush=True)


if __name__ == "__main__":
    main()
