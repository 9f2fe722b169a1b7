"""Batch-in-lanes drag iteration: the hot Adam step in transposed layout.

The vmapped per-lane loss (``engine._drag_loss``) computes on arrays whose
minor (TPU lane) dimension is a joint/quat axis of size 3–22 — at most 17%
of each 128-wide vector register does useful work.  This module evaluates
the SAME math with the batch in the minor dimension: every tensor is a set
of per-joint *component planes* of shape (J, B) (or (L, B) for latents), so
elementwise quaternion algebra runs at full lane width and the skeleton
gathers (parent lookup, ancestor accumulation) become (J, J) @ (J, B)
matmuls on the MXU.  Measured 3.1× per iteration at batch 1024
(``tools/probe_layout.py``: 35.4 → 11.4 µs fwd+bwd).

The quat-channel order is permuted to component-major ([w0..wJ | x0..xJ |
y0..yJ | z0..zJ]) by permuting the OUTPUT ROWS of the folded decoder's last
matmul — free at runtime.  The backward pass is jax autodiff of the
transposed forward (per-lane totals are lane-separable, so the gradient of
the batch sum is the per-lane gradient).

Semantics mirror ``engine._drag_loss`` / ``engine._opt_body`` /
``engine._opt_cond`` exactly (formula-level; reductions associate
differently, so results are fp-equivalent, not bitwise).  Constraints are
NOT supported here — the pipeline falls back to the vmapped path when
``hyper.constraints`` is non-empty.

Reference behavior: ``python/src/drag_pose.py:66-194`` (loss),
``:218`` (fresh Adam), ``:300-304`` (stop rule).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.drag import engine as eng
from dragposer_tpu.models import skeleton_nn
from dragposer_tpu.ops.topology import Skeleton


class FastContext(NamedTuple):
    """Loop-invariant constants in transposed/component-major layout."""

    W1: Any        # (H1, L)
    b1: Any        # (H1, 1)
    W2: Any        # (H2, H1)
    b2: Any        # (H2, 1)
    W3p: Any       # (4J+3, H2) rows permuted component-major, then disp
    b3p: Any       # (4J+3, 1)
    sq: Any        # (4, J, 1) quat stds, component-major
    mq: Any        # (4, J, 1)
    sd: Any        # (3, 1) displacement std
    md: Any        # (3, 1)
    P: Any         # (J, J) parent one-hot: (P @ plane)[j] = plane[parent[j]]
    A: Any         # (J, J) ancestor matrix
    offs: Any      # (3, J, 1) bone offsets, component planes
    w_pos: Any     # (J, 1) mask * position weights
    w_rot: Any     # (J, 1) mask * rotation weights
    n_ee: Any      # () traced active-joint count
    unperm: Any    # (4J,) static indices: comp-major -> interleaved wxyz
    dq_gather: Any # (J*8, 4J) constant 0/1 matrix: x (B, J*8) @ dq_gather
                   #       -> (B, 4J) comp-major quat channels (a TPU lane
                   #       gather with 88 arbitrary indices lowers as a slow
                   #       serialized gather; the one-hot matmul is MXU)


def make_context(model: eng.DragModel, skeleton: Skeleton,
                 hyper: eng.DragHyper) -> FastContext:
    """Build the transposed constants (traced ops on the model arrays —
    XLA hoists them out of the block loop as invariants)."""
    folded = model.decoder
    assert isinstance(folded, dict) and "ws" in folded, \
        "fast path requires the folded decoder"
    J = skeleton.n_joints
    perm = np.concatenate([np.arange(J) * 4 + c for c in range(4)])
    unperm = np.argsort(perm)
    dq_perm = np.concatenate([np.arange(J) * 8 + c for c in range(4)])
    dq_gather = np.zeros((J * 8, 4 * J), np.float32)
    dq_gather[dq_perm, np.arange(4 * J)] = 1.0

    W3 = folded["ws"][2]
    b3 = folded["bs"][2]
    W3p = jnp.concatenate((W3[: 4 * J][perm], W3[4 * J : 4 * J + 3]), axis=0)
    b3p = jnp.concatenate((b3[: 4 * J][perm], b3[4 * J : 4 * J + 3]))[:, None]

    mean_q = model.mean_dqs.reshape(-1, 8)[:, :4].reshape(-1)
    std_q = model.std_dqs.reshape(-1, 8)[:, :4].reshape(-1)
    mq = mean_q[perm].reshape(4, J, 1)
    sq = std_q[perm].reshape(4, J, 1)

    P = np.zeros((J, J), np.float32)
    for j, p in enumerate(np.asarray(skeleton.parents)):
        P[j, p] = 1.0

    if model.mask.ndim == 2:
        # per-lane masks/weights (multi-avatar serving): the weight planes
        # become (J, B) and broadcast against the component planes exactly
        # like the shared (J, 1) case; n_ee becomes per-lane (B,).
        w_pos = (model.mask * model.weights[..., 0]).T
        w_rot = (model.mask * model.weights[..., 1]).T
        n_ee = jnp.maximum(jnp.sum(model.mask, axis=-1), 1.0)
    else:
        w_pos = (model.mask * model.weights[:, 0])[:, None]
        w_rot = (model.mask * model.weights[:, 1])[:, None]
        n_ee = jnp.maximum(jnp.sum(model.mask), 1.0)

    return FastContext(
        W1=folded["ws"][0], b1=folded["bs"][0][:, None],
        W2=folded["ws"][1], b2=folded["bs"][1][:, None],
        W3p=W3p, b3p=b3p, sq=sq, mq=mq,
        sd=model.std_disp[:, None], md=model.mean_disp[:, None],
        P=jnp.asarray(P),
        A=jnp.asarray(np.asarray(skeleton.ancestors, np.float32)),
        offs=jnp.asarray(np.asarray(skeleton.offsets, np.float32).T[:, :, None]),
        w_pos=w_pos,
        w_rot=w_rot,
        n_ee=n_ee,
        unperm=jnp.asarray(unperm),
        dq_gather=jnp.asarray(dq_gather),
    )


def _qmul(aw, ax, ay, az, bw, bx, by, bz):
    """Hamilton product on component planes (matches ``quat.mul``)."""
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _qrot(qw, qx, qy, qz, vx, vy, vz):
    """Rotate vector planes by unit-quat planes (matches ``quat.mul_vec``:
    v + 2 q_w (q_v × v) + 2 q_v × (q_v × v))."""
    cx1 = qy * vz - qz * vy
    cy1 = qz * vx - qx * vz
    cz1 = qx * vy - qy * vx
    cx2 = qy * cz1 - qz * cy1
    cy2 = qz * cx1 - qx * cz1
    cz2 = qx * cy1 - qy * cx1
    return (vx + 2.0 * (qw * cx1 + cx2),
            vy + 2.0 * (qw * cy1 + cy2),
            vz + 2.0 * (qw * cz1 + cz2))


class ForwardT(NamedTuple):
    """Transposed forward products (everything ``_LossAux`` needs)."""

    total: Any      # (B,)
    loss_pos: Any   # (B,)
    loss_rot: Any   # (B,) already scaled by lambda_rot
    pose_cm: Any    # (4J, B) normalized pose, component-major
    disp: Any       # (3, B) denormalized root displacement
    wr: Any         # (4, B) world rotation
    wd: Any         # (3, B) world displacement
    pos: Any        # (J, 3, B) FK positions (previous root = origin)


def forward_T(ctx: FastContext, hyper: eng.DragHyper, zT, grT, tposT, trotT,
              tlatT) -> ForwardT:
    """Transposed equivalent of ``engine._drag_loss`` (no constraints).

    zT (L, B); grT (4, B) global rotation; tposT (J, 3, B); trotT
    (J, 3, 3, B); tlatT (L, B) temporal target.
    """
    J = ctx.P.shape[0]
    # NB: the VAE's LeakyReLU slope is 0.2 (skeleton_nn.leaky_relu,
    # reference generator architecture), NOT jax.nn's default 0.01; and all
    # matmuls stay f32-exact (parity: decode_folded and ops/fk.py use
    # precision="highest" — TPU default bf16 passes cost ~1e-3 relative).
    mm = lambda a, b: jnp.matmul(a, b, precision="highest")  # noqa: E731
    h = skeleton_nn.leaky_relu(mm(ctx.W1, zT) + ctx.b1)
    h = skeleton_nn.leaky_relu(mm(ctx.W2, h) + ctx.b2)
    h = mm(ctx.W3p, h) + ctx.b3p                      # (4J+3, B)

    x = h[: 4 * J].reshape(4, J, -1) * ctx.sq + ctx.mq
    ss = jnp.sum(x * x, axis=0)
    u = x / jnp.sqrt(ss)[None]                        # unit quats (4, J, B)
    pose_cm = ((u - ctx.mq) / ctx.sq).reshape(4 * J, -1)
    disp = h[4 * J : 4 * J + 3] * ctx.sd + ctx.md     # (3, B)

    # world rotation: global_rot ⊗ (decoder root quat)
    q0 = u[:, 0, :]
    Ww, Wx, Wy, Wz = _qmul(grT[0], grT[1], grT[2], grT[3],
                           q0[0], q0[1], q0[2], q0[3])          # (B,)
    ww, wx, wy, wz = _qmul(Ww[None], Wx[None], Wy[None], Wz[None],
                           u[0], u[1], u[2], u[3])              # (J, B)
    row0 = (jnp.arange(J) == 0)[:, None]
    ww = jnp.where(row0, Ww[None], ww)
    wx = jnp.where(row0, Wx[None], wx)
    wy = jnp.where(row0, Wy[None], wy)
    wz = jnp.where(row0, Wz[None], wz)

    wdx, wdy, wdz = _qrot(Ww, Wx, Wy, Wz, disp[0], disp[1], disp[2])

    pw, px, py, pz = mm(ctx.P, ww), mm(ctx.P, wx), mm(ctx.P, wy), mm(ctx.P, wz)
    cx, cy, cz = _qrot(pw, px, py, pz, ctx.offs[0], ctx.offs[1], ctx.offs[2])
    posx = mm(ctx.A, cx) + wdx[None]
    posy = mm(ctx.A, cy) + wdy[None]
    posz = mm(ctx.A, cz) + wdz[None]

    dx = posx - tposT[:, 0]
    dy = posy - tposT[:, 1]
    dz = posz - tposT[:, 2]
    loss_pos = jnp.sum(ctx.w_pos * (dx * dx + dy * dy + dz * dz), axis=0) \
        / (ctx.n_ee * 3.0)

    # rotation matrices as 9 planes (matches quat.to_matrix)
    x2, y2, z2 = wx + wx, wy + wy, wz + wz
    xx, yy, zz = wx * x2, wy * y2, wz * z2
    wx_, wy_, wz_ = ww * x2, ww * y2, ww * z2
    xy, xz, yz = wx * y2, wx * z2, wy * z2
    ms = (1.0 - (yy + zz), xy - wz_, xz + wy_,
          xy + wz_, 1.0 - (xx + zz), yz - wx_,
          xz - wy_, yz + wx_, 1.0 - (xx + yy))
    lr_acc = 0.0
    for k, m in enumerate(ms):
        d = m - trotT[:, k // 3, k % 3]
        lr_acc = lr_acc + ctx.w_rot * (d * d)
    loss_rot = jnp.sum(lr_acc, axis=0) / (ctx.n_ee * 9.0) * hyper.lambda_rot

    loss_temporal = jnp.mean((zT - tlatT) ** 2, axis=0)
    lam_t = hyper.lambda_temporal if hyper.use_temporal else 0.0
    total = loss_pos + loss_rot + loss_temporal * lam_t

    return ForwardT(total=total, loss_pos=loss_pos, loss_rot=loss_rot,
                    pose_cm=pose_cm, disp=disp,
                    wr=jnp.stack((Ww, Wx, Wy, Wz)),
                    wd=jnp.stack((wdx, wdy, wdz)),
                    pos=jnp.stack((posx, posy, posz), axis=1))


def eval_targets_T(ctx: FastContext, hyper: eng.DragHyper, global_pos_b,
                   dqs_f, gt_pos, gt_rot):
    """Transposed equivalent of ``engine._eval_targets``: build per-frame
    end-effector targets from GT, whole-batch, on component planes.

    ``global_pos_b`` (B, 3) current root positions; ``dqs_f`` (B, J*8)
    normalized GT dual quats for the frame; ``gt_pos``/``gt_rot`` (B, 3)/
    (B, 4).  Returns ``(tposT (J, 3, B), trotT (J, 3, 3, B))`` — the layout
    ``run_block`` consumes directly.  The vmapped per-lane version computes
    FK on (22, 4)-shaped arrays (≤17% lane utilization) and measured ~21%
    of the whole pipelined block at B=2048."""
    J = ctx.P.shape[0]
    mm = lambda a, b: jnp.matmul(a, b, precision="highest")  # noqa: E731

    x = jnp.matmul(dqs_f, ctx.dq_gather,
                   precision="highest").T.reshape(4, J, -1)  # raw quats
    q = x * ctx.sq + ctx.mq                            # denormalized (4,J,B)
    grT = gt_rot.T                                     # (4, B)
    # rs = qs with the root slot replaced by the GT world rotation
    row0 = (jnp.arange(J) == 0)[:, None]
    rs = [jnp.where(row0, grT[c][None], q[c]) for c in range(4)]
    # world[j>=1] = rs[0] (x) rs[j];  world[0] = rs[0]  (fk_root_space)
    ww, wx, wy, wz = _qmul(grT[0][None], grT[1][None], grT[2][None],
                           grT[3][None], rs[0], rs[1], rs[2], rs[3])
    ww = jnp.where(row0, grT[0][None], ww)
    wx = jnp.where(row0, grT[1][None], wx)
    wy = jnp.where(row0, grT[2][None], wy)
    wz = jnp.where(row0, grT[3][None], wz)

    disp = (gt_pos - global_pos_b).T                   # (3, B)
    pw, px, py, pz = mm(ctx.P, ww), mm(ctx.P, wx), mm(ctx.P, wy), mm(ctx.P, wz)
    cx, cy, cz = _qrot(pw, px, py, pz, ctx.offs[0], ctx.offs[1], ctx.offs[2])
    posx = mm(ctx.A, cx) + disp[0][None]
    posy = mm(ctx.A, cy) + disp[1][None]
    posz = mm(ctx.A, cz) + disp[2][None]
    tposT = jnp.stack((posx, posy, posz), axis=1)      # (J, 3, B)

    x2, y2, z2 = wx + wx, wy + wy, wz + wz
    xx, yy, zz = wx * x2, wy * y2, wz * z2
    wx_, wy_, wz_ = ww * x2, ww * y2, ww * z2
    xy, xz, yz = wx * y2, wx * z2, wy * z2
    r0 = jnp.stack((1.0 - (yy + zz), xy - wz_, xz + wy_), axis=1)
    r1 = jnp.stack((xy + wz_, 1.0 - (xx + zz), yz - wx_), axis=1)
    r2 = jnp.stack((xz - wy_, yz + wx_, 1.0 - (xx + yy)), axis=1)
    trotT = jnp.stack((r0, r1, r2), axis=1)            # (J, 3, 3, B)
    return tposT, trotT


class _FastCarry(NamedTuple):
    z: Any          # (L, B)
    m: Any          # (L, B)
    v: Any          # (L, B)
    decoded: Any    # (L, B) latent that produced the last decode
    t: Any          # (B,) int32
    prev_loss: Any  # (B,)
    loss_pos: Any   # (B,)
    loss_rot: Any   # (B,)
    loss_incr: Any  # (B,)


def run_block(ctx: FastContext, hyper: eng.DragHyper, sync_k: int,
              opt: eng._OptCarry, lane_active, state, tposT, trotT,
              target_latent, model, statics, skeleton):
    """Run ``sync_k`` masked Adam iterations in transposed layout and return
    an updated batched ``_OptCarry`` (aux recomputed at the decoded latent).

    Drop-in replacement for the pipeline's vmapped inner scan.  Targets
    arrive TRANSPOSED: ``tposT`` (J, 3, B), ``trotT`` (J, 3, 3, B) — the
    native layout of ``eval_targets_T``.
    """
    grT = state.global_rot.T                      # (4, B)
    tlatT = target_latent.T                       # (L, B)

    def total_sum(zT):
        f = forward_T(ctx, hyper, zT, grT, tposT, trotT, tlatT)
        return jnp.sum(f.total), f

    loss_grad = jax.value_and_grad(total_sum, has_aux=True)

    def cond_vec(c: _FastCarry):
        return (((c.loss_pos > hyper.stop_eps_pos)
                 | (c.loss_rot > hyper.stop_eps_rot))
                & (c.t < hyper.max_iter)
                & (c.loss_incr > hyper.min_loss_incr))

    def istep(c: _FastCarry, _):
        active = cond_vec(c) & lane_active
        (_, f), g = loss_grad(c.z)
        t = c.t + 1
        m = eng._ADAM_B1 * c.m + (1.0 - eng._ADAM_B1) * g
        v = eng._ADAM_B2 * c.v + (1.0 - eng._ADAM_B2) * g * g
        tf = t.astype(jnp.float32)
        m_hat = m / (1.0 - eng._ADAM_B1 ** tf)
        v_hat = v / (1.0 - eng._ADAM_B2 ** tf)
        z = c.z - hyper.learning_rate * m_hat / (jnp.sqrt(v_hat)
                                                 + eng._ADAM_EPS)
        new = _FastCarry(z=z, m=m, v=v, decoded=c.z, t=t,
                         prev_loss=f.total, loss_pos=f.loss_pos,
                         loss_rot=f.loss_rot,
                         loss_incr=c.prev_loss - f.total)
        sel_r = lambda n, o: jnp.where(active[None], n, o)   # noqa: E731
        sel_s = lambda n, o: jnp.where(active, n, o)         # noqa: E731
        return _FastCarry(
            z=sel_r(new.z, c.z), m=sel_r(new.m, c.m), v=sel_r(new.v, c.v),
            decoded=sel_r(new.decoded, c.decoded), t=sel_s(new.t, c.t),
            prev_loss=sel_s(new.prev_loss, c.prev_loss),
            loss_pos=sel_s(new.loss_pos, c.loss_pos),
            loss_rot=sel_s(new.loss_rot, c.loss_rot),
            loss_incr=sel_s(new.loss_incr, c.loss_incr),
        ), None

    c0 = _FastCarry(
        z=opt.latent.T, m=opt.m.T, v=opt.v.T, decoded=opt.decoded_latent.T,
        t=opt.t, prev_loss=opt.prev_loss, loss_pos=opt.loss_pos,
        loss_rot=opt.loss_rot, loss_incr=opt.loss_incr,
    )
    c, _ = jax.lax.scan(istep, c0, None, length=sync_k,
                        unroll=min(sync_k, 4))

    # Rebuild aux from the decoded latent (the pre-final-step latent whose
    # decode produced the last accepted iterate — ``drag_pose.py:309``).
    f = forward_T(ctx, hyper, c.decoded, grT, tposT, trotT, tlatT)
    J = ctx.P.shape[0]
    aux = eng._LossAux(
        loss_pos=f.loss_pos,
        loss_rot=f.loss_rot,
        world_displacement=f.wd.T,
        displacement=f.disp.T,
        world_rotation=f.wr.T,
        positions=jnp.moveaxis(f.pos, -1, 0),            # (B, J, 3)
        pose=f.pose_cm[ctx.unperm].T,                    # (B, 4J) interleaved
    )
    return eng._OptCarry(
        latent=c.z.T, m=c.m.T, v=c.v.T, t=c.t, prev_loss=c.prev_loss,
        loss_pos=c.loss_pos, loss_rot=c.loss_rot, loss_incr=c.loss_incr,
        decoded_latent=c.decoded.T, aux=aux,
    )
