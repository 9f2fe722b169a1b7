"""Fused drag Adam iteration (Pallas): the whole sync-K block in VMEM.

A trace of the pipelined 6-tracker run shows the Adam iteration as
~33k XLA micro-fusions of 2–4 µs on (J=22, B) planes — fixed per-op
dispatch overhead, not bandwidth or FLOPs (the decoder is 3 matmuls of
at most (92, 60); one iteration moves ~7 MB of intermediates).  This
kernel runs ``fast_iter.run_block``'s entire iteration — decoder
forward, FK, the three-term loss, its backward, and the masked Adam
update — as ONE Pallas program per (B-tile, iteration) grid step.  The
optimizer state (z, m, v, decoded, t, losses) lives in revisited VMEM
output blocks across the iteration axis, so sync_k iterations touch HBM
only to read the block's constants/targets once and write the final
state.

The backward is NOT hand-derived: the kernel body calls ``jax.vjp`` on
the in-kernel forward — autodiff runs at trace time and the transposed
ops lower through Mosaic like any others (the cotangent is the (1, TB)
ones plane, so no scalar reduction is needed).

Layout: everything is 8-aligned for Mosaic sublane tiling.  Joint
planes are padded J=22 → JP=24 rows (padded joints get unit-w quat
means so normalization never sees ss=0, zero ancestor rows, and zero
loss weights); the decoder's last layer is rebuilt with component
stride 24 — rows [w:0..24 | x:24.. | y:48.. | z:72.. | dispx:96 |
dispy:104 | dispz:112] — so every in-kernel row slice starts at a
multiple of 8.

Semantics mirror ``fast_iter.run_block`` exactly (same formulas, same
masked-select bookkeeping, f32-highest matmuls); fp-equivalent rather
than bitwise (reduction association differs).  CPU tests run the same
kernel in interpret mode.

**Measured negative result — NOT wired into the product path.**  On one
v5e (``tools/probe_iter_kernel.py``; amortized multi-block timings from
the same probe session):

====  =============  =============
B     scan ms/block  fused ms/block
====  =============  =============
8192  5.07–5.24      5.83–6.09
====  =============  =============

i.e. the fused kernel is 10–15% SLOWER than the XLA scan at the bench
batch, and within noise at B ≤ 4096 (single-block timings are swamped by
the tunnel's ~25 ms per-invocation overhead — see ROADMAP "pipelined
batched loop" finding).  Why: the iteration is VPU-bound on (≤24, TB)
planes; XLA's fusions already keep the scan's intermediates out of HBM
at these sizes (the carry is only ~6·(L+1)·B floats), so VMEM residency
buys nothing, while Mosaic's codegen for the long elementwise chains is
no better than XLA's — the same conclusion as the attention-block study
(``ops/attn_fused.py`` helped only because dropout masks were going to
HBM; here nothing was).  A full-width (B=8192) single tile also exceeds
the 16 MB scoped-vmem limit (20.4 MB), forcing ≥8 tiles.  Kept, tested,
as the Pallas reference for a whole-optimizer-step kernel and the
documented boundary of where kernel fusion stops paying on this
architecture.

Reference behavior: ``python/src/drag_pose.py:66-194`` (loss), ``:218``
(fresh Adam), ``:300-304`` (stop rule).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from dragposer_tpu.drag import engine as eng
from dragposer_tpu.drag import fast_iter
from dragposer_tpu.models import skeleton_nn

JP = 24            # padded joint rows (J=22 → 24: sublane multiple of 8)
_CSTRIDE = 24      # component stride in the padded decoder output
_DISP0 = 4 * 24    # first displacement row (96), then +8, +8
_HROWS = _DISP0 + 24  # padded decoder output rows (120)
TILE_B = 1024


class KernelContext(NamedTuple):
    """8-aligned constants for the fused iteration kernel."""

    W1: Any        # (H1, L)
    b1: Any        # (H1, 1)
    W2: Any        # (H2, H1)
    b2: Any        # (H2, 1)
    W3k: Any       # (_HROWS, H2) padded component-major rows
    b3k: Any       # (_HROWS, 1)
    sq: Any        # (4, JP, 1) quat stds (pads: 1)
    mq: Any        # (4, JP, 1) quat means (pads: w=1 else 0)
    sd: Any        # (3, 1, 1)
    md: Any        # (3, 1, 1)
    P: Any         # (JP, JP) parent one-hot (pads: zero rows)
    A: Any         # (JP, JP) ancestor matrix (pads: zero rows)
    offs: Any      # (3, JP, 1)
    w_pos: Any     # (JP, 1) or (JP, B)
    w_rot: Any     # (JP, 1) or (JP, B)
    n_ee: Any      # () or (B,)


def make_kernel_context(ctx: fast_iter.FastContext) -> KernelContext:
    """Pad a ``fast_iter.FastContext`` into the kernel's aligned layout."""
    J = ctx.P.shape[0]
    h2 = ctx.W3p.shape[1]

    def pad_rows(a, rows):
        return jnp.concatenate(
            (a, jnp.zeros((rows - a.shape[0],) + a.shape[1:], a.dtype)))

    # component blocks of W3p rows → stride-24 slots; disp rows → 96/104/112
    comps = [pad_rows(ctx.W3p[c * J:(c + 1) * J], _CSTRIDE)
             for c in range(4)]
    disps = [pad_rows(ctx.W3p[4 * J + c: 4 * J + c + 1], 8) for c in range(3)]
    W3k = jnp.concatenate(comps + disps)
    bcomps = [pad_rows(ctx.b3p[c * J:(c + 1) * J], _CSTRIDE) for c in range(4)]
    bdisps = [pad_rows(ctx.b3p[4 * J + c: 4 * J + c + 1], 8) for c in range(3)]
    b3k = jnp.concatenate(bcomps + bdisps)

    pad_j = JP - J
    sq = jnp.pad(ctx.sq, ((0, 0), (0, pad_j), (0, 0)), constant_values=1.0)
    mq = jnp.pad(ctx.mq, ((0, 0), (0, pad_j), (0, 0)))
    # padded joints: unit-w mean so |x| = 1 (normalization never sees 0)
    mq = mq.at[0, J:, 0].set(1.0)
    P = jnp.pad(ctx.P, ((0, pad_j), (0, pad_j)))
    A = jnp.pad(ctx.A, ((0, pad_j), (0, pad_j)))
    offs = jnp.pad(ctx.offs, ((0, 0), (0, pad_j), (0, 0)))
    w_pos = jnp.pad(ctx.w_pos, ((0, pad_j), (0, 0)))
    w_rot = jnp.pad(ctx.w_rot, ((0, pad_j), (0, 0)))
    return KernelContext(
        W1=ctx.W1, b1=ctx.b1, W2=ctx.W2, b2=ctx.b2, W3k=W3k, b3k=b3k,
        sq=sq, mq=mq, sd=ctx.sd[:, :, None], md=ctx.md[:, :, None],
        P=P, A=A, offs=offs, w_pos=w_pos, w_rot=w_rot, n_ee=ctx.n_ee,
    )


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mm(a, b):
    # f32-exact like the XLA paths (decode_folded / ops/fk use highest)
    return jax.lax.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _forward(hyper, C, z, gr4, tpos3, trot9, tlat, w_pos, w_rot, n_ee):
    """In-kernel transposed drag loss — mirrors ``fast_iter.forward_T``
    on the padded layout.  All operands are VMEM values; returns
    (total (1, TB), (loss_pos, loss_rot))."""
    h = skeleton_nn.leaky_relu(_mm(C["W1"], z) + C["b1"])
    h = skeleton_nn.leaky_relu(_mm(C["W2"], h) + C["b2"])
    h = _mm(C["W3k"], h) + C["b3k"]                     # (_HROWS, TB)

    xs = [h[c * _CSTRIDE:(c + 1) * _CSTRIDE] * C["sq"][c] + C["mq"][c]
          for c in range(4)]                            # 4 × (JP, TB)
    ss = xs[0] * xs[0] + xs[1] * xs[1] + xs[2] * xs[2] + xs[3] * xs[3]
    inv = jax.lax.rsqrt(ss)
    u = [x * inv for x in xs]
    disp = [h[_DISP0 + 8 * c:_DISP0 + 8 * c + 1] * C["sd"][c] + C["md"][c]
            for c in range(3)]                          # 3 × (1, TB)

    # world rotation: (global_rot ⊗ root quat) ⊗ per-joint quats
    q0 = [u[c][0:1] for c in range(4)]                  # (1, TB)
    gw, gx, gy, gz = (gr4[c] for c in range(4))         # (1, TB)
    Ww, Wx, Wy, Wz = fast_iter._qmul(gw, gx, gy, gz,
                                     q0[0], q0[1], q0[2], q0[3])
    ww, wx, wy, wz = fast_iter._qmul(Ww, Wx, Wy, Wz, u[0], u[1], u[2], u[3])
    row0 = jax.lax.broadcasted_iota(jnp.int32, ww.shape, 0) == 0
    ww = jnp.where(row0, Ww, ww)
    wx = jnp.where(row0, Wx, wx)
    wy = jnp.where(row0, Wy, wy)
    wz = jnp.where(row0, Wz, wz)

    wdx, wdy, wdz = fast_iter._qrot(Ww, Wx, Wy, Wz, disp[0], disp[1], disp[2])

    pw, px = _mm(C["P"], ww), _mm(C["P"], wx)
    py, pz = _mm(C["P"], wy), _mm(C["P"], wz)
    cx, cy, cz = fast_iter._qrot(pw, px, py, pz,
                                 C["offs"][0], C["offs"][1], C["offs"][2])
    posx = _mm(C["A"], cx) + wdx
    posy = _mm(C["A"], cy) + wdy
    posz = _mm(C["A"], cz) + wdz

    dx = posx - tpos3[0]
    dy = posy - tpos3[1]
    dz = posz - tpos3[2]
    loss_pos = jnp.sum(w_pos * (dx * dx + dy * dy + dz * dz), axis=0,
                       keepdims=True) / (n_ee * 3.0)

    x2, y2, z2 = wx + wx, wy + wy, wz + wz
    xx, yy, zz = wx * x2, wy * y2, wz * z2
    wx_, wy_, wz_ = ww * x2, ww * y2, ww * z2
    xy, xz, yz = wx * y2, wx * z2, wy * z2
    ms = (1.0 - (yy + zz), xy - wz_, xz + wy_,
          xy + wz_, 1.0 - (xx + zz), yz - wx_,
          xz - wy_, yz + wx_, 1.0 - (xx + yy))
    lr_acc = 0.0
    for k in range(9):
        d = ms[k] - trot9[k]
        lr_acc = lr_acc + w_rot * (d * d)
    loss_rot = jnp.sum(lr_acc, axis=0, keepdims=True) / (n_ee * 9.0) \
        * hyper.lambda_rot

    dz_t = z - tlat
    lam_t = hyper.lambda_temporal if hyper.use_temporal else 0.0
    loss_t = jnp.sum(dz_t * dz_t, axis=0, keepdims=True) / z.shape[0]
    total = loss_pos + loss_rot + loss_t * lam_t
    return total, (loss_pos, loss_rot)


_LN_B1 = float(np.log(eng._ADAM_B1))
_LN_B2 = float(np.log(eng._ADAM_B2))


def _kernel(hyper, sync_k,
            # constants
            W1, b1, W2, b2, W3k, b3k, sq, mq, sd, md, P, A, offs,
            # per-tile inputs
            w_pos, w_rot, n_ee, gr4, tpos3, trot9, tlat, lane_act,
            z0, m0, v0, d0, t0, pl0, lp0, lr0, li0,
            # state outputs (revisited across the iteration grid axis)
            z_ref, m_ref, v_ref, dec_ref, t_ref, prev_ref, lp_ref, lr_ref,
            li_ref):
    C = {"W1": W1[:], "b1": b1[:], "W2": W2[:], "b2": b2[:],
         "W3k": W3k[:], "b3k": b3k[:], "sq": sq[:], "mq": mq[:],
         "sd": sd[:], "md": md[:], "P": P[:], "A": A[:], "offs": offs[:]}

    @pl.when(pl.program_id(1) == 0)
    def _():
        z_ref[:] = z0[:]
        m_ref[:] = m0[:]
        v_ref[:] = v0[:]
        dec_ref[:] = d0[:]
        t_ref[:] = t0[:]
        prev_ref[:] = pl0[:]
        lp_ref[:] = lp0[:]
        lr_ref[:] = lr0[:]
        li_ref[:] = li0[:]

    z, m, v = z_ref[:], m_ref[:], v_ref[:]
    t, prev = t_ref[:], prev_ref[:]
    lp, lr, li = lp_ref[:], lr_ref[:], li_ref[:]

    active = (((lp > hyper.stop_eps_pos) | (lr > hyper.stop_eps_rot))
              & (t < hyper.max_iter)
              & (li > hyper.min_loss_incr)
              & (lane_act[:] > 0.5))                     # (1, TB) bool

    def fwd(zz):
        return _forward(hyper, C, zz, gr4[:], tpos3[:], trot9[:], tlat[:],
                        w_pos[:], w_rot[:], n_ee[:])

    total, vjp, (lp_n, lr_n) = jax.vjp(fwd, z, has_aux=True)
    (g,) = vjp(jnp.ones_like(total))

    t_n = t + 1
    m_n = eng._ADAM_B1 * m + (1.0 - eng._ADAM_B1) * g
    v_n = eng._ADAM_B2 * v + (1.0 - eng._ADAM_B2) * g * g
    tf = t_n.astype(jnp.float32)
    m_hat = m_n / (1.0 - jnp.exp(tf * _LN_B1))
    v_hat = v_n / (1.0 - jnp.exp(tf * _LN_B2))
    z_n = z - hyper.learning_rate * m_hat / (jnp.sqrt(v_hat) + eng._ADAM_EPS)

    z_ref[:] = jnp.where(active, z_n, z)
    m_ref[:] = jnp.where(active, m_n, m)
    v_ref[:] = jnp.where(active, v_n, v)
    dec_ref[:] = jnp.where(active, z, dec_ref[:])
    t_ref[:] = jnp.where(active, t_n, t)
    prev_ref[:] = jnp.where(active, total, prev)
    lp_ref[:] = jnp.where(active, lp_n, lp)
    lr_ref[:] = jnp.where(active, lr_n, lr)
    li_ref[:] = jnp.where(active, prev - total, li)


def _pad_lanes(a, b_pad):
    b = a.shape[-1]
    return a if b == b_pad else jnp.pad(
        a, ((0, 0),) * (a.ndim - 1) + ((0, b_pad - b),))


def run_block_fused(ctx: fast_iter.FastContext, kctx: KernelContext,
                    hyper: eng.DragHyper, sync_k: int, opt: eng._OptCarry,
                    lane_active, state, tposT, trotT, target_latent):
    """Drop-in for ``fast_iter.run_block`` running the whole sync-K block
    in one Pallas program per B-tile (state never leaves VMEM between
    iterations).  Same inputs/outputs; aux rebuilt via the XLA
    ``fast_iter.forward_T`` at the decoded latent, exactly like the
    scan-based path."""
    J = ctx.P.shape[0]
    L = opt.latent.shape[-1]
    B = opt.latent.shape[0]
    tile = min(TILE_B, ((B + 127) // 128) * 128)   # lane-aligned
    b_pad = ((B + tile - 1) // tile) * tile
    nb = b_pad // tile

    grT = state.global_rot.T                             # (4, B)
    tlatT = target_latent.T                              # (L, B)
    # (J, 3, B) → (3, JP, B); (J, 3, 3, B) → (9, JP, B)
    pad_j = ((0, 0), (0, JP - J), (0, 0))
    tpos3 = jnp.pad(jnp.moveaxis(tposT, 1, 0), pad_j)
    trot9 = jnp.pad(jnp.moveaxis(trotT.reshape(J, 9, -1), 1, 0), pad_j)
    gr4 = grT[:, None, :]                                # (4, 1, B)

    wp = kctx.w_pos if kctx.w_pos.shape[-1] != 1 \
        else jnp.broadcast_to(kctx.w_pos, (JP, B))
    wr = kctx.w_rot if kctx.w_rot.shape[-1] != 1 \
        else jnp.broadcast_to(kctx.w_rot, (JP, B))
    ne = jnp.broadcast_to(jnp.asarray(kctx.n_ee, jnp.float32).reshape(
        (1, -1)), (1, B))

    row1 = lambda a: a.reshape(1, -1)                    # noqa: E731
    per_tile = {
        "w_pos": (wp, (JP, tile)),
        "w_rot": (wr, (JP, tile)),
        "n_ee": (ne, (1, tile)),
        "gr4": (gr4, (4, 1, tile)),
        "tpos3": (tpos3, (3, JP, tile)),
        "trot9": (trot9, (9, JP, tile)),
        "tlat": (tlatT, (L, tile)),
        "lane_act": (row1(lane_active.astype(jnp.float32)), (1, tile)),
        "z0": (opt.latent.T, (L, tile)),
        "m0": (opt.m.T, (L, tile)),
        "v0": (opt.v.T, (L, tile)),
        "d0": (opt.decoded_latent.T, (L, tile)),
        "t0": (row1(opt.t), (1, tile)),
        "pl0": (row1(opt.prev_loss), (1, tile)),
        "lp0": (row1(opt.loss_pos), (1, tile)),
        "lr0": (row1(opt.loss_rot), (1, tile)),
        "li0": (row1(opt.loss_incr), (1, tile)),
    }
    consts = [kctx.W1, kctx.b1, kctx.W2, kctx.b2, kctx.W3k, kctx.b3k,
              kctx.sq, kctx.mq, kctx.sd, kctx.md, kctx.P, kctx.A, kctx.offs]
    const_specs = [pl.BlockSpec(c.shape, lambda i, k, nd=c.ndim: (0,) * nd)
                   for c in consts]
    tile_vals = [_pad_lanes(v, b_pad) for v, _ in per_tile.values()]
    tile_specs = [
        pl.BlockSpec(shape, lambda i, k, nd=len(shape): (0,) * (nd - 1) + (i,))
        for _, shape in per_tile.values()
    ]
    state_shapes = [(L, tile)] * 4 + [(1, tile)] * 5
    state_dtypes = ([jnp.float32] * 4 + [jnp.int32] + [jnp.float32] * 4)
    out_specs = [pl.BlockSpec(s, lambda i, k: (0, i)) for s in state_shapes]
    out_shape = [jax.ShapeDtypeStruct((s[0], b_pad), d)
                 for s, d in zip(state_shapes, state_dtypes)]

    outs = pl.pallas_call(
        functools.partial(_kernel, hyper, sync_k),
        grid=(nb, sync_k),
        in_specs=const_specs + tile_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_use_interpret(),
    )(*consts, *tile_vals)
    z, m, v, dec, t, prev, lp, lr, li = [o[..., :B] for o in outs]

    f = fast_iter.forward_T(ctx, hyper, dec, grT, tposT, trotT, tlatT)
    aux = eng._LossAux(
        loss_pos=f.loss_pos,
        loss_rot=f.loss_rot,
        world_displacement=f.wd.T,
        displacement=f.disp.T,
        world_rotation=f.wr.T,
        positions=jnp.moveaxis(f.pos, -1, 0),
        pose=f.pose_cm[ctx.unperm].T,
    )
    squeeze = lambda a: a.reshape(-1)                    # noqa: E731
    return eng._OptCarry(
        latent=z.T, m=m.T, v=v.T, t=squeeze(t), prev_loss=squeeze(prev),
        loss_pos=squeeze(lp), loss_rot=squeeze(lr), loss_incr=squeeze(li),
        decoded_latent=dec.T, aux=aux,
    )
