"""Fused attention core (Pallas, lanes layout): QK + softmax + AV, one pass.

The temporal predictor's training-layout attention (``models/temporal.
_attn_T``) contracts tiny per-head planes — S ≤ 15 tokens, dh = 12 — as
broadcast multiply-reduces with batch B in the minor/lane dimension.
That is the right arithmetic for the VPU (a dot_general of this shape
lowers to thousands of micro-GEMMs), but under plain XLA the
(Sq, Sk, h, B) score/softmax planes round-trip HBM several times per
layer: a trace of the B=4096 train step showed the attention fusions at
7.1 ms of 21 — ~8× the bandwidth roofline of reading q,k,v once and
writing the context once.

This kernel is that roofline: one grid pass over B-tiles, everything
(scores, softmax, context) VMEM-resident.  S is small enough that NO
online/flash softmax is needed — the whole (Sq, Sk, h, TILE_B) score
block lives in VMEM.  The backward recomputes scores/softmax per tile
(trading ~1/3 of the forward FLOPs for the s/a HBM round-trips) and
walks the standard softmax VJP.

Layout notes: blocks are rank-4 (S, h, dh, TILE_B) with B in lanes and
dh in sublanes (padded 12 → 16 for f32 — the 33% sublane pad is free
compared to the eliminated HBM traffic).  The token loops (≤ 15) are
unrolled Python loops — static, tiny, and Mosaic-friendly.

Used by ``models/temporal.forward_T(train=True)`` (the TPU training
layout).  The inference rollout keeps the plain mul-reduce formulation:
its arithmetic is part of the locked full-clip parity record
(PARITY.json) and is not perturbed by kernel rewrites.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Attention is RNG-free, so forward and backward tile widths would be
# independent (unlike ff_fused, whose dropout bits are tile-indexed) —
# but both are VMEM-bounded at 256 lanes: the backward's working set
# (q/k/v/g blocks + dk/dv carries + per-row planes) measures 22.45 MB
# at 384 lanes against the 16 MB scoped-vmem limit, and 512-lane
# forward blocks also OOM.  Wider tiles are a dead end here; the
# per-op width is the (h·dh, TB) plane, already ≥ a full VREG row.
TILE_B_FWD = 256
TILE_B_BWD = 256


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# Mosaic lowering rules that shape these kernels (learned by compiling):
# * reductions over the SUBLANE axis (dh, second-minor) are supported;
#   reductions over leading untiled axes (Sk of a (Sk, h, TB) plane) are
#   not ("unsupported output implicit dimension") — those run as
#   unrolled slice-accumulation loops instead (S ≤ 15, so ~15 adds);
# * a lane→sublane reshape like (1, Sk) → (Sk, 1, 1) cannot lower — the
#   mask ships pre-shaped (Sq, Sk, 1, 1) so row i is a broadcastable
#   (Sk, 1, 1) block.


def _softmax_rows(si, sk):
    """softmax over the leading (Sk) axis of (Sk, h, TB), by slices."""
    m = si[0:1]
    for kk in range(1, sk):
        m = jnp.maximum(m, si[kk : kk + 1])
    e = jnp.exp(si - m)
    t = e[0:1]
    for kk in range(1, sk):
        t = t + e[kk : kk + 1]
    return e / t


def _row_attn(q_ref, k, mask_ref, i, sk, scale):
    qi = q_ref[i]                                       # (h, dh, TB)
    si = (qi[None] * k).sum(axis=2) * scale + mask_ref[i]   # (Sk, h, TB)
    return qi, _softmax_rows(si, sk)


def _fwd_kernel(sq, sk, scale, q_ref, k_ref, v_ref, mask_ref, o_ref):
    k = k_ref[:]
    v = v_ref[:]
    for i in range(sq):
        _, a = _row_attn(q_ref, k, mask_ref, i, sk, scale)
        o = a[0][:, None, :] * v[0]                     # (h, dh, TB)
        for kk in range(1, sk):
            o = o + a[kk][:, None, :] * v[kk]
        o_ref[i] = o


# The fully unrolled backward at Sq = 15 (~1500 vector ops) crashes the
# Mosaic compiler (bisected: Sq ≤ 8 compiles, 15 does not; a fori_loop
# does NOT help — Mosaic unrolls it, and the loop carries make it worse).
# So the backward grid BLOCKS the query axis: each grid step handles
# SQ_BLOCK unrolled query rows, and dk/dv accumulate across the Sq-block
# axis in their revisited output blocks (same pattern as the FF kernel's
# weight grads).  Query padding rows carry g = 0, so they contribute
# nothing to dk/dv, and their dq rows are sliced away by the caller.
SQ_BLOCK = 8


def _bwd_kernel(sq_blk, sk, scale, q_ref, k_ref, v_ref, mask_ref, g_ref,
                dq_ref, dk_ref, dv_ref):
    k = k_ref[:]
    v = v_ref[:]
    dv = jnp.zeros_like(v)
    dk = jnp.zeros_like(k)
    for i in range(sq_blk):
        qi, a = _row_attn(q_ref, k, mask_ref, i, sk, scale)  # recompute
        gi = g_ref[i]                                   # (h, dh, TB)
        # da[k] = <g[i], v[k]>_dh ; ds = a ⊙ (da - Σ_k a·da) · scale
        da = (gi[None] * v).sum(axis=2)                 # (Sk, h, TB)
        r = a[0:1] * da[0:1]
        for kk in range(1, sk):
            r = r + a[kk : kk + 1] * da[kk : kk + 1]    # (1, h, TB)
        ds = a * (da - r) * scale                       # (Sk, h, TB)
        dq = ds[0][:, None, :] * k[0]
        for kk in range(1, sk):
            dq = dq + ds[kk][:, None, :] * k[kk]
        dq_ref[i] = dq                                  # (h, dh, TB)
        dv = dv + a[:, :, None, :] * gi[None]
        dk = dk + ds[:, :, None, :] * qi[None]

    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    dk_ref[:] += dk
    dv_ref[:] += dv


def _pad_lanes(a, b_pad):
    b = a.shape[-1]
    return a if b == b_pad else jnp.pad(
        a, ((0, 0),) * (a.ndim - 1) + ((0, b_pad - b),))


def _specs(sq, sk, h, dh, tile):
    qspec = pl.BlockSpec((sq, h, dh, tile), lambda i: (0, 0, 0, i))
    kspec = pl.BlockSpec((sk, h, dh, tile), lambda i: (0, 0, 0, i))
    mspec = pl.BlockSpec((sq, sk, 1, 1), lambda i: (0, 0, 0, 0))
    return qspec, kspec, mspec


def _fwd_call(q, k, v, mask):
    sq, h, dh, b = q.shape
    sk = k.shape[0]
    tile = min(TILE_B_FWD, max(128, b))
    b_pad = ((b + tile - 1) // tile) * tile
    qp, kp, vp = (_pad_lanes(x, b_pad) for x in (q, k, v))
    m4 = mask.reshape(sq, sk, 1, 1)
    qspec, kspec, mspec = _specs(sq, sk, h, dh, tile)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, sq, sk, 1.0 / math.sqrt(dh)),
        grid=(b_pad // tile,),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((sq, h, dh, b_pad), jnp.float32),
        interpret=_use_interpret(),
    )(qp, kp, vp, m4)
    return o[..., :b]


def _bwd_call(q, k, v, mask, g):
    sq, h, dh, b = q.shape
    sk = k.shape[0]
    tile = min(TILE_B_BWD, max(128, b))
    b_pad = ((b + tile - 1) // tile) * tile
    sq_blk = min(SQ_BLOCK, sq)
    sq_pad = ((sq + sq_blk - 1) // sq_blk) * sq_blk
    qp, kp, vp, gp = (_pad_lanes(x, b_pad) for x in (q, k, v, g))
    if sq_pad != sq:
        # zero g rows → zero dk/dv contributions; mask pads with 0 (NOT
        # -inf: an all--inf row would make the padded softmax NaN)
        pad = ((0, sq_pad - sq), (0, 0), (0, 0), (0, 0))
        qp, gp = jnp.pad(qp, pad), jnp.pad(gp, pad)
        mask = jnp.pad(mask, ((0, sq_pad - sq), (0, 0)))
    m4 = mask.reshape(sq_pad, sk, 1, 1)
    qspec = pl.BlockSpec((sq_blk, h, dh, tile), lambda i, j: (j, 0, 0, i))
    kspec = pl.BlockSpec((sk, h, dh, tile), lambda i, j: (0, 0, 0, i))
    mspec = pl.BlockSpec((sq_blk, sk, 1, 1), lambda i, j: (j, 0, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, sq_blk, sk, 1.0 / math.sqrt(dh)),
        grid=(b_pad // tile, sq_pad // sq_blk),
        in_specs=[qspec, kspec, kspec, mspec, qspec],
        out_specs=[qspec, kspec, kspec],
        out_shape=[
            jax.ShapeDtypeStruct((sq_pad, h, dh, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((sk, h, dh, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((sk, h, dh, b_pad), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(qp, kp, vp, m4, gp)
    return dq[:sq, ..., :b], dk[..., :b], dv[..., :b]


@jax.custom_vjp
def _attn_core(q, k, v, mask):
    return _fwd_call(q, k, v, mask)


def _attn_core_fwd(q, k, v, mask):
    return _fwd_call(q, k, v, mask), (q, k, v, mask)


def _attn_core_bwd(res, g):
    q, k, v, mask = res
    dq, dk, dv = _bwd_call(q, k, v, mask, g)
    return dq, dk, dv, jnp.zeros_like(mask)


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def attn_core_lanes(q, k, v, mask=None):
    """softmax(q·kᵀ/√dh + mask)·v on lanes-layout heads.

    q: (Sq, h, dh, B); k, v: (Sk, h, dh, B); mask: additive (Sq, Sk) or
    None.  Returns (Sq, h, dh, B) f32.  Matches the plain mul-reduce
    formulation to f32 rounding (same contraction arithmetic, plus a
    max-subtraction in the softmax, which the plain ``jax.nn.softmax``
    also performs).
    """
    sq, sk = q.shape[0], k.shape[0]
    if mask is None:
        mask = jnp.zeros((sq, sk), jnp.float32)
    else:
        mask = jnp.broadcast_to(mask.astype(jnp.float32), (sq, sk))
    return _attn_core(q, k, v, mask)
