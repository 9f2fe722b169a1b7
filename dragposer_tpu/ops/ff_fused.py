"""Fused transformer feed-forward (Pallas): FF1 + ReLU + dropout + FF2.

Why this kernel exists: the temporal predictor's feed-forward expands
d_model 48 → 2048 (torch default, reference ``temporal_transformer.py``),
a 42× widening — at training batch 4096 the hidden activations are
(4096·15, 2048) ≈ 515 MB in f32.  Under plain XLA the train step
materializes that tensor (plus its dropout mask and gradient) to HBM
several times per layer; the profiled step at B=4096 spent ~60 of 117 ms
in exactly those dot_general fusions, with the token axis (15) chosen as
the minor dimension (8.5× lane padding).  Here the hidden NEVER leaves
VMEM:

* forward: one grid pass over row tiles — h = relu(x@W1ᵀ+b1) lives in a
  VMEM tile, the dropout mask comes from a counter-based hash (murmur3
  finalizer of seed ⊕ tile ⊕ element position; no threefry mask tensor
  in HBM), and only y = drop(h)@W2ᵀ+b2 (M×48) is written out.
* backward (custom VJP): h and the mask are RECOMPUTED per tile from x
  and the same (seed, tile, position) hash — trading ~12 GFLOP for
  ~1.5 GB of HBM traffic per layer — and the weight gradients accumulate
  in VMEM scratch across the sequential grid.

Numerics: all matmuls accumulate in f32 (``preferred_element_type``).
The mask is a pure function of (seed, tile, position), so forward and
backward replay identical bits by construction — on every backend (the
counter hash uses only portable integer ops, unlike the TPU-only
``pltpu.prng_random_bits``, so interpret-mode CPU tests exercise the
real kernel).  Unit tests check the dropout VJP analytically against a
plain formulation with the extracted mask, and the rate-0 VJP against
plain autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One row tile: h tile is (TILE_M, 2048) f32 = 2 MB in VMEM.  Forward and
# backward MUST use the same tile size — the dropout bits are generated
# per tile and must replay identically.
TILE_M = 256


def _keep_mask(shape, rate: float, seed_ref):
    """Dropout keep mask: murmur3-finalizer hash of (seed, tile, position).

    Counter-based rather than stateful: the mask is a pure function of
    the base seed, the row-tile index, and the element's position in the
    tile — forward and backward regenerate identical bits with no mask
    tensor in HBM, and the same bits on Mosaic and interpret backends
    (everything is portable uint32 mul/xor/shift; no pltpu PRNG).
    """
    # element position within the tile, as uint32 (values < 2^31: exact)
    pos = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * np.int32(shape[1])
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    h = pos.astype(jnp.uint32)
    # mix in base seed (generated non-negative: exact uint32 cast) and tile
    seed = seed_ref[0].astype(jnp.uint32)
    tile = pl.program_id(0).astype(jnp.uint32)
    h = h + seed * np.uint32(0x9E3779B1) + tile * np.uint32(0x7FEB352D)
    # murmur3 fmix32: full-avalanche bijection on uint32
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    # keep iff h >= rate * 2^32  (P(drop) = rate to 2^-32)
    thresh = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return h >= thresh


def _mxu(a):
    """Cast a dot operand for the MXU: bf16 doubles the systolic-array rate
    (accumulation stays f32 via preferred_element_type) — the standard TPU
    mixed-precision training recipe.  Static no-op when bf16 is off."""
    return a.astype(jnp.bfloat16)


def _fwd_kernel(rate, bf16, seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, b2_ref,
                y_ref):
    cast = _mxu if bf16 else (lambda a: a)
    h = jnp.dot(cast(x_ref[:]), cast(w1t_ref[:]),
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0)
    if rate > 0.0:
        keep = _keep_mask(h.shape, rate, seed_ref)
        h = jnp.where(keep, h * (1.0 / (1.0 - rate)), 0.0)
    y = jnp.dot(cast(h), cast(w2t_ref[:]), preferred_element_type=jnp.float32)
    y_ref[:] = y + b2_ref[:]


def _bwd_kernel(rate, bf16, seed_ref, x_ref, w1t_ref, b1_ref, w2t_ref, g_ref,
                dx_ref, dw1t_ref, db1_ref, dw2t_ref, db2_ref):
    cast = _mxu if bf16 else (lambda a: a)
    x = x_ref[:]
    g = g_ref[:]
    # recompute the hidden (never stored): pre-activation, relu, dropout.
    # The recomputed pre MUST match the forward bitwise for the relu
    # gate — same cast, same dot.
    pre = jnp.dot(cast(x), cast(w1t_ref[:]),
                  preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if rate > 0.0:
        keep = _keep_mask(h.shape, rate, seed_ref)  # identical bits to fwd
        scale = 1.0 / (1.0 - rate)
        hd = jnp.where(keep, h * scale, 0.0)
    else:
        hd = h
    # dL/dhd = g @ W2  (W2ᵀ is resident; contract its OUT axis)
    dhd = jax.lax.dot_general(
        cast(g), cast(w2t_ref[:]), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        dh = jnp.where(keep, dhd * scale, 0.0)
    else:
        dh = dhd
    dpre = jnp.where(pre > 0.0, dh, 0.0)
    dx_ref[:] = jax.lax.dot_general(
        cast(dpre), cast(w1t_ref[:]), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    # weight/bias grads accumulate across the sequential row-tile grid
    dw1t = jax.lax.dot_general(  # xᵀ @ dpre → (D, F)
        cast(x), cast(dpre), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2t = jax.lax.dot_general(  # hdᵀ @ g → (F, D)
        cast(hd), cast(g), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre, axis=0, keepdims=True)
    db2 = jnp.sum(g, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1t_ref[:] = jnp.zeros_like(dw1t_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2t_ref[:] = jnp.zeros_like(dw2t_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1t_ref[:] += dw1t
    db1_ref[:] += db1
    dw2t_ref[:] += dw2t
    db2_ref[:] += db2


def _pad_rows(a, m_pad):
    m = a.shape[0]
    return a if m == m_pad else jnp.pad(a, ((0, m_pad - m), (0, 0)))


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(rate, x, w1t, b1, w2t, b2, seed, bf16=False):
    m, d = x.shape
    f = w1t.shape[1]
    m_pad = ((m + TILE_M - 1) // TILE_M) * TILE_M
    xp = _pad_rows(x, m_pad)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, rate, bf16),
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0)),      # x tile
            pl.BlockSpec((d, f), lambda i: (0, 0)),           # W1ᵀ (resident)
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # b1
            pl.BlockSpec((f, d), lambda i: (0, 0)),           # W2ᵀ (resident)
            pl.BlockSpec((1, d), lambda i: (0, 0)),           # b2
        ],
        out_specs=pl.BlockSpec((TILE_M, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
        interpret=_use_interpret(),
    )(seed, xp, w1t, b1.reshape(1, f), w2t, b2.reshape(1, d))
    return y[:m]


def _bwd_call(rate, x, w1t, b1, w2t, seed, g, bf16=False):
    m, d = x.shape
    f = w1t.shape[1]
    m_pad = ((m + TILE_M - 1) // TILE_M) * TILE_M
    # zero row padding: padded rows have g = 0, so every weight/bias grad
    # contribution from them vanishes (x rows only feed grads through
    # dpre/g products)
    xp, gp = _pad_rows(x, m_pad), _pad_rows(g, m_pad)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, rate, bf16),
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # seed
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0)),      # x tile
            pl.BlockSpec((d, f), lambda i: (0, 0)),           # W1ᵀ
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # b1
            pl.BlockSpec((f, d), lambda i: (0, 0)),           # W2ᵀ
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0)),      # g tile
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, d), lambda i: (i, 0)),      # dx
            pl.BlockSpec((d, f), lambda i: (0, 0)),           # dW1ᵀ (accum)
            pl.BlockSpec((1, f), lambda i: (0, 0)),           # db1
            pl.BlockSpec((f, d), lambda i: (0, 0)),           # dW2ᵀ (accum)
            pl.BlockSpec((1, d), lambda i: (0, 0)),           # db2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(seed, xp, w1t, b1.reshape(1, f), w2t, gp)
    dx, dw1t, db1, dw2t, db2 = outs
    return dx[:m], dw1t, db1.reshape(f), dw2t, db2.reshape(d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ff_dropout(rate, bf16, x, w1t, b1, w2t, b2, seed):
    return _fwd_call(rate, x, w1t, b1, w2t, b2, seed, bf16)


def _ff_dropout_fwd(rate, bf16, x, w1t, b1, w2t, b2, seed):
    return (_fwd_call(rate, x, w1t, b1, w2t, b2, seed, bf16),
            (x, w1t, b1, w2t, seed))


def _ff_dropout_bwd(rate, bf16, res, g):
    x, w1t, b1, w2t, seed = res
    dx, dw1t, db1, dw2t, db2 = _bwd_call(rate, x, w1t, b1, w2t, seed, g, bf16)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dx, dw1t, db1, dw2t, db2, dseed


_ff_dropout.defvjp(_ff_dropout_fwd, _ff_dropout_bwd)


# ---------------------------------------------------------------------------
# Lanes-layout kernel: x is (S, D, B) with batch in lanes — the TPU training
# layout of models/temporal.forward_T.  Same fusion as the rows kernel but
# the tiles are (D, TILE_B) column blocks, so NO transposes are needed
# around the call.  A trace of the B=4096 train step showed the rows
# kernel's surrounding (S, D, B) <-> (S, B, D) transposes costing
# ~9 ms/step of 21 — more than the entire FF computation.
# ---------------------------------------------------------------------------

TILE_B = 256


def _fwd_kernel_T(rate, bf16, nb, seed_ref, x_ref, w1_ref, b1_ref, w2_ref,
                  b2_ref, y_ref):
    cast = _mxu if bf16 else (lambda a: a)
    x = x_ref[0]                                      # (D, TILE_B)
    h = jnp.dot(cast(w1_ref[:]), cast(x),             # (F, TILE_B)
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:], 0.0)
    if rate > 0.0:
        keep = _keep_mask_T(h.shape, rate, seed_ref, nb)
        h = jnp.where(keep, h * (1.0 / (1.0 - rate)), 0.0)
    y = jnp.dot(cast(w2_ref[:]), cast(h),             # (D, TILE_B)
                preferred_element_type=jnp.float32)
    y_ref[0] = y + b2_ref[:]


def _keep_mask_T(shape, rate, seed_ref, nb):
    """Same counter-hash as ``_keep_mask`` with the tile id linearized over
    the (S, B-tiles) grid."""
    pos = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * np.int32(shape[1])
           + jax.lax.broadcasted_iota(jnp.int32, shape, 1))
    h = pos.astype(jnp.uint32)
    seed = seed_ref[0].astype(jnp.uint32)
    tile = (pl.program_id(0) * nb + pl.program_id(1)).astype(jnp.uint32)
    h = h + seed * np.uint32(0x9E3779B1) + tile * np.uint32(0x7FEB352D)
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    thresh = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    return h >= thresh


def _bwd_kernel_T(rate, bf16, nb, seed_ref, x_ref, w1_ref, b1_ref, w2_ref,
                  g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    cast = _mxu if bf16 else (lambda a: a)
    x = x_ref[0]                                      # (D, TILE_B)
    g = g_ref[0]                                      # (D, TILE_B)
    pre = jnp.dot(cast(w1_ref[:]), cast(x),
                  preferred_element_type=jnp.float32) + b1_ref[:]
    h = jnp.maximum(pre, 0.0)
    if rate > 0.0:
        keep = _keep_mask_T(h.shape, rate, seed_ref, nb)  # identical to fwd
        scale = 1.0 / (1.0 - rate)
        hd = jnp.where(keep, h * scale, 0.0)
    else:
        hd = h
    # dL/dhd = W2ᵀ g: contract the D axis of (D,F) with (D,TILE_B)
    dhd = jax.lax.dot_general(
        cast(w2_ref[:]), cast(g), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (F, TILE_B)
    if rate > 0.0:
        dh = jnp.where(keep, dhd * scale, 0.0)
    else:
        dh = dhd
    dpre = jnp.where(pre > 0.0, dh, 0.0)              # (F, TILE_B)
    dx_ref[0] = jax.lax.dot_general(                  # W1ᵀ dpre → (D, TILE_B)
        cast(w1_ref[:]), cast(dpre), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # weight/bias grads: contract the lane axis; accumulate over the grid
    dw1 = jax.lax.dot_general(                        # (F, D)
        cast(dpre), cast(x), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(                        # (D, F)
        cast(g), cast(hd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1 = jnp.sum(dpre, axis=1, keepdims=True)        # (F, 1)
    db2 = jnp.sum(g, axis=1, keepdims=True)           # (D, 1)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dw2_ref[:] += dw2
    db2_ref[:] += db2


def _pad_lanes(a, b_pad):
    b = a.shape[-1]
    return a if b == b_pad else jnp.pad(
        a, ((0, 0),) * (a.ndim - 1) + ((0, b_pad - b),))


def _fwd_call_T(rate, x, w1, b1, w2, b2, seed, bf16=False):
    s, d, b = x.shape
    f = w1.shape[0]
    tile = min(TILE_B, max(128, b))
    b_pad = ((b + tile - 1) // tile) * tile
    nb = b_pad // tile
    xp = _pad_lanes(x, b_pad)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel_T, rate, bf16, nb),
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # seed
            pl.BlockSpec((1, d, tile), lambda i, j: (i, 0, j)),  # x block
            pl.BlockSpec((f, d), lambda i, j: (0, 0)),           # W1 (f,d)
            pl.BlockSpec((f, 1), lambda i, j: (0, 0)),           # b1
            pl.BlockSpec((d, f), lambda i, j: (0, 0)),           # W2 (d,f)
            pl.BlockSpec((d, 1), lambda i, j: (0, 0)),           # b2
        ],
        out_specs=pl.BlockSpec((1, d, tile), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((s, d, b_pad), jnp.float32),
        interpret=_use_interpret(),
    )(seed, xp, w1, b1.reshape(f, 1), w2, b2.reshape(d, 1))
    return y[..., :b]


def _bwd_call_T(rate, x, w1, b1, w2, seed, g, bf16=False):
    s, d, b = x.shape
    f = w1.shape[0]
    tile = min(TILE_B, max(128, b))
    b_pad = ((b + tile - 1) // tile) * tile
    nb = b_pad // tile
    # zero lane padding: padded lanes have g = 0 AND x = 0, so their
    # contributions to every gradient vanish
    xp, gp = _pad_lanes(x, b_pad), _pad_lanes(g, b_pad)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel_T, rate, bf16, nb),
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # seed
            pl.BlockSpec((1, d, tile), lambda i, j: (i, 0, j)),  # x block
            pl.BlockSpec((f, d), lambda i, j: (0, 0)),           # W1
            pl.BlockSpec((f, 1), lambda i, j: (0, 0)),           # b1
            pl.BlockSpec((d, f), lambda i, j: (0, 0)),           # W2
            pl.BlockSpec((1, d, tile), lambda i, j: (i, 0, j)),  # g block
        ],
        out_specs=[
            pl.BlockSpec((1, d, tile), lambda i, j: (i, 0, j)),  # dx
            pl.BlockSpec((f, d), lambda i, j: (0, 0)),           # dW1 accum
            pl.BlockSpec((f, 1), lambda i, j: (0, 0)),           # db1
            pl.BlockSpec((d, f), lambda i, j: (0, 0)),           # dW2 accum
            pl.BlockSpec((d, 1), lambda i, j: (0, 0)),           # db2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, d, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((f, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(seed, xp, w1, b1.reshape(f, 1), w2, gp)
    dx, dw1, db1, dw2, db2 = outs
    return dx[..., :b], dw1, db1.reshape(f), dw2, db2.reshape(d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ff_dropout_T(rate, bf16, x, w1, b1, w2, b2, seed):
    return _fwd_call_T(rate, x, w1, b1, w2, b2, seed, bf16)


def _ff_dropout_T_fwd(rate, bf16, x, w1, b1, w2, b2, seed):
    return (_fwd_call_T(rate, x, w1, b1, w2, b2, seed, bf16),
            (x, w1, b1, w2, seed))


def _ff_dropout_T_bwd(rate, bf16, res, g):
    x, w1, b1, w2, seed = res
    dx, dw1, db1, dw2, db2 = _bwd_call_T(rate, x, w1, b1, w2, seed, g, bf16)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dx, dw1, db1, dw2, db2, dseed


_ff_dropout_T.defvjp(_ff_dropout_T_fwd, _ff_dropout_T_bwd)


def ff_dropout_lanes(x, ff1, ff2, rate: float, seed,
                     bf16: bool | None = None):
    """Fused feed-forward with dropout on (S, D, B) lanes-layout activations.

    Torch-layout params are consumed as stored — ``ff1["w"]`` is (F, D)
    and ``ff2["w"]`` is (D, F), exactly the kernel's left operands — so
    there are no weight or activation transposes anywhere.  ``seed`` a
    scalar int32 (see ``ff_dropout_seeded``).
    """
    if bf16 is None:
        bf16 = jax.default_backend() == "tpu"
    return _ff_dropout_T(float(rate), bool(bf16), x, ff1["w"], ff1["b"],
                         ff2["w"], ff2["b"], seed.reshape(1))


def ff_dropout(x, ff1, ff2, rate: float, key, bf16: bool | None = None):
    """Fused feed-forward with dropout for (..., D) activations.

    ``ff1``/``ff2`` are torch-layout param dicts ``{"w": (out, in), "b"}``
    (see ``models/temporal.py``); ``rate`` must be a static float; ``key``
    a threefry PRNG key (folded to the kernel's int32 seed).  Training
    path only — inference uses the plain formulation (rate 0 fuses fine
    under XLA).

    ``bf16`` (default: on for TPU, off elsewhere) runs the MXU dots in
    bfloat16 with f32 accumulation — 2× the systolic-array rate; biases,
    relu, dropout, and all gradients stay f32.
    """
    # non-negative so the kernel's int32 → uint32 cast is exact
    seed = jax.random.randint(key, (), 0, 2 ** 31 - 1, jnp.int32)
    return ff_dropout_seeded(x, ff1, ff2, rate, seed, bf16)


def ff_dropout_seeded(x, ff1, ff2, rate: float, seed, bf16: bool | None = None):
    """``ff_dropout`` taking the kernel's scalar int32 seed directly (for
    callers that batch their per-site seed draws, e.g. the hash-dropout
    training layout in ``models/temporal.forward_T``)."""
    if bf16 is None:
        bf16 = jax.default_backend() == "tpu"
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    y = _ff_dropout(float(rate), bool(bf16), x2, ff1["w"].T, ff1["b"],
                    ff2["w"].T, ff2["b"], seed.reshape(1))
    return y.reshape(x.shape[:-1] + (ff2["w"].shape[0],))
