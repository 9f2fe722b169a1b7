"""Fused Pallas TPU kernel for the temporal-transformer inference forward.

The drag runtime calls the seq2seq predictor once per reconstructed frame
(``drag/engine.py:_temporal_rollout``); in XLA form it lowers to ~150 small
ops (d_model 48, 14+n tokens) and costs ~2.3 ms/frame at batch 512 — the
largest section of the frame step (tools/profile_drag.py).  This kernel runs
the ENTIRE 3+3-layer forward — input projections, positional encodings,
per-head attention, feed-forwards, all layer norms, output projection — in
one ``pallas_call``: weights stay VMEM-resident across batch tiles and no
intermediate ever round-trips to HBM.

Numerics: matmul multiplies use the same precision class as the XLA path
(``models/temporal.py:_PRECISION = "default"``, bf16 multiply / f32
accumulate) for the large feed-forward contractions, and float32
(``HIGHEST``) for the tiny attention score/value contractions.  Inference
only (no dropout); training keeps the XLA path.

Use :func:`pack_params` once per model load, then :func:`forward` — a
``custom_vmap`` wrapper, so the engine's per-sequence ``vmap`` merges the
batch into the kernel grid instead of serializing per-sequence calls.

STATUS — measured on v5e (B=512, S_enc=14, S_dec=1), kept for reference,
NOT wired into the engine: this kernel runs at 1.44 ms/call vs 0.50 ms for
the XLA path after its layout fixes (``models/temporal.py:_rowdot`` folding
vmap batches into MXU rows).  Mosaic lowers the per-sequence attention
contractions (batch=BT, S=14, dh=12) as serialized tiny MXU dots — ~4k of
them per forward across heads/layers — which dominates the kernel.  Beating
XLA here would need a batch-in-lanes attention layout (VPU
multiply-reduce) rather than batched dots; with the rollout now ~10% of the
frame budget the engine integration is not worth that complexity.  The
kernel remains numerically verified (tests/test_temporal_fused.py) as the
Pallas reference for this architecture.
"""

from __future__ import annotations

import functools
import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 48          # d_model (checkpoint-defined, temporal_transformer.py:26)
H = 4           # heads
DH = D // H     # 12
FF = 2048
LAYERS = 3      # encoder layers == decoder layers
BT = 32         # batch tile (VMEM budget: ff hidden (BT*14, 2048) f32)
_EPS = 1e-5
_FAST = jax.lax.Precision.DEFAULT    # big contractions (matches XLA path)
_EXACT = jax.lax.Precision.HIGHEST   # tiny attention contractions


def _pe(max_len: int, dim: int) -> np.ndarray:
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def pack_params(params: Dict, param: Dict) -> Dict[str, jnp.ndarray]:
    """Re-lay the torch-convention pytree (``models/temporal.py``) into
    stacked, math-layout (in, out) arrays the kernel indexes statically."""

    def lin(p):                      # torch (out,in) -> (in,out), bias (1,out)
        return np.asarray(p["w"]).T, np.asarray(p["b"])[None]

    def attn(p):
        in_w = np.asarray(p["in_w"])            # (3D, D) rows [q;k;v]
        in_b = np.asarray(p["in_b"])
        out_w = np.asarray(p["out_w"])          # (D, D)
        wq, wk, wv = in_w[:D], in_w[D:2 * D], in_w[2 * D:]
        bq, bk, bv = in_b[:D], in_b[D:2 * D], in_b[2 * D:]

        def heads(w, b):             # -> (H, D, DH), (H, 1, DH)
            w = w.T.reshape(D, H, DH).transpose(1, 0, 2)
            b = b.reshape(H, 1, DH)
            return w, b

        # out projection split by head rows: out = sum_h o_h @ wo[h]
        wo = out_w.T.reshape(H, DH, D)
        return (*heads(wq, bq), *heads(wk, bk), *heads(wv, bv),
                wo, np.asarray(p["out_b"])[None])

    def ln(p):
        return np.stack([np.asarray(p["g"]), np.asarray(p["b"])])  # (2, D)

    def stack(items):
        return [jnp.asarray(np.stack(xs)) for xs in zip(*items)]

    enc_attn = stack([attn(l["self_attn"]) for l in params["enc_layers"]])
    dec_attn = stack([attn(l["self_attn"]) for l in params["dec_layers"]])
    crs_attn = stack([attn(l["cross_attn"]) for l in params["dec_layers"]])

    def ffs(layers):
        w1, b1 = zip(*[lin(l["ff1"]) for l in layers])
        w2, b2 = zip(*[lin(l["ff2"]) for l in layers])
        return [jnp.asarray(np.stack(x)) for x in (w1, b1, w2, b2)]

    max_len = len(param["past_frames"]) + len(param["future_frames"])
    pe = _pe(max_len, D)
    w_in_enc, b_in_enc = lin(params["in_proj_enc"])
    w_in_dec, b_in_dec = lin(params["in_proj_dec"])
    w_out, b_out = lin(params["out_proj"])
    packed = {
        "w_in_enc": jnp.asarray(w_in_enc), "b_in_enc": jnp.asarray(b_in_enc),
        "w_in_dec": jnp.asarray(w_in_dec), "b_in_dec": jnp.asarray(b_in_dec),
        "w_out": jnp.asarray(w_out), "b_out": jnp.asarray(b_out),
        "pe": jnp.asarray(pe),
        "enc_attn": enc_attn, "dec_attn": dec_attn, "crs_attn": crs_attn,
        "enc_ff": ffs(params["enc_layers"]),
        "dec_ff": ffs(params["dec_layers"]),
        "enc_ln1": jnp.asarray(np.stack([ln(l["ln1"]) for l in params["enc_layers"]])),
        "enc_ln2": jnp.asarray(np.stack([ln(l["ln2"]) for l in params["enc_layers"]])),
        "dec_ln1": jnp.asarray(np.stack([ln(l["ln1"]) for l in params["dec_layers"]])),
        "dec_ln2": jnp.asarray(np.stack([ln(l["ln2"]) for l in params["dec_layers"]])),
        "dec_ln3": jnp.asarray(np.stack([ln(l["ln3"]) for l in params["dec_layers"]])),
        "enc_norm": jnp.asarray(ln(params["enc_norm"])),
        "dec_norm": jnp.asarray(ln(params["dec_norm"])),
    }
    return packed


# Flat argument order for the kernel (stable):
_KEYS = ["w_in_enc", "b_in_enc", "w_in_dec", "b_in_dec", "w_out", "b_out",
         "pe",
         "enc_attn", "dec_attn", "crs_attn", "enc_ff", "dec_ff",
         "enc_ln1", "enc_ln2", "dec_ln1", "dec_ln2", "dec_ln3",
         "enc_norm", "dec_norm"]


def _flatten(packed):
    out = []
    for k in _KEYS:
        v = packed[k]
        out.extend(v) if isinstance(v, list) else out.append(v)
    return out


def _kernel(s_enc: int, s_dec: int, enc_ref, dec_ref, mask_ref, *rest):
    *w_refs, out_ref = rest
    (w_in_enc, b_in_enc, w_in_dec, b_in_dec, w_out, b_out, pe,
     enc_wq, enc_bq, enc_wk, enc_bk, enc_wv, enc_bv, enc_wo, enc_bo,
     dec_wq, dec_bq, dec_wk, dec_bk, dec_wv, dec_bv, dec_wo, dec_bo,
     crs_wq, crs_bq, crs_wk, crs_bk, crs_wv, crs_bv, crs_wo, crs_bo,
     enc_ff1w, enc_ff1b, enc_ff2w, enc_ff2b,
     dec_ff1w, dec_ff1b, dec_ff2w, dec_ff2b,
     enc_ln1, enc_ln2, dec_ln1, dec_ln2, dec_ln3,
     enc_norm, dec_norm) = [r[...] for r in w_refs]

    def dot(a, b, precision=_FAST):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=precision)

    def layer_norm(x, gb):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + _EPS) * gb[0] + gb[1]

    def mha(xq, xkv, sq, sk, wq, bq, wk, bk, wv, bv, wo, bo, mask=None):
        """xq (BT*sq, D), xkv (BT*sk, D) -> (BT*sq, D); heads unrolled,
        per-head output projected and accumulated (no lane concat)."""
        out = jnp.zeros((BT * sq, D), jnp.float32) + bo
        for h in range(H):
            q = (dot(xq, wq[h]) + bq[h]).reshape(BT, sq, DH)
            k = (dot(xkv, wk[h]) + bk[h]).reshape(BT, sk, DH)
            v = (dot(xkv, wv[h]) + bv[h]).reshape(BT, sk, DH)
            s = jnp.einsum("bqd,bkd->bqk", q, k,
                           preferred_element_type=jnp.float32,
                           precision=_EXACT) / math.sqrt(DH)
            if mask is not None:
                s = s + mask
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bqk,bkd->bqd", a, v,
                           preferred_element_type=jnp.float32,
                           precision=_EXACT).reshape(BT * sq, DH)
            out = out + dot(o, wo[h], precision=_EXACT)
        return out

    def ff(x, w1, b1, w2, b2):
        return dot(jnp.maximum(dot(x, w1) + b1, 0.0), w2) + b2

    # ---- encoder ----
    src = dot(enc_ref[:].reshape(BT * s_enc, -1), w_in_enc) + b_in_enc
    src = (src.reshape(BT, s_enc, D) + pe[:s_enc][None]).reshape(BT * s_enc, D)
    for l in range(LAYERS):
        a = mha(src, src, s_enc, s_enc,
                enc_wq[l], enc_bq[l], enc_wk[l], enc_bk[l],
                enc_wv[l], enc_bv[l], enc_wo[l], enc_bo[l])
        src = layer_norm(src + a, enc_ln1[l])
        src = layer_norm(src + ff(src, enc_ff1w[l], enc_ff1b[l],
                                  enc_ff2w[l], enc_ff2b[l]), enc_ln2[l])
    memory = layer_norm(src, enc_norm)

    # ---- decoder ----
    mask = mask_ref[:]                              # (1, s_dec) or (s_dec, s_dec)
    tgt = dot(dec_ref[:].reshape(BT * s_dec, -1), w_in_dec) + b_in_dec
    tgt = (tgt.reshape(BT, s_dec, D) + pe[:s_dec][None]).reshape(BT * s_dec, D)
    for l in range(LAYERS):
        a = mha(tgt, tgt, s_dec, s_dec,
                dec_wq[l], dec_bq[l], dec_wk[l], dec_bk[l],
                dec_wv[l], dec_bv[l], dec_wo[l], dec_bo[l], mask=mask)
        tgt = layer_norm(tgt + a, dec_ln1[l])
        a = mha(tgt, memory, s_dec, s_enc,
                crs_wq[l], crs_bq[l], crs_wk[l], crs_bk[l],
                crs_wv[l], crs_bv[l], crs_wo[l], crs_bo[l])
        tgt = layer_norm(tgt + a, dec_ln2[l])
        tgt = layer_norm(tgt + ff(tgt, dec_ff1w[l], dec_ff1b[l],
                                  dec_ff2w[l], dec_ff2b[l]), dec_ln3[l])
    out = layer_norm(tgt, dec_norm)
    out = dot(out, w_out, precision=_EXACT) + b_out
    out_ref[:] = out.reshape(BT, s_dec, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(flat_weights, enc_in, dec_in, mask, *, interpret=False):
    if enc_in.ndim == 2:                       # unbatched (S, D) call
        out = _call(flat_weights, enc_in[None], dec_in[None], mask,
                    interpret=interpret)
        return out[0]
    b, s_enc, d_in = enc_in.shape
    s_dec, d_lat = dec_in.shape[1], dec_in.shape[2]
    pad = (-b) % BT
    if pad:
        enc_in = jnp.concatenate(
            [enc_in, jnp.zeros((pad, s_enc, d_in), enc_in.dtype)])
        dec_in = jnp.concatenate(
            [dec_in, jnp.zeros((pad, s_dec, d_lat), dec_in.dtype)])
    grid = (enc_in.shape[0] // BT,)
    const = lambda i: (0,) * 2  # noqa: E731

    def spec3(s, d):
        return pl.BlockSpec((BT, s, d), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    w_specs = [
        pl.BlockSpec(w.shape, lambda i, n=w.ndim: (0,) * n,
                     memory_space=pltpu.VMEM)
        for w in flat_weights
    ]
    out = pl.pallas_call(
        functools.partial(_kernel, s_enc, s_dec),
        grid=grid,
        in_specs=[spec3(s_enc, d_in), spec3(s_dec, d_lat),
                  pl.BlockSpec(mask.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=spec3(s_dec, d_lat),
        out_shape=jax.ShapeDtypeStruct((enc_in.shape[0], s_dec, d_lat),
                                       jnp.float32),
        interpret=interpret,
    )(enc_in, dec_in, mask, *flat_weights)
    return out[:b]


@jax.custom_batching.custom_vmap
def _forward_cv(flat_weights, enc_in, dec_in, mask):
    return _call(flat_weights, enc_in, dec_in, mask,
                 interpret=jax.default_backend() != "tpu")


@_forward_cv.def_vmap
def _forward_cv_vmap(axis_size, in_batched, flat_weights, enc_in, dec_in,
                     mask):
    """The drag engine vmaps per-sequence calls of shape (S, D) (or with
    extra leading dims); merge the mapped axis into the kernel's batch
    instead of running per-sequence programs (weights/mask are unbatched)."""
    w_b, e_b, d_b, m_b = in_batched
    assert not any(jax.tree.leaves(w_b)) and not m_b, (
        "fused temporal kernel: weights/mask must not be batched")

    def merge(x, batched):
        if not batched:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        return x.reshape((-1,) + x.shape[-2:])
    enc = merge(enc_in, e_b)
    dec = merge(dec_in, d_b)
    out = _call(flat_weights, enc, dec, mask,
                interpret=jax.default_backend() != "tpu")
    lead = enc_in.shape[1:-2] if e_b else enc_in.shape[:-2]
    out = out.reshape((axis_size,) + lead + out.shape[-2:])
    return out, True


def forward(packed: Dict, param: Dict, enc_in, dec_in, tgt_mask):
    """Drop-in inference equivalent of ``models.temporal.forward``.

    enc_in (B, S_enc, latent+3+H), dec_in (B, S_dec, latent),
    tgt_mask additive (1, S_dec) or (S_dec, S_dec).  Returns (B, S_dec, latent).
    """
    return _forward_cv(_flatten(packed), enc_in, dec_in, tgt_mask)
