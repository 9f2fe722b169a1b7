"""Temporal latent predictor: seq2seq transformer (pure JAX functions).

Architecture parity with the reference (``python/src/temporal_transformer.py``):
d_model 48 (= 2×latent_dim), 4 heads, 3+3 post-LN encoder/decoder layers,
ReLU feed-forward 2048, dropout 0.1, sinusoidal positional encoding, causal
target mask.  Encoder tokens are latent(24) ⊕ accumulated displacement(3) ⊕
heights(6); decoder tokens are latents only.

The layer math mirrors ``torch.nn.Transformer`` (post-norm: residual then
LayerNorm; final LayerNorm on both stacks) so that reference ``temporal.pt``
checkpoints can be imported weight-for-weight.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dragposer_tpu.ops import attn_fused, ff_fused, hash_dropout

# Default (fast) matmul precision: the predictor produces *guidance targets*
# (λ_temporal ≤ 0.15); the numerically sensitive path (decoder+FK) keeps
# precision=highest.  Measured: highest costs ~6× on the rollout's
# ff-2048 matmuls at ~1% MXU utilization.
_PRECISION = "default"


def linear(x, params):
    """Torch convention: y = x @ Wᵀ + b (fast precision, see _PRECISION)."""
    return jnp.einsum("...i,oi->...o", x, params["w"],
                      precision=_PRECISION) + params["b"]


def _rowdot_impl(x, w, b):
    return jnp.einsum("...i,oi->...o", x, w, precision=_PRECISION) + b


@jax.custom_batching.custom_vmap
def _rowdot(x, w, b):
    """y = x @ Wᵀ + b whose vmap FOLDS the mapped axis into the row dim.

    Under the drag engine's per-sequence ``vmap`` the decoder processes one
    token per sequence, so the default batching rule emits dot_generals with
    batch=512, M=1 — XLA lowers those as VPU multiply-reduce loops (~8×
    slower than MXU; measured 244 µs vs 30 µs for the ff-2048 projections).
    Since the weights are unbatched, batching is just more rows: the rule
    re-enters the same einsum with the batch as a leading free dim, which
    XLA folds into a single MXU matmul.  Inference paths only (custom_vmap
    does not compose with reverse-mode AD)."""
    return _rowdot_impl(x, w, b)


@_rowdot.def_vmap
def _rowdot_vmap_rule(axis_size, in_batched, x, w, b):
    x_b, w_b, b_b = in_batched
    if w_b or b_b:
        # weights got instantiated along the batch (e.g. lax.cond batching
        # broadcasts both branches' operands) — keep the naive batched form
        if not x_b:
            x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
        if not w_b:
            w = jnp.broadcast_to(w[None], (axis_size,) + w.shape)
        if not b_b:
            b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
        y = jnp.einsum("B...i,Boi->B...o", x, w, precision=_PRECISION)
        return y + b.reshape(b.shape[:1] + (1,) * (y.ndim - 2) + b.shape[-1:]), True
    if not x_b:
        x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
    return _rowdot_impl(x, w, b), True


# ---------------------------------------------------------------------------
# Positional encoding (reference ``positional_encoding.py``)
# ---------------------------------------------------------------------------

def positional_encoding(max_len: int, dim: int) -> jnp.ndarray:
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


def causal_mask(size: int) -> jnp.ndarray:
    """(S, S) additive mask: 0 on/below the diagonal, -inf above."""
    return jnp.where(
        jnp.tril(jnp.ones((size, size), dtype=bool)), 0.0, -jnp.inf
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _xavier(key, shape):
    fan_in, fan_out = shape[1], shape[0]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def _init_attention(key, d):
    k1, k2 = jax.random.split(key)
    return {
        "in_w": _xavier(k1, (3 * d, d)),
        "in_b": jnp.zeros((3 * d,)),
        "out_w": _xavier(k2, (d, d)),
        "out_b": jnp.zeros((d,)),
    }


def _init_linear_kaiming(key, in_dim, out_dim):
    """FF linears INSIDE nn.Transformer: ``Transformer._reset_parameters``
    xavier-overrides every dim>1 weight, while the dim-1 biases keep their
    ``nn.Linear`` default U(±1/√fan_in)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": _xavier(kw, (out_dim, in_dim)),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def _init_linear_torch(key, in_dim, out_dim):
    """Plain ``nn.Linear`` default init (kaiming_uniform(a=√5) ≡ U(±1/√fan_in)
    for the weight, U(±1/√fan_in) for the bias).

    The reference's in_proj_encoder / in_proj_decoder / out_proj live OUTSIDE
    ``nn.Transformer`` (``temporal_transformer.py:24-34``), so its
    ``_reset_parameters`` xavier pass never touches them.  Using xavier here
    made out_proj's init 2× too wide (4× the output variance): initial train
    loss 2.45 vs the reference's 1.26, a head start the reference kept for
    the whole 80-step (1 step/epoch at B=512 on the example corpus) recipe.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), minval=-bound,
                                maxval=bound),
        "b": jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound),
    }


def _init_ln(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def init_params(key, param) -> Dict:
    d = param["features_transformer"]
    ff = param["dim_feedforward"]
    latent = param["latent_dim"]
    extra = 3 + len(param["height_indices"])
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    def enc_layer():
        return {
            "self_attn": _init_attention(next(ki), d),
            "ff1": _init_linear_kaiming(next(ki), d, ff),
            "ff2": _init_linear_kaiming(next(ki), ff, d),
            "ln1": _init_ln(d),
            "ln2": _init_ln(d),
        }

    def dec_layer():
        return {
            "self_attn": _init_attention(next(ki), d),
            "cross_attn": _init_attention(next(ki), d),
            "ff1": _init_linear_kaiming(next(ki), d, ff),
            "ff2": _init_linear_kaiming(next(ki), ff, d),
            "ln1": _init_ln(d),
            "ln2": _init_ln(d),
            "ln3": _init_ln(d),
        }

    return {
        "in_proj_enc": _init_linear_torch(next(ki), latent + extra, d),
        "in_proj_dec": _init_linear_torch(next(ki), latent, d),
        "out_proj": _init_linear_torch(next(ki), d, latent),
        "enc_layers": [enc_layer() for _ in range(param["n_encoder_layers"])],
        "dec_layers": [dec_layer() for _ in range(param["n_decoder_layers"])],
        "enc_norm": _init_ln(d),
        "dec_norm": _init_ln(d),
    }


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _layer_norm(x, p, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


def _dropout(x, rate, key, train):
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _attention(p, q_in, kv_in, n_heads: int, mask=None, dot=_rowdot_impl,
               rate: float = 0.0, key=None, train: bool = False):
    """Multi-head attention, torch packed-projection layout.

    q_in: (..., Sq, D); kv_in: (..., Sk, D); mask: additive (Sq, Sk) or None.
    Leading dims are arbitrary (the drag engine calls this UNBATCHED and
    lets ``vmap`` add the sequence batch — explicit singleton batch dims
    produced 8× slower padded layouts on TPU).

    rate/key/train: dropout on the softmax probabilities — torch
    ``MultiheadAttention(dropout=p)`` applies it there at train time, so the
    trainer must too for recipe parity (inference paths pass rate 0).
    """
    d = q_in.shape[-1]
    dh = d // n_heads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=0)
    bq, bk, bv = jnp.split(p["in_b"], 3, axis=0)

    def proj(x, w, b):
        # head split via reshape only — the head axis rides inside the
        # einsums below; no (..., H, S, dh) layout copies
        y = dot(x, w, b)
        return y.reshape(y.shape[:-1] + (n_heads, dh))       # (...,S,H,dh)

    q = proj(q_in, wq, bq)
    k = proj(kv_in, wk, bk)
    v = proj(kv_in, wv, bv)
    # NB: these stay dot_generals, NOT the broadcast mul-reduce used by the
    # transposed ``forward_T``.  The mul-reduce is 2.75× faster and tighter
    # (f32), but THIS function is the numeric anchor for head-to-head
    # parity with the unmodified reference (single-sequence eval path):
    # changing the contraction arithmetic moved the chaotic windowed
    # 4-tracker full-clip MPJPE from 0.65% to 1.44% off the reference —
    # past the 1% bar.  The fast serving/batch paths use forward_T.
    scores = jnp.einsum("...qhd,...khd->...hqk", q, k,
                        precision=_PRECISION) / math.sqrt(dh)
    if mask is not None:
        scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1)
    attn = _dropout(attn, rate, key, train)
    out = jnp.einsum("...hqk,...khd->...qhd", attn, v, precision=_PRECISION)
    out = out.reshape(q_in.shape)
    return dot(out, p["out_w"], p["out_b"])


def _ff(p, x, rate, key, train, dot=_rowdot_impl, fused: bool = False):
    if fused and train:
        # Pallas fused FF1+ReLU+dropout+FF2: the (rows, 2048) hidden and its
        # mask never touch HBM (see ops/ff_fused.py) — the dominant cost of
        # the training step under plain XLA.
        return ff_fused.ff_dropout(x, p["ff1"], p["ff2"], rate, key)
    h = jax.nn.relu(dot(x, p["ff1"]["w"], p["ff1"]["b"]))
    h = _dropout(h, rate, key, train)
    return dot(h, p["ff2"]["w"], p["ff2"]["b"])


def forward(params, param, latent, latent_target, tgt_mask=None, *,
            train: bool = False, rng: Optional[jax.Array] = None,
            fused_ff: bool = False):
    """Seq2seq pass.

    latent:        (..., S_past, latent_dim + 3 + heights)  encoder tokens
    latent_target: (..., S_fut, latent_dim)                 decoder tokens
    Returns (..., S_fut, latent_dim).  Leading dims arbitrary (may be absent).
    """
    d = param["features_transformer"]
    h = param["n_heads"]
    rate = param["dropout"]
    max_len = len(param["past_frames"]) + len(param["future_frames"])
    pe = positional_encoding(max_len, d)

    if train:
        rngs = iter(jax.random.split(rng, 64))
        nk = lambda: next(rngs)  # noqa: E731
        dot = _rowdot_impl  # custom_vmap doesn't compose with reverse-mode AD
    else:
        nk = lambda: None  # noqa: E731
        dot = _rowdot      # fold any outer vmap into MXU rows

    src = _dropout(latent, rate, nk(), train)            # in_dropout (enc only)
    src = dot(src, params["in_proj_enc"]["w"], params["in_proj_enc"]["b"])
    tgt = dot(latent_target, params["in_proj_dec"]["w"], params["in_proj_dec"]["b"])
    src = _dropout(src + pe[: src.shape[-2]], rate, nk(), train)  # PE dropout
    tgt = _dropout(tgt + pe[: tgt.shape[-2]], rate, nk(), train)

    # encoder (post-LN)
    for lp in params["enc_layers"]:
        a = _attention(lp["self_attn"], src, src, h, dot=dot,
                       rate=rate, key=nk(), train=train)
        src = _layer_norm(src + _dropout(a, rate, nk(), train), lp["ln1"])
        f = _ff(lp, src, rate, nk(), train, dot=dot, fused=fused_ff)
        src = _layer_norm(src + _dropout(f, rate, nk(), train), lp["ln2"])
    memory = _layer_norm(src, params["enc_norm"])

    # decoder (post-LN)
    for lp in params["dec_layers"]:
        a = _attention(lp["self_attn"], tgt, tgt, h, mask=tgt_mask, dot=dot,
                       rate=rate, key=nk(), train=train)
        tgt = _layer_norm(tgt + _dropout(a, rate, nk(), train), lp["ln1"])
        a = _attention(lp["cross_attn"], tgt, memory, h, dot=dot,
                       rate=rate, key=nk(), train=train)
        tgt = _layer_norm(tgt + _dropout(a, rate, nk(), train), lp["ln2"])
        f = _ff(lp, tgt, rate, nk(), train, dot=dot, fused=fused_ff)
        tgt = _layer_norm(tgt + _dropout(f, rate, nk(), train), lp["ln3"])
    out = _layer_norm(tgt, params["dec_norm"])

    return dot(out, params["out_proj"]["w"], params["out_proj"]["b"])


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Transposed (batch-in-lanes) inference forward
# ---------------------------------------------------------------------------

def _lin_T(x, p, precision=_PRECISION):
    """x (S, I, B) → (S, O, B): weights contract on the sublane axis, the
    batch stays in the minor (lane) dimension."""
    return jnp.einsum("oi,sib->sob", p["w"], x,
                      precision=precision) + p["b"][None, :, None]


def _ln_T(x, p, eps: float = 1e-5):
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"][None, :, None] \
        + p["b"][None, :, None]


def _attn_T(p, q_in, kv_in, n_heads: int, mask=None, fused: bool = False,
            rate: float = 0.0, seed=None, train: bool = False):
    if fused and train and rate > 0.0:
        # the fused kernel computes softmax in-kernel with no mask support;
        # torch applies dropout on the probs, so a parity-faithful training
        # step must take the non-fused path (make_train_step defaults there)
        fused = False
    d = q_in.shape[1]
    dh = d // n_heads
    wq, wk, wv = jnp.split(p["in_w"], 3, axis=0)
    bq, bk, bv = jnp.split(p["in_b"], 3, axis=0)
    q = (jnp.einsum("oi,sib->sob", wq, q_in, precision=_PRECISION)
         + bq[None, :, None]).reshape(q_in.shape[0], n_heads, dh, -1)
    k = (jnp.einsum("oi,sib->sob", wk, kv_in, precision=_PRECISION)
         + bk[None, :, None]).reshape(kv_in.shape[0], n_heads, dh, -1)
    v = (jnp.einsum("oi,sib->sob", wv, kv_in, precision=_PRECISION)
         + bv[None, :, None]).reshape(kv_in.shape[0], n_heads, dh, -1)
    if fused:
        # Training path: one Pallas pass, scores/softmax VMEM-resident
        # (ops/attn_fused.py) — the XLA mul-reduce fusions below were
        # 7.1 ms of the 21 ms B=4096 train step (~8× the roofline).
        o = attn_fused.attn_core_lanes(q, k, v, mask)
    else:
        # The tiny per-head contractions (S ≤ 15, dh = 12) as broadcast
        # multiply-REDUCES, not dot_generals: XLA lowers trailing-batch
        # dot_generals of this size through layout transposes and
        # per-batch micro-GEMMs (~440 µs/layer at B=2048); the fused
        # mul-reduce is pure VPU, measures 2.75× faster — and contracts
        # in f32 (the dots used bf16 passes).  This is the INFERENCE
        # arithmetic, part of the locked parity record (PARITY.json).
        s = (q[:, None] * k[None, :]).sum(axis=3) / math.sqrt(dh)
        if mask is not None:
            s = s + mask[:, :, None, None]                 # (Sq,Sk,h,B)
        a = jax.nn.softmax(s, axis=1)
        a = hash_dropout.dropout(a, rate, seed, train)     # torch MHA site
        o = (a[:, :, :, None] * v[None]).sum(axis=1)       # (Sq,h,dh,B)
    o = o.reshape(q_in.shape[0], d, -1)
    return (jnp.einsum("oi,sib->sob", p["out_w"], o, precision=_PRECISION)
            + p["out_b"][None, :, None])


def _ff_T(lp, x, rate, seed, train, fused: bool):
    """Feed-forward on (S, D, B) activations.  ``seed``: scalar int32.

    fused: the lanes-native Pallas kernel (ops/ff_fused.ff_dropout_lanes)
    consumes (S, D, B) column tiles directly — the (S·B, 2048) hidden and
    its mask never touch HBM, and (unlike routing through the rows
    kernel) there are NO layout transposes: a trace showed the
    (S,D,B)↔(S,B,D) copies costing ~9 ms of a 21 ms B=4096 train step.
    """
    if fused and train:
        return ff_fused.ff_dropout_lanes(x, lp["ff1"], lp["ff2"], rate, seed)
    if fused:
        # Inference: same kernel at rate 0 (mask code is statically elided)
        # and f32 MXU dots — the win is the (S, 2048, B) hidden plane never
        # round-tripping HBM between FF1 and FF2, not matmul rate, and the
        # drag-rollout parity budget wants f32.
        return ff_fused.ff_dropout_lanes(x, lp["ff1"], lp["ff2"], 0.0,
                                         jnp.int32(0), bf16=False)
    h = jax.nn.relu(_lin_T(x, lp["ff1"]))
    h = hash_dropout.dropout(h, rate, seed, train)
    return _lin_T(h, lp["ff2"])


def forward_T(params, param, latentT, latent_targetT, tgt_mask=None, *,
              train: bool = False, rng: Optional[jax.Array] = None,
              fused_ff: bool = False, fused_attn: bool = False):
    """Transposed forward: batch in the minor (lane) dimension.

    latentT:        (S_past, latent_dim + 3 + heights, B) encoder tokens
    latent_targetT: (S_fut, latent_dim, B)                decoder tokens
    Returns (S_fut, latent_dim, B).  Same math as ``forward`` on the moved
    axes; fp-equivalent rather than bitwise — the attention contractions
    run as f32 VPU multiply-reduces instead of bf16-pass dot_generals
    (both faster AND tighter; see ``_attn_T``).  Token/feature elementwise
    work runs at full 128-lane width with B in lanes instead of
    d_model=48.  ~2× the vmapped forward at B=2048.

    train=True adds dropout at the same sites as ``forward`` (masks are
    independent draws — layouts agree in distribution, and exactly when
    rate is 0); this is the TPU training layout used by
    ``train/temporal._teacher_forced_loss(layout="lanes")``.  Masks here
    are counter-hash (ops/hash_dropout.py) — ONE tiny threefry draw per
    step for the per-site seeds, then iota-hash masks that fuse into
    their consuming selects (``jax.random.bernoulli`` per site was
    5.9 ms of the 25.5 ms B=4096 train step).
    """
    d = param["features_transformer"]
    h = param["n_heads"]
    rate = param["dropout"]
    max_len = len(param["past_frames"]) + len(param["future_frames"])
    pe = positional_encoding(max_len, d)

    if train:
        seeds = iter(hash_dropout.seeds_for(rng, 64))
        nk = lambda: next(seeds)  # noqa: E731
    else:
        nk = lambda: None  # noqa: E731
    drop = lambda x, s: hash_dropout.dropout(x, rate, s, train)  # noqa: E731

    src = drop(latentT, nk())                         # in_dropout (enc only)
    src = _lin_T(src, params["in_proj_enc"])
    tgt = _lin_T(latent_targetT, params["in_proj_dec"])
    src = drop(src + pe[: src.shape[0], :, None], nk())
    tgt = drop(tgt + pe[: tgt.shape[0], :, None], nk())

    for lp in params["enc_layers"]:
        a = _attn_T(lp["self_attn"], src, src, h, fused=fused_attn,
                    rate=rate, seed=nk(), train=train)
        src = _ln_T(src + drop(a, nk()), lp["ln1"])
        f = _ff_T(lp, src, rate, nk(), train, fused_ff)
        src = _ln_T(src + drop(f, nk()), lp["ln2"])
    memory = _ln_T(src, params["enc_norm"])

    for lp in params["dec_layers"]:
        a = _attn_T(lp["self_attn"], tgt, tgt, h, mask=tgt_mask,
                    fused=fused_attn, rate=rate, seed=nk(), train=train)
        tgt = _ln_T(tgt + drop(a, nk()), lp["ln1"])
        a = _attn_T(lp["cross_attn"], tgt, memory, h, fused=fused_attn,
                    rate=rate, seed=nk(), train=train)
        tgt = _ln_T(tgt + drop(a, nk()), lp["ln2"])
        f = _ff_T(lp, tgt, rate, nk(), train, fused_ff)
        tgt = _ln_T(tgt + drop(f, nk()), lp["ln3"])
    out = _ln_T(tgt, params["dec_norm"])
    return _lin_T(out, params["out_proj"])
