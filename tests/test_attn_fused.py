"""Fused attention-core kernel (ops/attn_fused.py) — correctness.

The kernel computes the same f32 contraction arithmetic as the plain
mul-reduce formulation in ``models/temporal._attn_T`` (plus the standard
max-subtraction inside softmax, which ``jax.nn.softmax`` also performs),
so forward AND gradients must match plain autodiff to f32 rounding —
unlike the dropout kernels there is no mask to extract.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dragposer_tpu.ops import attn_fused


def _plain(q, k, v, mask=None):
    dh = q.shape[2]
    s = (q[:, None] * k[None, :]).sum(axis=3) / math.sqrt(dh)
    if mask is not None:
        s = s + mask[:, :, None, None]
    a = jax.nn.softmax(s, axis=1)
    return (a[:, :, :, None] * v[None]).sum(axis=1)


def _qkv(key, sq, sk, h, dh, b):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (sq, h, dh, b)),
            jax.random.normal(kk, (sk, h, dh, b)),
            jax.random.normal(kv, (sk, h, dh, b)))


@pytest.mark.parametrize("sq,sk,b", [(15, 15, 64), (15, 14, 130), (1, 15, 8)])
def test_forward_matches_plain(sq, sk, b):
    q, k, v = _qkv(jax.random.PRNGKey(0), sq, sk, 4, 12, b)
    np.testing.assert_allclose(attn_fused.attn_core_lanes(q, k, v),
                               _plain(q, k, v), rtol=1e-5, atol=1e-5)


def test_forward_with_causal_mask():
    sq = sk = 15
    q, k, v = _qkv(jax.random.PRNGKey(1), sq, sk, 4, 12, 32)
    mask = jnp.where(jnp.tril(jnp.ones((sq, sk), bool)), 0.0, -jnp.inf)
    got = attn_fused.attn_core_lanes(q, k, v, mask)
    np.testing.assert_allclose(got, _plain(q, k, v, mask),
                               rtol=1e-5, atol=1e-5)
    # masked-out future keys must have exactly zero influence
    v2 = v.at[5:].add(100.0)
    got_row0 = attn_fused.attn_core_lanes(q, k, v2, mask)[0]
    np.testing.assert_allclose(got_row0,
                               attn_fused.attn_core_lanes(q, k, v, mask)[0],
                               rtol=1e-6, atol=1e-6)


def test_grads_match_plain_autodiff():
    q, k, v = _qkv(jax.random.PRNGKey(2), 15, 15, 4, 12, 64)
    mask = jnp.where(jnp.tril(jnp.ones((15, 15), bool)), 0.0, -jnp.inf)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(attn_fused.attn_core_lanes(q, k, v, mask)))

    def loss_plain(q, k, v):
        return jnp.sum(jnp.sin(_plain(q, k, v, mask)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gp, ["dq", "dk", "dv"]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, err_msg=name)


def test_lane_padding_no_leak():
    """B not a multiple of the lane tile: results equal an unpadded run
    lane-for-lane, and gradients see no phantom contributions."""
    q, k, v = _qkv(jax.random.PRNGKey(3), 15, 15, 4, 12, 130)
    full = attn_fused.attn_core_lanes(q, k, v)
    np.testing.assert_allclose(full, _plain(q, k, v), rtol=1e-5, atol=1e-5)

    def loss(q, k, v):
        return jnp.sum(attn_fused.attn_core_lanes(q, k, v) ** 2)

    gq = jax.grad(loss)(q, k, v)
    gq_ref = jax.grad(lambda q, k, v: jnp.sum(_plain(q, k, v) ** 2))(q, k, v)
    np.testing.assert_allclose(gq, gq_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.heavy
def test_model_wiring_fused_attn_matches_plain():
    """forward_T(fused_attn=True) == forward_T(fused_attn=False) at
    dropout 0 (same arithmetic, f32 rounding only).

    Tolerance is looser than the kernel-level tests above: this compares the
    outputs of the full 6+6-block transformer, where per-op f32 rounding
    differences (reduction order inside the kernel vs XLA's fusion choices,
    which vary across compiler versions) amplify through the LayerNorms of
    every block.  Per-op equivalence is locked at 1e-5 by the four tests
    above; this test only guards the model-level wiring (head split, mask
    plumbing, residual placement), for which 1e-2 is far below any wiring
    bug's signature.
    """
    from dragposer_tpu.config import TEMPORAL_PARAM
    from dragposer_tpu.models import temporal as tmodel

    param = dict(TEMPORAL_PARAM, dropout=0.0)
    key = jax.random.PRNGKey(4)
    params = tmodel.init_params(key, param)
    b = 6
    sp = len(param["past_frames"])
    sf = len(param["future_frames"])
    d_in = param["latent_dim"] + 3 + len(param["height_indices"])
    latT = jax.random.normal(key, (sp, d_in, b))
    latT_t = jax.random.normal(key, (sf, param["latent_dim"], b))
    mask = tmodel.causal_mask(sf)
    rng = jax.random.PRNGKey(5)
    y0 = tmodel.forward_T(params, param, latT, latT_t, tgt_mask=mask,
                          train=True, rng=rng, fused_attn=False)
    y1 = tmodel.forward_T(params, param, latT, latT_t, tgt_mask=mask,
                          train=True, rng=rng, fused_attn=True)
    np.testing.assert_allclose(y1, y0, rtol=1e-2, atol=1e-3)
