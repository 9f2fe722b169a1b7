"""Dual-quaternion kernels (JAX, batched).

A dual quaternion is stored as 8 floats on the last axis: ``[real(4), dual(4)]``
with the real part a unit rotation quaternion and the dual part
``0.5 · t_quat ⊗ real`` encoding translation ``t``.

Mirrors the behaviors the reference relies on from pymotion
(``python/src/motion_data.py:58-72``): construction from rotation +
translation, extraction back, and time-axis sign unrolling.
"""

from __future__ import annotations

import jax.numpy as jnp

from dragposer_tpu.ops import quat


def from_rotation_translation(q, t):
    """Build dual quaternions from unit rotations ``q`` (...,4) and translations ``t`` (...,3)."""
    t_quat = jnp.concatenate((jnp.zeros_like(t[..., :1]), t), axis=-1)
    dual = 0.5 * quat.mul(t_quat, q)
    return jnp.concatenate((q, dual), axis=-1)


def to_rotation_translation(dq):
    """Inverse of :func:`from_rotation_translation` → (rotations (...,4), translations (...,3))."""
    real = dq[..., :4]
    dual = dq[..., 4:]
    t_quat = 2.0 * quat.mul(dual, quat.inverse(real))
    return real, t_quat[..., 1:]


def unroll(dq, axis: int = 0):
    """Sign continuity along ``axis`` based on the real part.

    ``dq`` and ``-dq`` encode the same rigid transform; flip whole dual quats
    so consecutive real parts have non-negative dot products (cumulative, same
    semantics as :func:`dragposer_tpu.ops.quat.unroll`).
    """
    dq = jnp.moveaxis(dq, axis, 0)
    real = dq[..., :4]
    d = jnp.sum(real[1:] * real[:-1], axis=-1)
    signs = jnp.where(d < 0.0, -1.0, 1.0).astype(dq.dtype)
    flips = jnp.concatenate(
        (jnp.ones_like(signs[:1]), jnp.cumprod(signs, axis=0)), axis=0
    )
    return jnp.moveaxis(dq * flips[..., None], 0, axis)
