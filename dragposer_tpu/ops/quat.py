"""Quaternion kernels (JAX, fully batched).

Conventions (identical to the reference pipeline, which uses pymotion):

* scalar-first storage ``[w, x, y, z]`` on the last axis;
* rotation matrices act on column vectors (``R @ v``);
* Euler angles are in radians and compose *in channel order*: for an order
  ``"xyz"`` the matrix is ``Rx(a) @ Ry(b) @ Rz(c)`` — the BVH convention
  (first listed channel is the outermost rotation).

All functions are elementwise over arbitrary leading batch dims and are safe
under ``jit`` / ``vmap`` / ``grad``.  Reference behaviors being mirrored:
euler ingest ``python/src/train.py:329-341``, decode-time re-normalization
``python/src/autoencoder.py:241-253``, incremental-root accumulation
``python/src/train.py:472-501``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Static axis-name → index mapping used for Euler orders.
_AXIS_INDEX = {"x": 0, "y": 1, "z": 2}

# Permutation parity of (i, j, k) relative to (0, 1, 2):
# +1 for even (xyz, yzx, zxy), -1 for odd (xzy, yxz, zyx).
_EVEN_PERMS = {(0, 1, 2), (1, 2, 0), (2, 0, 1)}


def mul(q1, q2):
    """Hamilton product ``q1 ⊗ q2`` (applies q2's rotation first)."""
    w1, x1, y1, z1 = jnp.split(q1, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=-1,
    )


def conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def inverse(q):
    """True quaternion inverse ``conj(q) / |q|²`` (== conjugate for unit q)."""
    return conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def normalize(q, eps: float = 0.0):
    """Unit-normalize along the last axis (reference: quat_torch.normalize)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return q / n


def dot(q1, q2):
    return jnp.sum(q1 * q2, axis=-1)


def mul_vec(q, v):
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``.

    Uses the expanded sandwich product ``v + 2 q_w (q_v × v) + 2 q_v × (q_v × v)``.
    """
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def unroll(q, axis: int = 0):
    """Enforce sign continuity along ``axis``.

    Flips ``q[i]`` whenever its dot product with the (already unrolled)
    previous element is negative.  Implemented as a cumulative product of
    consecutive-dot signs, which is exactly equivalent to the sequential
    definition and fully parallel.
    """
    q = jnp.moveaxis(q, axis, 0)
    d = jnp.sum(q[1:] * q[:-1], axis=-1)  # raw consecutive dots
    signs = jnp.where(d < 0.0, -1.0, 1.0).astype(q.dtype)
    flips = jnp.concatenate(
        (jnp.ones_like(signs[:1]), jnp.cumprod(signs, axis=0)), axis=0
    )
    return jnp.moveaxis(q * flips[..., None], 0, axis)


def to_matrix(q):
    """Quaternion → 3×3 rotation matrix (valid for unit quaternions)."""
    w, x, y, z = jnp.split(q, 4, axis=-1)
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    one = jnp.ones_like(w)
    m = jnp.stack(
        (
            jnp.concatenate((one - (yy + zz), xy - wz, xz + wy), axis=-1),
            jnp.concatenate((xy + wz, one - (xx + zz), yz - wx), axis=-1),
            jnp.concatenate((xz - wy, yz + wx, one - (xx + yy)), axis=-1),
        ),
        axis=-2,
    )
    return m


def from_matrix(m):
    """3×3 rotation matrix → unit quaternion (branchless Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically strongest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5

    c0 = jnp.stack([qw[..., 0], (m21 - m12) / (4.0 * qw[..., 0]),
                    (m02 - m20) / (4.0 * qw[..., 0]), (m10 - m01) / (4.0 * qw[..., 0])], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4.0 * qw[..., 1]), qw[..., 1],
                    (m01 + m10) / (4.0 * qw[..., 1]), (m02 + m20) / (4.0 * qw[..., 1])], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4.0 * qw[..., 2]), (m01 + m10) / (4.0 * qw[..., 2]),
                    qw[..., 2], (m12 + m21) / (4.0 * qw[..., 2])], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4.0 * qw[..., 3]), (m02 + m20) / (4.0 * qw[..., 3]),
                    (m12 + m21) / (4.0 * qw[..., 3]), qw[..., 3]], axis=-1)

    choice = jnp.argmax(qw, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, choice[..., None, None], axis=-2)[..., 0, :]
    return normalize(q)


def _axis_quat(axis_index, angle):
    """Quaternion for a rotation of ``angle`` about basis axis ``axis_index``.

    ``axis_index`` is an integer array broadcastable to ``angle``.
    """
    half = 0.5 * angle
    s = jnp.sin(half)
    w = jnp.cos(half)
    x = jnp.where(axis_index == 0, s, 0.0)
    y = jnp.where(axis_index == 1, s, 0.0)
    z = jnp.where(axis_index == 2, s, 0.0)
    return jnp.stack((w, x, y, z), axis=-1)


def order_to_indices(order) -> np.ndarray:
    """Host-side: per-joint Euler order chars → int axis indices.

    ``order``: array-like of shape (..., 3) of 'x'/'y'/'z' (any case).
    Returns an int32 numpy array of the same shape.
    """
    arr = np.asarray(order)
    flat = np.array([_AXIS_INDEX[str(c).lower()] for c in arr.reshape(-1)],
                    dtype=np.int32)
    return flat.reshape(arr.shape)


def from_euler(angles, order_idx):
    """Euler (radians, channel order) → quaternion.

    ``angles``: (..., 3); ``order_idx``: int array (..., 3) or (J, 3)
    broadcastable to angles, giving the axis of each channel.
    Composition: ``q = q(order[0]) ⊗ q(order[1]) ⊗ q(order[2])``.
    """
    order_idx = jnp.broadcast_to(jnp.asarray(order_idx), angles.shape)
    q0 = _axis_quat(order_idx[..., 0], angles[..., 0])
    q1 = _axis_quat(order_idx[..., 1], angles[..., 1])
    q2 = _axis_quat(order_idx[..., 2], angles[..., 2])
    return mul(mul(q0, q1), q2)


def to_euler(q, order_idx):
    """Quaternion → Euler angles (radians) in the given channel order.

    Inverts :func:`from_euler` for all six Tait–Bryan orders.  For order
    (i, j, k) with parity ε:  b = asin(ε·R[i,k]); a = atan2(-ε·R[j,k], R[k,k]);
    c = atan2(-ε·R[i,j], R[i,i]).
    """
    order_idx = jnp.broadcast_to(jnp.asarray(order_idx), q.shape[:-1] + (3,))
    i = order_idx[..., 0]
    j = order_idx[..., 1]
    k = order_idx[..., 2]
    # parity: ε = +1 iff (i,j,k) is an even permutation of (0,1,2).
    # For a permutation of 3 distinct elements: even iff (j == (i+1) % 3).
    eps = jnp.where(j == (i + 1) % 3, 1.0, -1.0).astype(q.dtype)

    m = to_matrix(q)

    def g(r, c):
        return jnp.take_along_axis(
            jnp.take_along_axis(m, r[..., None, None], axis=-2),
            c[..., None, None], axis=-1,
        )[..., 0, 0]

    r_ik = g(i, k)
    r_jk = g(j, k)
    r_kk = g(k, k)
    r_ij = g(i, j)
    r_ii = g(i, i)
    r_ji = g(j, i)
    r_jj = g(j, j)

    sin_b = jnp.clip(eps * r_ik, -1.0, 1.0)
    b = jnp.arcsin(sin_b)
    a = jnp.arctan2(-eps * r_jk, r_kk)
    c = jnp.arctan2(-eps * r_ij, r_ii)

    # Gimbal lock (|b| = π/2): the regular atan2 arguments vanish (catastrophic
    # f32 cancellation), so detect the lock from their magnitude rather than
    # sin_b, and fold the combined angle into `a` (with c = 0):
    # a_lock = atan2(sign(b)·R[j,i], R[j,j]) — holds for all six orders.
    locked = (r_jk * r_jk + r_kk * r_kk) < 1e-10
    pole = jnp.sign(sin_b)
    a = jnp.where(locked, jnp.arctan2(pole * r_ji, r_jj), a)
    c = jnp.where(locked, jnp.zeros_like(c), c)
    return jnp.stack((a, b, c), axis=-1)
