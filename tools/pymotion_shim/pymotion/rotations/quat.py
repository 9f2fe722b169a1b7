"""NumPy quaternion API compatible with the subset of upc-pymotion the
reference implementation imports.  Independent implementation used only to
*execute the reference code* for golden-trajectory generation (the package
itself is not installable in this environment).

Conventions: scalar-first wxyz; Euler angles compose in channel order
(first listed channel outermost); all ops broadcast over leading dims.
"""

from __future__ import annotations

import numpy as np

_AXIS = {"x": 0, "y": 1, "z": 2}


def normalize(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def inverse(q):
    conj = q * np.array([1.0, -1.0, -1.0, -1.0])
    return conj / np.sum(q * q, axis=-1, keepdims=True)


def mul(q1, q2):
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return np.stack(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=-1,
    )


def mul_vec(q, v):
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * np.cross(qv, v)
    return v + qw * t + np.cross(qv, t)


def unroll(q, axis=0):
    q = np.moveaxis(np.array(q, copy=True), axis, 0)
    for i in range(1, q.shape[0]):
        d = np.sum(q[i] * q[i - 1], axis=-1, keepdims=True)
        q[i] = np.where(d < 0, -q[i], q[i])
    return np.moveaxis(q, 0, axis)


def _axis_quat(axis_idx, angle):
    half = 0.5 * angle
    s = np.sin(half)
    out = np.zeros(angle.shape + (4,))
    out[..., 0] = np.cos(half)
    for a in range(3):
        out[..., 1 + a] = np.where(axis_idx == a, s, out[..., 1 + a])
    return out


def _order_to_idx(order):
    arr = np.asarray(order)
    flat = np.array([_AXIS[str(c).lower()] for c in arr.reshape(-1)])
    return flat.reshape(arr.shape)


def from_euler(angles, order):
    idx = np.broadcast_to(_order_to_idx(order), angles.shape)
    q = _axis_quat(idx[..., 0], angles[..., 0])
    q = mul(q, _axis_quat(idx[..., 1], angles[..., 1]))
    return mul(q, _axis_quat(idx[..., 2], angles[..., 2]))


def to_matrix(q):
    w, x, y, z = (q[..., i] for i in range(4))
    x2, y2, z2 = x + x, y + y, z + z
    xx, yy, zz = x * x2, y * y2, z * z2
    wx, wy, wz = w * x2, w * y2, w * z2
    xy, xz, yz = x * y2, x * z2, y * z2
    m = np.empty(q.shape[:-1] + (3, 3))
    m[..., 0, 0] = 1 - (yy + zz)
    m[..., 0, 1] = xy - wz
    m[..., 0, 2] = xz + wy
    m[..., 1, 0] = xy + wz
    m[..., 1, 1] = 1 - (xx + zz)
    m[..., 1, 2] = yz - wx
    m[..., 2, 0] = xz - wy
    m[..., 2, 1] = yz + wx
    m[..., 2, 2] = 1 - (xx + yy)
    return m


def to_euler(q, order):
    idx = np.broadcast_to(_order_to_idx(order), q.shape[:-1] + (3,))
    i, j, k = idx[..., 0], idx[..., 1], idx[..., 2]
    eps = np.where(j == (i + 1) % 3, 1.0, -1.0)
    m = to_matrix(q)

    def g(r, c):
        return np.take_along_axis(
            np.take_along_axis(m, r[..., None, None], axis=-2),
            c[..., None, None], axis=-1,
        )[..., 0, 0]

    sin_b = np.clip(eps * g(i, k), -1.0, 1.0)
    b = np.arcsin(sin_b)
    a = np.arctan2(-eps * g(j, k), g(k, k))
    c = np.arctan2(-eps * g(i, j), g(i, i))
    locked = (g(j, k) ** 2 + g(k, k) ** 2) < 1e-10
    a = np.where(locked, np.arctan2(np.sign(sin_b) * g(j, i), g(j, j)), a)
    c = np.where(locked, 0.0, c)
    return np.stack((a, b, c), axis=-1)
