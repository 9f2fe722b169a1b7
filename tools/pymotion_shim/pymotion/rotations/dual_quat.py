"""NumPy dual-quaternion API (pymotion-compatible subset)."""

from __future__ import annotations

import numpy as np

from pymotion.rotations import quat


def from_rotation_translation(q, t):
    t_quat = np.concatenate((np.zeros_like(t[..., :1]), t), axis=-1)
    dual = 0.5 * quat.mul(t_quat, q)
    return np.concatenate((q, dual), axis=-1)


def to_rotation_translation(dq):
    real = dq[..., :4]
    dual = dq[..., 4:]
    t_quat = 2.0 * quat.mul(dual, quat.inverse(real))
    return real, t_quat[..., 1:]


def unroll(dq, axis=0):
    dq = np.moveaxis(np.array(dq, copy=True), axis, 0)
    for i in range(1, dq.shape[0]):
        d = np.sum(dq[i, ..., :4] * dq[i - 1, ..., :4], axis=-1, keepdims=True)
        dq[i] = np.where(d < 0, -dq[i], dq[i])
    return np.moveaxis(dq, 0, axis)
