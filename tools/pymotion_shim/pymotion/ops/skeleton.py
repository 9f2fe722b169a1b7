"""Skeleton ops (pymotion-compatible subset; NumPy)."""

from __future__ import annotations

import numpy as np

from pymotion.rotations import dual_quat, quat


def to_root_dual_quat(rotations, global_pos, parents, offsets):
    """Local rotations → root-space dual quaternions.

    rotations: (..., J, 4) local (slot 0 = root world rotation)
    global_pos: (..., 3) root translation
    Root slot keeps the root's own rotation + global_pos; descendants
    accumulate from identity at the root (the root's rotation is NOT folded
    into them).
    """
    n = len(parents)
    rs_rot = np.zeros_like(rotations)
    rs_pos = np.zeros(rotations.shape[:-2] + (n, 3))
    identity = np.array([1.0, 0, 0, 0])
    rs_rot[..., 0, :] = identity
    rs_pos[..., 0, :] = global_pos
    for j in range(1, n):
        p = int(parents[j])
        rs_rot[..., j, :] = quat.mul(rs_rot[..., p, :], rotations[..., j, :])
        rs_pos[..., j, :] = rs_pos[..., p, :] + quat.mul_vec(
            rs_rot[..., p, :], np.broadcast_to(offsets[j], rs_pos[..., j, :].shape)
        )
    rs_rot[..., 0, :] = rotations[..., 0, :]
    return dual_quat.from_rotation_translation(rs_rot, rs_pos)


def from_root_dual_quat(dq, parents):
    """Root-space dual quaternions → (positions, local rotations)."""
    rot, pos = dual_quat.to_rotation_translation(dq)
    n = len(parents)
    local = np.array(rot, copy=True)
    for j in reversed(range(1, n)):
        p = int(parents[j])
        if p == 0:
            continue
        local[..., j, :] = quat.mul(
            quat.inverse(rot[..., p, :]), rot[..., j, :]
        )
    return pos, local
