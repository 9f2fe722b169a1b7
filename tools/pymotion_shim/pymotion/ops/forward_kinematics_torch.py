"""Torch forward kinematics (pymotion-compatible subset)."""

from __future__ import annotations

import torch

from pymotion.rotations import quat_torch as quat


def fk(rot, global_pos, offsets, parents):
    """Local rotations (slot 0 = root world rotation) → world positions and
    3×3 rotation matrices.

    rot: (..., J, 4); global_pos: broadcastable to (..., 3);
    offsets: (J, 3) or broadcastable to (..., J, 3); parents: (J,).
    """
    if not torch.is_tensor(rot):
        rot = torch.as_tensor(rot)
    n = rot.shape[-2]
    offsets = torch.as_tensor(offsets, dtype=rot.dtype)
    if offsets.dim() < rot.dim():
        offsets = torch.broadcast_to(offsets, rot.shape[:-1] + (3,))
    global_pos = torch.as_tensor(global_pos, dtype=rot.dtype)
    global_pos = torch.broadcast_to(global_pos, rot.shape[:-2] + (3,))

    world = [None] * n
    pos = [None] * n
    world[0] = rot[..., 0, :]
    pos[0] = global_pos
    for j in range(1, n):
        p = int(parents[j])
        world[j] = quat.mul(world[p], rot[..., j, :])
        pos[j] = pos[p] + quat.mul_vec(world[p], offsets[..., j, :])
    positions = torch.stack(pos, dim=-2)
    rotmats = quat.to_matrix(torch.stack(world, dim=-2))
    return positions, rotmats
