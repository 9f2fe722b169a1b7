"""Forward kinematics & root-space transforms (JAX, batched, TPU-parallel).

The reference walks the parent chain joint-by-joint with 4×4 matmuls
(``python/src/utils.py:109-149``) and converts root-space→local with a
reversed Python loop (``utils.py:6-31``, ``loss.py:7-32``).  Because the pose
representation is *root-space* (each joint's rotation is already composed
from the root's child down to the joint), both collapse to fully parallel
forms on TPU:

* world rotation:  ``world[j] = world_root ⊗ rootspace[j]`` — one batched
  quaternion product;
* world position:  ``pos = root_pos + A @ contrib`` with the static ancestor
  matrix ``A`` and ``contrib[j] = rotate(world[parent[j]], offset[j])`` — one
  small matmul on the MXU;
* root-space → local: ``local[j] = inv(rootspace[parent[j]]) ⊗ rootspace[j]``
  — a parallel gather (the reference's reversed loop reads pre-update parent
  values, so this is exactly equivalent).

For *local*-rotation inputs (BVH evaluation) the world rotations need a chain
composition; we do it level-by-level over the static depth schedule
(≤ 8 levels for the 22-joint skeleton) and then reuse the parallel position
form.  All functions broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

from dragposer_tpu.ops import quat
from dragposer_tpu.ops.topology import Skeleton

_MM_PRECISION = "highest"  # parity-critical small matmuls stay f32


def _positions_from_world(world_rot, root_pos, skeleton: Skeleton):
    """Parallel joint positions given world rotations of every joint.

    ``world_rot``: (..., J, 4); ``root_pos``: (..., 3).
    """
    offsets = jnp.asarray(skeleton.offsets)
    parents = jnp.asarray(skeleton.parents)
    parent_rot = jnp.take(world_rot, parents, axis=-2)
    contrib = quat.mul_vec(parent_rot, jnp.broadcast_to(offsets, world_rot.shape[:-1] + (3,)))
    # contrib[0] corresponds to the root whose ancestor-matrix row is zero.
    pos = jnp.matmul(
        jnp.asarray(skeleton.ancestors), contrib, precision=_MM_PRECISION
    )
    return pos + root_pos[..., None, :]


def fk_root_space(rootspace_q, root_pos, skeleton: Skeleton):
    """FK for a root-space pose.  Slot 0 must hold the root's world rotation.

    Returns ``(positions (...,J,3), world rotations (...,J,4))``.
    Matches the reference's ``from_root_quat_to_rotmat`` → ``fk_rotmat``
    composition (``drag_pose.py:95-113``) exactly, up to fp reassociation.
    """
    rootspace_q = jnp.asarray(rootspace_q)
    root = rootspace_q[..., :1, :]
    world = jnp.concatenate(
        (root, quat.mul(root, rootspace_q[..., 1:, :])), axis=-2
    )
    pos = _positions_from_world(world, root_pos, skeleton)
    return pos, world


def fk_local(local_q, root_pos, skeleton: Skeleton):
    """FK for local rotations (slot 0 = root world rotation).

    Level-parallel chain composition; mirrors pymotion's ``fk`` as used by
    ``eval_drag.py:190-195`` and ``eval_metrics.py:14-24``.
    Returns ``(positions (...,J,3), world rotations (...,J,4))``.
    """
    local_q = jnp.asarray(local_q)
    world = local_q
    for level in skeleton.levels[1:]:
        idx = jnp.asarray(level)
        parent_idx = jnp.asarray(skeleton.parents[level])
        upd = quat.mul(
            jnp.take(world, parent_idx, axis=-2), jnp.take(local_q, idx, axis=-2)
        )
        world = world.at[..., idx, :].set(upd)
    pos = _positions_from_world(world, root_pos, skeleton)
    return pos, world


def from_root_quat(rootspace_q, skeleton: Skeleton):
    """Root-space quats → parent-local quats (slot 0 passed through).

    Parallel equivalent of the reference's reversed loop
    (``train.py:409-434`` / ``loss.py:7-32``).
    """
    rootspace_q = jnp.asarray(rootspace_q)
    parents = jnp.asarray(skeleton.parents)
    parent_q = jnp.take(rootspace_q, parents, axis=-2)
    local = quat.mul(quat.inverse(parent_q), rootspace_q)
    keep = (skeleton.parents == 0)  # root and the root's direct children
    keep = jnp.asarray(keep)[..., None]
    return jnp.where(keep, rootspace_q, local)


def to_root_space(local_q, root_pos, skeleton: Skeleton):
    """Local rotations → root-space rotations and root-frame positions.

    The accumulation starts from identity at the root (the root's own world
    rotation is *not* folded into descendants), matching pymotion's
    ``to_root_dual_quat`` as consumed by ``motion_data.py:58-70``.
    Slot 0 of the returned rotations is ``local_q[..., 0, :]`` (the root's
    world rotation) and slot 0 of positions is ``root_pos``.
    """
    local_q = jnp.asarray(local_q)
    identity = jnp.zeros((4,), dtype=local_q.dtype).at[0].set(1.0)
    # Compose down the levels with R[root] = identity; level-1 joints
    # (children of the root) then already equal their local rotations.
    rs = local_q.at[..., 0, :].set(identity)
    for level in skeleton.levels[2:]:  # level-1 joints already equal local
        idx = jnp.asarray(level)
        parent_idx = jnp.asarray(skeleton.parents[level])
        upd = quat.mul(
            jnp.take(rs, parent_idx, axis=-2), jnp.take(local_q, idx, axis=-2)
        )
        rs = rs.at[..., idx, :].set(upd)
    pos = _positions_from_world(rs, root_pos, skeleton)
    rs = rs.at[..., 0, :].set(local_q[..., 0, :])
    return rs, pos
