"""Result export: normalized pose streams → BVH files.

Mirrors the reference's ``result_to_bvh`` (``python/src/train.py:437-509``):
denormalize quaternion channels, optionally integrate incremental root
rotations/displacements with a drift reset to ground truth every
``correct_drift_frames`` frames, convert root-space → local, and write Euler
degrees back into a BVH.
"""

from __future__ import annotations

import copy
from typing import Dict, Optional

import numpy as np

from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops import fk, host_device, quat
from dragposer_tpu.ops.topology import Skeleton


def result_to_bvh(
    poses: np.ndarray,                    # (F, J*4) normalized quat channels
    means: Dict[str, np.ndarray],
    stds: Dict[str, np.ndarray],
    bvh: BVH,
    skeleton: Skeleton,
    *,
    displacement: Optional[np.ndarray] = None,   # (F, 3) normalized root-space
    global_pos: Optional[np.ndarray] = None,     # (F, 3) world root positions
    are_root_rot_incr: bool = True,
    correct_drift_frames: int = 64,
    gt_rotations: Optional[np.ndarray] = None,   # (F, 4) GT root quats for drift reset
) -> BVH:
    with host_device():
        return _result_to_bvh(
            poses, means, stds, bvh, skeleton,
            displacement=displacement, global_pos=global_pos,
            are_root_rot_incr=are_root_rot_incr,
            correct_drift_frames=correct_drift_frames,
            gt_rotations=gt_rotations,
        )


def _result_to_bvh(poses, means, stds, bvh, skeleton, *, displacement,
                   global_pos, are_root_rot_incr, correct_drift_frames,
                   gt_rotations):
    frames = poses.shape[0]
    mean_q = means["dqs"].reshape(-1, 8)[:, :4].reshape(-1)
    std_q = stds["dqs"].reshape(-1, 8)[:, :4].reshape(-1)
    qs = (poses * std_q + mean_q).reshape(frames, -1, 4).astype(np.float64)

    if are_root_rot_incr:
        assert gt_rotations is not None, "drift reset needs GT root rotations"
        # Integrate incremental root rotations, resetting to GT at every
        # block start — vectorized as a per-block quaternion prefix product
        # (associative scan) instead of the reference's frame loop.
        qs[:, 0, :] = _integrate_blocks(
            qs[:, 0, :], gt_rotations, correct_drift_frames
        )

    local = np.asarray(fk.from_root_quat(qs.astype(np.float32), skeleton))
    order_idx = quat.order_to_indices(bvh.rot_order)
    rotations = np.degrees(np.asarray(quat.to_euler(local, order_idx[None])))

    out = copy.deepcopy(bvh)
    out.rotations = rotations
    positions = bvh.positions[:frames].copy()
    if global_pos is not None:
        positions[:, 0, :] = global_pos
    elif displacement is not None:
        disp = (
            displacement * stds["displacement"] + means["displacement"]
        ).astype(np.float64)
        world_dis = np.asarray(quat.mul_vec(local[:, 0, :], disp.astype(np.float32)))
        # per-block cumulative sums anchored at the block-start GT position
        block = correct_drift_frames
        for start in range(0, frames, block):
            end = min(start + block, frames)
            seg = np.cumsum(world_dis[start + 1 : end], axis=0)
            positions[start + 1 : end, 0, :] = positions[start, 0, :] + seg
    out.positions = positions
    return out


def _integrate_blocks(incr: np.ndarray, gt: np.ndarray, block: int) -> np.ndarray:
    """Prefix quaternion products within blocks; block starts come from GT."""
    import jax

    frames = incr.shape[0]
    n_blocks = -(-frames // block)
    padded = np.tile(np.array([1.0, 0, 0, 0]), (n_blocks * block, 1))
    padded[:frames] = incr
    padded[::block] = gt[::block][:n_blocks]
    blocks = padded.reshape(n_blocks, block, 4).astype(np.float32)
    acc = jax.lax.associative_scan(quat.mul, blocks, axis=1)
    return np.asarray(acc).reshape(-1, 4)[:frames]
