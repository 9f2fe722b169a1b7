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
from dragposer_tpu.ops import fk, quat
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
    frames = poses.shape[0]
    mean_q = means["dqs"].reshape(-1, 8)[:, :4].reshape(-1)
    std_q = stds["dqs"].reshape(-1, 8)[:, :4].reshape(-1)
    qs = (poses * std_q + mean_q).reshape(frames, -1, 4).astype(np.float64)

    if are_root_rot_incr:
        assert gt_rotations is not None, "drift reset needs GT root rotations"
        # integrate incremental root rotations; reset to GT every block
        for i in range(0, frames, correct_drift_frames):
            qs[i, 0, :] = gt_rotations[i]
            for j in range(1, correct_drift_frames):
                if i + j >= frames:
                    break
                qs[i + j, 0, :] = np.asarray(
                    quat.mul(qs[i + j - 1, 0, :], qs[i + j, 0, :])
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
        for i in range(0, frames, correct_drift_frames):
            for j in range(1, correct_drift_frames):
                if i + j >= frames:
                    break
                positions[i + j, 0, :] = positions[i + j - 1, 0, :] + world_dis[i + j]
    out.positions = positions
    return out
