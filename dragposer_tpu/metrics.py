"""Evaluation metrics: MPJPE / MPEEPE (reference ``python/src/eval_metrics.py``).

Both sequences are FK-ed with the root *translation* zeroed (root rotation
kept), so only pose — not trajectory — is measured.  MPJPE averages the
per-joint L2 error over all joints and frames; MPEEPE averages over the
sparse end-effector joints, root excluded.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops import fk
from dragposer_tpu.ops.topology import Skeleton

SPARSE_JOINTS = (0, 4, 8, 13, 17, 21)


def positional_error(
    gt_bvh: BVH,
    eval_bvh: BVH,
    *,
    downsample_gt: int = 1,
    sparse_joints: Sequence[int] = SPARSE_JOINTS,
) -> Tuple[float, float]:
    """Returns (MPJPE, MPEEPE) in skeleton units (meters for AMASS data)."""
    from dragposer_tpu.ops import host_device

    gt_rots, _, gt_parents, gt_offsets, _ = encoding.info_from_bvh(gt_bvh)
    if downsample_gt > 1:
        gt_rots = gt_rots[::downsample_gt]
    with host_device():
        gt_sk = Skeleton.build(gt_parents, gt_offsets)
        gt_pos, _ = fk.fk_local(gt_rots, np.zeros((gt_rots.shape[0], 3)), gt_sk)
        gt_pos = np.asarray(gt_pos)

        rots, _, parents, offsets, _ = encoding.info_from_bvh(eval_bvh)
        sk = Skeleton.build(parents, offsets)
        pos, _ = fk.fk_local(rots, np.zeros((rots.shape[0], 3)), sk)
        pos = np.asarray(pos)

    n = min(pos.shape[0], gt_pos.shape[0])
    err = np.linalg.norm(pos[:n] - gt_pos[:n], axis=-1)
    sparse_err = err[:, list(sparse_joints)[1:]]  # root excluded
    return float(err.mean()), float(sparse_err.mean())


def jitter(bvh: BVH, *, downsample: int = 1) -> float:
    """Mean third-derivative magnitude of WORLD joint positions in m/s³ —
    the temporal-smoothness metric the sparse-tracking literature reports
    alongside MPJPE (the reference repo computes it only for the paper;
    BASELINE.json names "MPJPE + jitter" as the accuracy metric).

    jitter = mean over joints/frames of ‖x(t+1) − 3x(t) + 3x(t−1) − x(t−2)‖
    · fps³, on full world positions (root translation included — smoothness
    of the delivered motion, not just the pose)."""
    from dragposer_tpu.ops import host_device

    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    if downsample > 1:
        rots = rots[::downsample]
        pos = pos[::downsample]
    with host_device():
        sk = Skeleton.build(parents, offsets)
        p, _ = fk.fk_local(rots, pos[:, 0, :], sk)
        p = np.asarray(p)
    fps = 1.0 / (float(bvh.frame_time) * downsample)
    d3 = (p[3:] - 3.0 * p[2:-1] + 3.0 * p[1:-2] - p[:-3]) * fps**3
    return float(np.linalg.norm(d3, axis=-1).mean())
