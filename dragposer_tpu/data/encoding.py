"""Motion encoding: BVH → normalized root-space dual-quaternion features.

Encoding semantics (parity with ``python/src/motion_data.py:22-123``):

* root displacement per frame, rotated into the *current* frame's root space;
* root rotation as incremental quaternions (frame 0 = identity);
* every joint as a root-space dual quaternion (zero global translation);
* the root's 8-channel slot is special: ``[incremental quat (4),
  root-space displacement (3), 0]``;
* dual quaternions sign-unrolled along time for continuity;
* heights = world-y of selected joints (component index 1 — a reference
  quirk kept verbatim even on z-up data).

All math is JAX (runs fine on CPU or TPU); outputs are NumPy for the host
pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from dragposer_tpu.ops import host_device as _host_device

from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops import dual_quat, fk, quat
from dragposer_tpu.ops.topology import Skeleton


def info_from_bvh(bvh: BVH):
    """BVH → (rotations (F,J,4) unit & unrolled, positions (F,J,3), parents,
    offsets, bvh).  Mirrors ``train.py:329-341`` (root parent and root offset
    forced to zero)."""
    order_idx = quat.order_to_indices(bvh.rot_order)
    with _host_device():
        rots = quat.from_euler(
            jnp.asarray(np.radians(bvh.rotations), dtype=jnp.float32),
            order_idx[None],
        )
        rots = np.asarray(quat.normalize(quat.unroll(rots, axis=0)))
    parents = np.asarray(bvh.parents).copy()
    parents[0] = 0
    offsets = np.asarray(bvh.offsets, dtype=np.float32).copy()
    offsets[0] = 0.0
    return rots, bvh.positions.astype(np.float32), parents, offsets, bvh


@dataclass
class EncodedMotion:
    """Per-sequence encoded features (denormalized)."""

    dqs: np.ndarray                     # (F, J*8)
    displacement: np.ndarray            # (F, 3) root-space
    global_pos: np.ndarray              # (F, 3)
    global_rot: np.ndarray              # (F, 4) world root rotation
    heights: Optional[np.ndarray]       # (F, H) or None
    displacement_acc: Optional[np.ndarray]  # (F, 3) or None (temporal eval)
    offsets: np.ndarray                 # (J, 3)


def encode_motion(
    offsets: np.ndarray,
    global_pos: np.ndarray,
    rotations: np.ndarray,
    skeleton: Skeleton,
    *,
    downsample: int = 1,
    height_indices: Optional[Sequence[int]] = None,
    sample_step: Optional[int] = None,
) -> EncodedMotion:
    assert global_pos.shape[0] == rotations.shape[0], (
        f"frame mismatch: {global_pos.shape[0]} positions vs "
        f"{rotations.shape[0]} rotations"
    )
    if downsample > 1:
        global_pos = global_pos[::downsample]
        rotations = rotations[::downsample]

    with _host_device():
        rot = jnp.asarray(rotations, dtype=jnp.float32)
        gp = jnp.asarray(global_pos, dtype=jnp.float32)
        root_rot = rot[:, 0, :]

        disp_world = jnp.concatenate((jnp.zeros((1, 3)), gp[1:] - gp[:-1]), axis=0)
        displacement = quat.mul_vec(quat.inverse(root_rot), disp_world)

        incr = jnp.concatenate(
            (
                jnp.asarray([[1.0, 0.0, 0.0, 0.0]]),
                quat.mul(quat.inverse(root_rot[:-1]), root_rot[1:]),
            ),
            axis=0,
        )

        rs_rot, rs_pos = fk.to_root_space(rot, jnp.zeros_like(gp), skeleton)
        dqs = dual_quat.from_rotation_translation(rs_rot, rs_pos)

        heights = None
        if height_indices is not None:
            # world position of each joint = root_rot · root_frame_pos + global_pos
            dq_r, dq_t = dual_quat.to_rotation_translation(dqs)
            t_world = quat.mul_vec(dq_r[:, 0:1, :], dq_t) + gp[:, None, :]
            heights = np.asarray(t_world[:, list(height_indices), 1])

        dqs = dqs.at[:, 0, :4].set(incr)
        dqs = dual_quat.unroll(dqs, axis=0)
        dqs = dqs.at[:, 0, 4:7].set(displacement)
        dqs = dqs.at[:, 0, 7].set(0.0)
        dqs = dqs.reshape(dqs.shape[0], -1)

    displacement_acc = None
    if sample_step is not None:
        # accumulated displacement over the next `sample_step` frames
        # (zero near the tail, as in ``motion_data.py:288-291``)
        d = np.asarray(displacement)
        acc = np.zeros_like(d)
        for i in range(0, d.shape[0] - sample_step):
            acc[i] = d[i : i + sample_step].sum(axis=0)
        displacement_acc = acc

    return EncodedMotion(
        dqs=np.asarray(dqs),
        displacement=np.asarray(displacement),
        global_pos=np.asarray(gp),
        global_rot=np.asarray(root_rot),
        heights=heights,
        displacement_acc=displacement_acc,
        offsets=np.asarray(skeleton.offsets),
    )


# ---------------------------------------------------------------------------
# Normalization statistics
# ---------------------------------------------------------------------------

class RunningStats:
    """Cross-file statistics: mean of per-file means, sqrt(mean of per-file
    variances); zero-variance channels forced to std 1
    (``motion_data.py:125-155``)."""

    def __init__(self):
        self._means_dqs, self._vars_dqs = [], []
        self._means_disp, self._vars_disp = [], []

    def add(self, motion: EncodedMotion) -> None:
        self._means_dqs.append(motion.dqs.mean(axis=0))
        self._vars_dqs.append(motion.dqs.var(axis=0, ddof=1))
        self._means_disp.append(motion.displacement.mean(axis=0))
        self._vars_disp.append(motion.displacement.var(axis=0, ddof=1))

    def finalize(self) -> tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        means = {
            "dqs": np.mean(self._means_dqs, axis=0).astype(np.float32),
            "displacement": np.mean(self._means_disp, axis=0).astype(np.float32),
        }
        stds = {
            "dqs": np.sqrt(np.mean(self._vars_dqs, axis=0)).astype(np.float32),
            "displacement": np.sqrt(np.mean(self._vars_disp, axis=0)).astype(np.float32),
        }
        for k in stds:
            s = stds[k]
            s[s < 1e-10] = 1.0
        return means, stds


def normalize(motion: EncodedMotion, means, stds) -> EncodedMotion:
    return EncodedMotion(
        dqs=(motion.dqs - means["dqs"]) / stds["dqs"],
        displacement=(motion.displacement - means["displacement"]) / stds["displacement"],
        global_pos=motion.global_pos,
        global_rot=motion.global_rot,
        heights=motion.heights,
        displacement_acc=motion.displacement_acc,
        offsets=motion.offsets,
    )
