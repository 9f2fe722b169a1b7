"""Multi-avatar batched realtime serving (RealtimeBatch)."""

import numpy as np
import pytest

from conftest import REFERENCE_MODEL

SKELETON = "/root/reference/python/data/example/eval/example.bvh"


@pytest.fixture(scope="module")
def batch3():
    from dragposer_tpu.runtime.realtime import RealtimeSession

    s = RealtimeSession(log_path=None)
    s.set_reference_skeleton(SKELETON)
    s.load_models(REFERENCE_MODEL)
    j = s.skeleton.n_joints
    mask6 = np.zeros(j, np.float32)
    mask6[[0, 3, 7, 13, 17, 21]] = 1.0
    weights = np.ones((j, 2), np.float32) * np.asarray([1.0, 0.01])
    weights[0] = [10.0, 10.0]
    s.set_mask_and_weights(mask6, weights)
    s.set_optim_params(1e-4, 0.01, 6, 0.01)
    s.init_drag_pose(np.zeros((1, 3)), np.asarray([[1.0, 0, 0, 0]]))
    batch = s.make_batch(3)
    return s, batch, mask6, weights, j


def test_per_avatar_masks_one_program(batch3):
    """Three avatars with different tracker configs step together; the
    3-tracker avatar's inactive-joint targets must not influence it."""
    s, batch, mask6, weights, j = batch3
    # avatar 1: 4-tracker (drop feet), avatar 2: head+hands only
    mask4 = mask6.copy(); mask4[[3, 7]] = 0.0              # noqa: E702
    mask3 = np.zeros(j, np.float32); mask3[[13, 17, 21]] = 1.0  # noqa: E702
    assert batch.set_mask_and_weights(1, mask4, weights) == 4
    assert batch.set_mask_and_weights(2, mask3, weights) == 3

    batch.init_drag_pose(np.zeros((3, 3)), np.tile([[1.0, 0, 0, 0]], (3, 1)))
    tpos = np.zeros((3, j, 3), np.float32)
    tpos[:, 13] = [0.0, 0.05, 0.65]     # head target for everyone
    trot = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (3, j, 1))
    # garbage at joints inactive for avatar 2 — must not affect it
    tpos[2, 3] = [99.0, 99.0, 99.0]
    tpos[2, 7] = [-99.0, 99.0, -99.0]

    for _ in range(3):
        local, gp = batch.drag_pose(tpos, trot)
    assert local.shape == (3, j, 4)
    assert np.isfinite(local).all() and np.isfinite(gp).all()
    norms = np.linalg.norm(local, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # the garbage foot targets would drag avatar 2 tens of meters if the
    # mask leaked — its root must stay in a human-scale neighborhood
    assert np.linalg.norm(gp[2]) < 5.0


def test_batch_matches_single_session(batch3):
    """Avatar 0 (same config as the single session) must reproduce the
    single-session trajectory."""
    s, batch, mask6, weights, j = batch3
    batch.init_drag_pose(np.zeros((3, 3)), np.tile([[1.0, 0, 0, 0]], (3, 1)))
    s.init_drag_pose(np.zeros((1, 3)), np.asarray([[1.0, 0, 0, 0]]))

    e = 6
    ee_pos = np.asarray([[0.0, 0.05, 0.0], [0.1, 0.1, -0.9],
                         [-0.1, 0.1, -0.9], [0.0, 0.05, 0.65],
                         [0.45, 0.05, 0.35], [-0.45, 0.05, 0.35]],
                        np.float32)
    ee_rot = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (e, 1))
    tpos = np.zeros((3, j, 3), np.float32)
    trot = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (3, j, 1))
    tpos[:, [0, 3, 7, 13, 17, 21]] = ee_pos

    out_pose = np.zeros((j, 4), np.float32)
    out_gp = np.zeros((1, 3), np.float32)
    for _ in range(3):
        local, gp = batch.drag_pose(tpos, trot)
        s.drag_pose(ee_pos, ee_rot, out_pose, out_gp)
    np.testing.assert_allclose(local[0], out_pose, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(gp[0], out_gp[0], rtol=1e-3, atol=2e-3)
