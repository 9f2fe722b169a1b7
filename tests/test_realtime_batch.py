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


@pytest.fixture(scope="module")
def batch_staggered():
    """16 avatars, temporal model, window 4: the rollout lane budget
    (engine.rollout_lane_budget(16, 4) == 8) is BELOW the batch, so the
    staggered boundary sub-batches (4 lanes/frame) exercise the gathered
    sub-batch rollout path rather than the full-batch fallback."""
    import os

    from dragposer_tpu.runtime.realtime import RealtimeSession

    repo_model = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models", "model_dancedb_example")
    s = RealtimeSession(log_path=None)
    s.set_reference_skeleton(SKELETON)
    s.load_models(repo_model)
    assert s._temporal is not None, "fixture needs the temporal checkpoint"
    j = s.skeleton.n_joints
    mask = np.zeros(j, np.float32)
    mask[[0, 3, 7, 13, 17, 21]] = 1.0
    weights = np.ones((j, 2), np.float32) * np.asarray([1.0, 0.01])
    weights[0] = [10.0, 10.0]
    s.set_mask_and_weights(mask, weights)
    s.set_optim_params(1e-4, 0.01, 2, 0.01)
    s.set_lambdas(1.0, 0.02, 4)          # window 4 (one rollout per 4 frames)
    s.init_drag_pose(np.zeros((1, 3)), np.asarray([[1.0, 0, 0, 0]]))
    return s, s.make_batch(16), j


def test_stagger_phases_spread_and_fill(batch_staggered):
    """stagger_phases=True spreads window phases evenly and pre-fills the
    prediction buffers with the init-time rollout."""
    from dragposer_tpu.drag import engine as eng

    s, batch, j = batch_staggered
    n, w = 16, 4
    assert eng.rollout_lane_budget(n, w) < n   # sub-batch regime is live

    batch.init_drag_pose(np.zeros((n, 3)), np.tile([[1.0, 0, 0, 0]], (n, 1)),
                         stagger_phases=True)
    phases = np.asarray(batch._state.current_index)
    np.testing.assert_array_equal(phases, (np.arange(n) * w) // n % w)
    counts = np.bincount(phases, minlength=w)
    assert counts.max() <= -(-n // w)          # even spread: <= ceil(n/w)
    # buffers pre-filled (unstaggered init leaves them zero)
    assert np.abs(np.asarray(batch._state.target_buffer)).max() > 0


@pytest.mark.heavy
def test_stagger_refreshes_at_own_boundary(batch_staggered):
    """Stepping a staggered crowd, each avatar's prediction buffer changes
    exactly on ITS OWN window-boundary frames (the sub-batch rollout) and
    is carried bitwise otherwise — no lane reads or writes another's
    phase."""
    s, batch, j = batch_staggered
    n, w = 16, 4
    batch.init_drag_pose(np.zeros((n, 3)), np.tile([[1.0, 0, 0, 0]], (n, 1)),
                         stagger_phases=True)
    tpos = np.zeros((n, j, 3), np.float32)
    tpos[:, 13] = [0.0, 0.05, 0.65]
    trot = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (n, j, 1))

    phases = np.asarray(batch._state.current_index).copy()
    prev = np.asarray(batch._state.target_buffer).copy()
    for frame in range(2 * w):
        local, gp = batch.drag_pose(tpos, trot)
        cur = np.asarray(batch._state.target_buffer)
        changed = np.any(cur != prev, axis=(1, 2))
        boundary = phases == 0
        # non-boundary lanes carry their buffer rows bitwise
        assert not changed[~boundary].any()
        if frame >= 4:
            # boundary lanes rolled out fresh predictions.  Earlier
            # boundary frames can reproduce the init-fill rows bitwise:
            # the rollout's ring-buffer inputs are gathered at
            # sample_step=4 stride, so they first see post-spawn
            # latents once the ring has shifted a full stride
            # (measured: frames 0-3 identical, 4+ refreshed).
            assert changed[boundary].all()
        phases = (phases + 1) % w
        np.testing.assert_array_equal(
            np.asarray(batch._state.current_index), phases)
        prev = cur.copy()
    assert np.isfinite(local).all() and np.isfinite(gp).all()
    np.testing.assert_allclose(
        np.linalg.norm(local, axis=-1), 1.0, atol=1e-3)


def test_stagger_noop_without_window(batch_staggered):
    """window <= 1 has no rollout to amortize: stagger_phases must be a
    no-op (all phases 0, buffer untouched)."""
    s, batch, j = batch_staggered
    s.set_lambdas(1.0, 0.02, 0)
    try:
        b0 = s.make_batch(4)
        b0.init_drag_pose(np.zeros((4, 3)), np.tile([[1.0, 0, 0, 0]], (4, 1)),
                          stagger_phases=True)
        assert (np.asarray(b0._state.current_index) == 0).all()
    finally:
        s.set_lambdas(1.0, 0.02, 4)
        s._ensure_engine()
