"""Client driver end-to-end: the reference Unity demo flows, headless.

Reproduces ``Applications/FBIK.cs`` + ``BVH/BVHPlayback.cs``: a BVH animation
drives the trackers, the engine reconstructs the full body, the client
smooths and root-adjusts.  CPU, short clip — latency targets are measured on
the TPU by tools/demo_client.py.
"""

import numpy as np
import pytest

MODELS = "models/model_dancedb_example"
EXAMPLE_BVH = "/root/reference/python/data/example/eval/example.bvh"


@pytest.fixture(scope="module")
def poser():
    import os

    from dragposer_tpu.client.driver import ClientDragPoser

    repo = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    return ClientDragPoser(
        EXAMPLE_BVH, os.path.join(repo, MODELS),
        temporal_future_window=16, max_iter=10, log_path=None,
    )


@pytest.mark.heavy
def test_playback_demo_reconstructs(poser):
    """BVH playback drives trackers; reconstruction must track the animation
    (masked end effectors land near their targets in steady state)."""
    from dragposer_tpu.client.playback import BVHPlayback

    playback = BVHPlayback(EXAMPLE_BVH, poser.retargeter)
    playback.frame = 2000  # a dynamic segment (clip head is a T-pose)
    playback.update_trackers()
    poser.initialize_pose()

    dt = 1.0 / 60.0
    ee = np.nonzero(poser.mask > 0.1)[0]
    errs = []
    for k in range(40):
        playback.update_trackers()
        poser.step(dt)
        pos, _ = poser.world_pose()
        assert np.all(np.isfinite(pos)) and np.all(np.isfinite(
            poser.local_rotations))
        if k >= 20:  # steady state (smoothing + damping have converged)
            tgt = np.stack([poser.retargeter.get_retarget(int(i))[0]
                            for i in ee])
            errs.append(np.linalg.norm(pos[ee] - tgt, axis=-1).mean())
    mean_err = float(np.mean(errs))
    # reference-quality tracking is ~2 cm MPEEPE; smoothing lag on a moving
    # clip adds some — bound loosely at 12 cm to catch wiring errors
    assert mean_err < 0.12, f"end effectors not tracking: {mean_err:.3f} m"


def test_bone_lengths_preserved(poser):
    pos, _ = poser.world_pose()
    parents, offsets = poser.parents, poser.offsets
    for i in range(1, len(parents)):
        want = np.linalg.norm(offsets[i])
        got = np.linalg.norm(pos[i] - pos[parents[i]])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_live_mask_editing_recompile_free(poser):
    """FBIK.cs:62-71 edits mask/weights every frame; the session must not
    rebuild its engine for that (dense-mask design)."""
    if not poser._initialized:  # fixture is module-scoped; don't depend on
        poser.initialize_pose()  # the playback test having run first
    engine_before = poser.session._engine
    poser.mask[:] = 0
    poser.mask[[13, 17, 21]] = 1  # 3-tracker mode, live
    poser.weights[13, 0] = 20.0
    poser.step(1.0 / 60.0)
    assert poser.session._engine is engine_before
    pos, _ = poser.world_pose()
    assert np.all(np.isfinite(pos))
    # restore 6-tracker mode, also live
    poser.mask[:] = 0
    poser.mask[[0, 3, 7, 13, 17, 21]] = 1
    poser.weights[13, 0] = 5.0
    poser.step(1.0 / 60.0)
    assert poser.session._engine is engine_before


def test_param_push_does_not_rebuild(poser):
    """The client pushes identical optimizer params every frame
    (DragPoser.cs:168-172); the engine must stay."""
    if not poser._initialized:
        poser.initialize_pose()
    engine_before = poser.session._engine
    for _ in range(3):
        poser.step(1.0 / 60.0)
    assert poser.session._engine is engine_before


def test_root_adjustment_pulls_root(poser):
    """With adjustment on, the root drifts toward the hips tracker."""
    poser.retargeter.retarget_all()
    tgt, _ = poser.retargeter.get_retarget(poser.adjustment_joint)
    d_before = np.linalg.norm(poser.root_position - tgt)
    r0 = poser.root_position.copy()
    poser._adjust_joint(dt=0.5)  # big dt -> visible pull
    d_after = np.linalg.norm(poser.root_position - tgt)
    if d_before > 1e-4:
        assert d_after < d_before
    else:
        np.testing.assert_allclose(poser.root_position, r0, atol=1e-4)
