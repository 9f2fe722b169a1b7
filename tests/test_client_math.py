"""Client math vs the reference C# formulas (DragPoserUnity)."""

import numpy as np
import pytest

from dragposer_tpu.client import math as cm

EXAMPLE_BVH = "/root/reference/python/data/example/eval/example.bvh"


def _rand_quat(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Damping (MathExtensions.cs:163-175)
# ---------------------------------------------------------------------------

def test_fast_negexp_polynomial():
    for x in (0.0, 0.1, 0.5, 1.0, 3.0):
        want = 1.0 / (1.0 + x + 0.48 * x * x + 0.235 * x ** 3)
        np.testing.assert_allclose(cm.fast_negexp(x), want, rtol=1e-6)


def test_damp_adjustment_formula():
    goal = np.asarray([1.0, -2.0, 0.5], np.float32)
    halflife, dt = 0.1, 1.0 / 60.0
    x = cm.LN2 * dt / (halflife + 1e-5)
    want = goal * (1.0 - 1.0 / (1.0 + x + 0.48 * x * x + 0.235 * x ** 3))
    np.testing.assert_allclose(
        cm.damp_adjustment_implicit(goal, halflife, dt), want, rtol=1e-6)


def test_damp_halflife_semantics():
    """After `halflife` seconds of accumulated damping the point has moved
    roughly half the distance (the polynomial approximates e^-x)."""
    goal = np.asarray([1.0, 0.0, 0.0])
    pos = np.zeros(3)
    dt = 1.0 / 600.0
    for _ in range(60):  # 0.1 s at 600 Hz, halflife 0.1
        pos = pos + cm.damp_adjustment_implicit(goal - pos, 0.1, dt)
    assert 0.45 < pos[0] < 0.56


# ---------------------------------------------------------------------------
# Continuity + slerp (DragPoser.cs:226-231, 266-275)
# ---------------------------------------------------------------------------

def test_ensure_continuity_flips_opposite_hemisphere():
    rng = np.random.default_rng(0)
    cur = _rand_quat(rng)
    nxt = -cur + 0.01 * rng.normal(size=4).astype(np.float32)
    out = cm.ensure_continuity(cur, nxt)
    assert np.dot(cur, out) > 0
    # same hemisphere → untouched
    near = cur + 0.01 * rng.normal(size=4).astype(np.float32)
    np.testing.assert_array_equal(cm.ensure_continuity(cur, near), near)


def test_slerp_endpoints_and_clamp():
    rng = np.random.default_rng(1)
    a, b = _rand_quat(rng), _rand_quat(rng)
    if np.dot(a, b) < 0:
        b = -b
    np.testing.assert_allclose(cm.slerp(a, b, 0.0), a, atol=1e-6)
    np.testing.assert_allclose(cm.slerp(a, b, 1.0), b, atol=1e-6)
    # Unity clamps t
    np.testing.assert_allclose(cm.slerp(a, b, 3.7), b, atol=1e-6)


def test_slerp_halfway_bisects_angle():
    a = np.asarray([1.0, 0, 0, 0], np.float32)
    angle = 1.2
    b = np.asarray([np.cos(angle / 2), np.sin(angle / 2), 0, 0], np.float32)
    mid = cm.slerp(a, b, 0.5)
    want = np.asarray([np.cos(angle / 4), np.sin(angle / 4), 0, 0])
    np.testing.assert_allclose(mid, want, atol=1e-6)


def test_slerp_takes_shortest_path():
    rng = np.random.default_rng(2)
    a = _rand_quat(rng)
    b = -cm.slerp(a, _rand_quat(rng), 0.2)  # close to a but negated
    mid = cm.slerp(a, b, 0.5)
    assert np.abs(np.dot(mid, a)) > 0.9


# ---------------------------------------------------------------------------
# Coordinate conversions (DragPoser.cs:233-263)
# ---------------------------------------------------------------------------

def test_conversions_round_trip():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(
        cm.unity_to_python_pos(cm.python_to_unity_pos(p)), p, atol=1e-6)
    q = _rand_quat(rng, 5)  # python wxyz
    xyzw = cm.python_to_unity_rot(q)
    back = cm.unity_to_python_rot(xyzw)
    np.testing.assert_allclose(back, q, atol=1e-6)


def test_conversion_preserves_rotation_action():
    """The quaternion map must be the similarity transform of the position
    map: rotate-then-convert == convert-then-rotate."""
    rng = np.random.default_rng(4)
    for _ in range(10):
        q = _rand_quat(rng)          # python wxyz
        v = rng.normal(size=3).astype(np.float32)
        rotated_then_converted = cm.python_to_unity_pos(cm.quat_mul_vec(q, v))
        qu = cm.python_to_unity_rot(q)                 # unity xyzw
        qu_wxyz = np.concatenate([qu[3:4], qu[:3]])
        converted_then_rotated = cm.quat_mul_vec(
            qu_wxyz, cm.python_to_unity_pos(v))
        np.testing.assert_allclose(rotated_then_converted,
                                   converted_then_rotated, atol=1e-5)


# ---------------------------------------------------------------------------
# look_rotation / 6D (TrackerRetargeter.cs:99-106, MathExtensions.cs:150-161)
# ---------------------------------------------------------------------------

def test_look_rotation_identity_and_axis():
    q = cm.look_rotation([0, 0, 1], [0, 1, 0])
    np.testing.assert_allclose(np.abs(q[0]), 1.0, atol=1e-6)
    q = cm.look_rotation([1, 0, 0], [0, 1, 0])
    f = cm.quat_mul_vec(q, np.asarray([0.0, 0, 1]))
    np.testing.assert_allclose(f, [1, 0, 0], atol=1e-6)
    u = cm.quat_mul_vec(q, np.asarray([0.0, 1, 0]))
    np.testing.assert_allclose(u, [0, 1, 0], atol=1e-6)


def test_quaternion_from_continuous_recovers_rotation():
    rng = np.random.default_rng(5)
    q = _rand_quat(rng)
    # build the rotation matrix columns from quat action
    ex = cm.quat_mul_vec(q, np.asarray([1.0, 0, 0]))
    ey = cm.quat_mul_vec(q, np.asarray([0.0, 1, 0]))
    got = cm.quaternion_from_continuous(np.stack([ex, ey], axis=1))
    assert min(np.linalg.norm(got - q), np.linalg.norm(got + q)) < 1e-5


# ---------------------------------------------------------------------------
# Retargeter (TrackerRetargeter.cs)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def retargeter():
    from dragposer_tpu.client.retarget import TrackerRetargeter

    return TrackerRetargeter(EXAMPLE_BVH)


def test_retarget_tpose_is_fixed_point(retargeter):
    """With trackers untouched (at the calibrated T-pose), retargeted
    rotations are the source T-pose world rotations (the alignment chain
    collapses: InvTarget·target = I, RootAlign·InvRootAlign = I)."""
    retargeter.retarget_all()
    for i in range(retargeter.n_joints):
        _, rot = retargeter.get_retarget(i)
        d = min(np.linalg.norm(rot - retargeter.source_tpose[i]),
                np.linalg.norm(rot + retargeter.source_tpose[i]))
        assert d < 1e-4, f"joint {i}: {d}"


def test_retarget_position_rotates_about_root(retargeter):
    """retPos = RootAlign·(pos − rootPos) + rootPos (cs:87-89): the root is
    a fixed point, and distances to the root are preserved."""
    root = retargeter.tracker_pos[0]
    retargeter.retarget_all()
    p0, _ = retargeter.get_retarget(0)
    np.testing.assert_allclose(p0, root, atol=1e-5)
    for i in (3, 13, 21):
        pi, _ = retargeter.get_retarget(i)
        np.testing.assert_allclose(
            np.linalg.norm(pi - root),
            np.linalg.norm(retargeter.tracker_pos[i] - root), rtol=1e-5)


def test_root_align_maps_character_forward(retargeter):
    """RootAlign re-expresses the BVH hips' facing in the canonical frame:
    applying it to the hips' forward must give (0,0,1) projected."""
    from dragposer_tpu.client.retarget import _to_unity_rot_wxyz  # noqa

    fwd = cm.quat_mul_vec(cm.quat_inverse(retargeter.root_align),
                          np.asarray([0.0, 0, 1]))
    # root_align maps character forward to canonical forward, so its inverse
    # maps canonical forward back to the character's forward; both are unit
    np.testing.assert_allclose(np.linalg.norm(fwd), 1.0, atol=1e-5)
    restored = cm.quat_mul_vec(retargeter.root_align, fwd)
    np.testing.assert_allclose(restored, [0, 0, 1], atol=1e-5)
