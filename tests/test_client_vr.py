"""VR device plumbing (client/vr.py) — the SteamVR-layer capability port.

Covers every formula of ``VRController.cs`` (plane fit, role
identification, joint calibration, detection gating, setup state machine),
``VRIK.cs`` (six-role rig, dropout toggles, child-offset calibration), and
``DisplayMirror.cs`` (timed message flow) with synthetic device rigs — the
hardware boundary is the DeviceProvider protocol, so everything below it is
exercised exactly as a SteamVR session would.
"""

import numpy as np
import pytest

from dragposer_tpu.client import math as cm
from dragposer_tpu.client import vr

EXAMPLE_BVH = "/root/reference/python/data/example/eval/example.bvh"
IDENT = np.array([1.0, 0.0, 0.0, 0.0], np.float32)


def _dev(index, model, pos, rot=IDENT, ok=True):
    return vr.TrackedDevice(index, model, ok, np.asarray(pos, np.float32),
                            np.asarray(rot, np.float32))


def _tpose_rig(facing_z=True):
    """A person standing in a T-pose facing +z: devices in the x-y plane."""
    # wxyz identity faces +z (unity forward)
    devs = {
        vr.ROLE_HMD: ([0.0, 1.7, 0.0], IDENT),
        vr.ROLE_CONTROLLER_LEFT: ([-0.8, 1.4, 0.0], IDENT),
        vr.ROLE_CONTROLLER_RIGHT: ([0.8, 1.4, 0.0], IDENT),
        vr.ROLE_TRACKER_ROOT: ([0.02, 1.0, 0.0], IDENT),
        vr.ROLE_TRACKER_LEFT: ([-0.15, 0.1, 0.0], IDENT),
        vr.ROLE_TRACKER_RIGHT: ([0.15, 0.1, 0.0], IDENT),
    }
    return devs


# ---------------------------------------------------------------------------
# FitPlane (VRController.cs:567-610)
# ---------------------------------------------------------------------------

def test_fit_plane_recovers_plane():
    rng = np.random.default_rng(0)
    # plane z = 0.3x - 0.2y + 1.5
    xy = rng.normal(size=(20, 2))
    pts = np.stack([xy[:, 0], xy[:, 1],
                    0.3 * xy[:, 0] - 0.2 * xy[:, 1] + 1.5], axis=1)
    a, b, c, d = vr.fit_plane(pts)
    assert c == -1.0
    np.testing.assert_allclose([a, b], [0.3, -0.2], atol=1e-9)
    # z = a x + b y + d  (with c = -1: ax + by - z + d = 0)
    np.testing.assert_allclose(d, 1.5, atol=1e-9)


def test_fit_plane_degenerate():
    # all points on a vertical line: xx*yy - xy^2 == 0
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    assert vr.fit_plane(pts) is None
    assert vr.fit_plane(pts[:2]) is None


# ---------------------------------------------------------------------------
# DetectDevices / SetDevicesIndex (VRController.cs:244-370)
# ---------------------------------------------------------------------------

def test_detect_devices_counts_and_gates():
    table = [
        _dev(0, "generic_hmd", [0, 1.7, 0]),
        _dev(1, "vive_controller", [-0.8, 1.4, 0]),
        _dev(2, "vive_controller", [0.8, 1.4, 0]),
        _dev(3, "tracker_vive_a", [0, 1, 0]),
        _dev(4, "tracker_vive_b", [-0.15, 0.1, 0]),
        _dev(5, "tracker_vive_c", [0.15, 0.1, 0]),
        _dev(6, "lighthouse_base", [2, 2, 2]),       # ignored class
        _dev(7, "tracker_vive_d", [9, 9, 9], ok=False),  # not tracking
    ]
    det = vr.detect_devices(table)
    assert det.ok and det.num_controllers == 2 and det.num_trackers == 3
    assert det.tracker_indices == [3, 4, 5]
    assert "Found 2 controller(s) and 3 tracker(s)." == det.message

    det2 = vr.detect_devices(table[:4])
    assert not det2.ok
    assert "Please, connect more controllers" in det2.message

    # SetDevicesIndex order: root=trackers[0], RIGHT=trackers[1], LEFT=[2]
    roles = vr.assign_device_indices(det)
    assert roles[vr.ROLE_TRACKER_ROOT] == 3
    assert roles[vr.ROLE_TRACKER_RIGHT] == 4
    assert roles[vr.ROLE_TRACKER_LEFT] == 5


# ---------------------------------------------------------------------------
# IdentifyDevices (VRController.cs:373-541)
# ---------------------------------------------------------------------------

def _poses_from(rig):
    return {i: rig[r] for i, r in enumerate(rig)}


def test_identify_fixes_shuffled_roles():
    rig = _tpose_rig()
    # device table in scrambled order: provisional assignment is wrong
    order = [vr.ROLE_TRACKER_LEFT, vr.ROLE_CONTROLLER_RIGHT, vr.ROLE_HMD,
             vr.ROLE_TRACKER_ROOT, vr.ROLE_CONTROLLER_LEFT,
             vr.ROLE_TRACKER_RIGHT]
    poses = {i: (np.asarray(rig[r][0], np.float32),
                 np.asarray(rig[r][1], np.float32))
             for i, r in enumerate(order)}
    provisional = {
        vr.ROLE_HMD: 2,
        # controllers swapped
        vr.ROLE_CONTROLLER_LEFT: 1, vr.ROLE_CONTROLLER_RIGHT: 4,
        # trackers cyclically wrong
        vr.ROLE_TRACKER_ROOT: 0, vr.ROLE_TRACKER_LEFT: 5,
        vr.ROLE_TRACKER_RIGHT: 3,
    }
    fixed = vr.identify_devices(provisional, poses)
    assert fixed[vr.ROLE_HMD] == 2
    # Unity LH frame facing +z: u = cross(up, n) points to the person's
    # u<0 side = viewer's left = device at x<0 ... verify by positions:
    lpos = poses[fixed[vr.ROLE_CONTROLLER_LEFT]][0].astype(np.float64)
    rpos = poses[fixed[vr.ROLE_CONTROLLER_RIGHT]][0].astype(np.float64)
    assert {tuple(np.round(lpos, 3)), tuple(np.round(rpos, 3))} == {
        (-0.8, 1.4, 0.0), (0.8, 1.4, 0.0)}
    assert lpos[0] != rpos[0]
    root = poses[fixed[vr.ROLE_TRACKER_ROOT]][0]
    np.testing.assert_allclose(root, [0.02, 1.0, 0.0], atol=1e-6)
    lfoot = poses[fixed[vr.ROLE_TRACKER_LEFT]][0]
    rfoot = poses[fixed[vr.ROLE_TRACKER_RIGHT]][0]
    assert lfoot[1] < 0.5 and rfoot[1] < 0.5
    assert lfoot[0] * rfoot[0] < 0  # opposite sides
    # left/right must be consistent between controllers and feet
    assert (lpos[0] < rpos[0]) == (lfoot[0] < rfoot[0])


def test_identify_head_misaligned_fails():
    rig = _tpose_rig()
    # rotate the HMD 90° about y: forward ⟂ body plane normal
    rot_y90 = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0],
                       np.float32)
    rig[vr.ROLE_HMD] = (rig[vr.ROLE_HMD][0], rot_y90)
    poses = _poses_from(rig)
    roles = {r: i for i, r in enumerate(rig)}
    with pytest.raises(vr.IdentifyError, match="not aligned"):
        vr.identify_devices(roles, poses)


def test_identify_not_enough_devices():
    with pytest.raises(vr.IdentifyError, match="Not enough devices"):
        vr.identify_devices({vr.ROLE_HMD: 0},
                            {0: (np.zeros(3, np.float32), IDENT)})


# ---------------------------------------------------------------------------
# SetupJoints calibration (VRController.cs:177-225)
# ---------------------------------------------------------------------------

def test_setup_joints_roundtrip():
    """Offsets must reproduce the avatar bone world pose from the live
    device pose, for arbitrary device mounting rotations."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    dpos = np.array([0.1, 1.0, 0.2], np.float32)
    bone = np.array([0.0, 0.95, 0.15], np.float32)
    offs = vr.setup_joints({vr.ROLE_TRACKER_ROOT: (dpos, q)},
                           {vr.ROLE_TRACKER_ROOT: bone})
    off = offs[vr.ROLE_TRACKER_ROOT]
    jpos, jrot = off.world(dpos, q)
    np.testing.assert_allclose(jpos, bone, atol=1e-6)
    # at calibration the joint world rotation is identity (inverse rot)
    np.testing.assert_allclose(np.abs(jrot[0]), 1.0, atol=1e-6)

    # after the device moves rigidly, the joint follows rigidly
    dq = rng.normal(size=4).astype(np.float32)
    dq /= np.linalg.norm(dq)
    new_rot = cm.quat_mul(dq, q)
    new_pos = dpos + np.array([0.3, 0.0, -0.1], np.float32)
    jpos2, jrot2 = off.world(new_pos, new_rot)
    expect = new_pos + cm.quat_mul_vec(new_rot, off.local_pos)
    np.testing.assert_allclose(jpos2, expect, atol=1e-6)
    np.testing.assert_allclose(jrot2, cm.quat_mul(new_rot, off.local_rot),
                               atol=1e-6)


def test_setup_joints_controller_fixed_grip():
    dpos = np.zeros(3, np.float32)
    offs = vr.setup_joints(
        {vr.ROLE_CONTROLLER_LEFT: (dpos, IDENT)},
        {})  # no avatar bone needed for the fixed grip offset
    np.testing.assert_allclose(offs[vr.ROLE_CONTROLLER_LEFT].local_pos,
                               [0.0, 0.0, -0.175])
    # opt-in computed hand offsets use the avatar bone
    offs2 = vr.setup_joints(
        {vr.ROLE_CONTROLLER_LEFT: (dpos, IDENT)},
        {vr.ROLE_CONTROLLER_LEFT: np.array([0.0, 0.0, -0.3], np.float32)},
        compute_offsets_hands=True)
    np.testing.assert_allclose(offs2[vr.ROLE_CONTROLLER_LEFT].local_pos,
                               [0.0, 0.0, -0.3], atol=1e-6)


# ---------------------------------------------------------------------------
# StatusDisplay (DisplayMirror.cs:79-160)
# ---------------------------------------------------------------------------

class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_status_display_timed_revert():
    clock = FakeClock()
    disp = vr.StatusDisplay(clock)
    disp.show_text("base", None, 0)
    disp.show_text("warning", (1, 0, 0, 0.5), 2)
    assert disp.text == "warning"
    clock.t = 1.9
    disp.tick()
    assert disp.text == "warning"
    clock.t = 2.1
    disp.tick()
    assert disp.text == "base"


def test_status_display_two_messages():
    clock = FakeClock()
    disp = vr.StatusDisplay(clock)
    disp.show_text_again("m1", None, 2, "m2", None, 0)
    assert disp.text == "m1"
    clock.t = 2.5
    disp.tick()
    assert disp.text == "m2"  # m2 stays (secs2 == 0)
    assert disp.history == ["m1", "m2"]
    disp.clean_text()
    assert disp.text == ""


# ---------------------------------------------------------------------------
# VRSetupFlow state machine (VRController.cs:130-175)
# ---------------------------------------------------------------------------

def _avatar_bones(rig):
    """Walk-in avatar bones placed slightly off the devices (a real user
    never matches the prefab exactly)."""
    return {r: np.asarray(p, np.float32) + [0.0, -0.03, 0.02]
            for r, (p, _) in rig.items()}


def test_setup_flow_happy_path():
    rig = _tpose_rig()
    devices = []
    # scrambled table order, wrong provisional roles guaranteed
    order = [vr.ROLE_TRACKER_LEFT, vr.ROLE_CONTROLLER_RIGHT, vr.ROLE_HMD,
             vr.ROLE_TRACKER_ROOT, vr.ROLE_CONTROLLER_LEFT,
             vr.ROLE_TRACKER_RIGHT]
    models = {vr.ROLE_HMD: "generic_hmd",
              vr.ROLE_CONTROLLER_LEFT: "vive_controller",
              vr.ROLE_CONTROLLER_RIGHT: "vive_controller",
              vr.ROLE_TRACKER_ROOT: "tracker_vive_0",
              vr.ROLE_TRACKER_LEFT: "tracker_vive_1",
              vr.ROLE_TRACKER_RIGHT: "tracker_vive_2"}
    for i, r in enumerate(order):
        devices.append(_dev(i, models[r], rig[r][0], rig[r][1]))

    clock = FakeClock()
    provider = vr.ScriptedDeviceProvider(devices,
                                         triggers=[False, True, True])
    flow = vr.VRSetupFlow(provider, _avatar_bones(rig), clock=clock)
    flow.update()
    assert flow.state == "identify_wait"
    assert "Found 2 controller(s) and 3 tracker(s)." in flow.display.history
    flow.update()  # trigger False → stays
    assert flow.state == "identify_wait"
    flow.update()  # trigger True → identify
    assert flow.state == "avatar_wait"
    # roles must now be geometrically correct despite the scrambled table
    assert flow.roles[vr.ROLE_HMD] == order.index(vr.ROLE_HMD)
    assert flow.roles[vr.ROLE_TRACKER_ROOT] == order.index(
        vr.ROLE_TRACKER_ROOT)
    flow.update()  # cooldown blocks (same timestamp)
    assert flow.state == "avatar_wait"
    clock.t = 1.0
    flow.update()  # trigger True → calibrate
    assert flow.state == "done"
    assert set(flow.joint_offsets) == set(rig)
    # joint offsets put each joint at the avatar bone (trackers/hmd)
    bones = _avatar_bones(rig)
    for role in (vr.ROLE_TRACKER_ROOT, vr.ROLE_HMD, vr.ROLE_TRACKER_LEFT):
        jpos, _ = flow.joint_offsets[role].world(*rig[role])
        np.testing.assert_allclose(jpos, bones[role], atol=1e-5)


def test_setup_flow_insufficient_devices_keeps_detecting():
    devices = [_dev(0, "generic_hmd", [0, 1.7, 0]),
               _dev(1, "vive_controller", [0.8, 1.4, 0])]
    clock = FakeClock()
    flow = vr.VRSetupFlow(vr.ScriptedDeviceProvider(devices, [True] * 5),
                          {}, clock=clock)
    for _ in range(3):
        flow.update()
        clock.t += 1.0
    assert flow.state == "detecting"
    assert "Please, connect" in flow.display.text


# ---------------------------------------------------------------------------
# BVH-driven end-to-end: synthetic rig → identify → calibrate → VRIK targets
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bvh_provider():
    return vr.BVHDeviceProvider(EXAMPLE_BVH, permutation=[3, 0, 5, 2, 4, 1],
                                trigger_frames={0})


def test_bvh_provider_identification(bvh_provider):
    """Clip frame 0 is a T-pose: full detect→identify must recover the
    true role of every shuffled device."""
    det = vr.detect_devices(bvh_provider.poll())
    assert det.ok
    roles = vr.assign_device_indices(det)
    poses = {d.index: (d.position, d.rotation)
             for d in bvh_provider.poll()}
    fixed = vr.identify_devices(roles, poses)
    # ground truth: table slot i holds _table_order[i]
    truth = {r: i for i, r in enumerate(bvh_provider._table_order)}
    for role in vr.SIX_ROLES:
        assert fixed[role] == truth[role], role


def test_vrik_rig_tracks_and_toggles(bvh_provider):
    """VRIK rig on a stub driver: calibrated devices reproduce the body
    joints; dropout toggles edit the mask live."""
    from dragposer_tpu.client.retarget import TrackerRetargeter

    class StubDriver:
        def __init__(self):
            self.retargeter = TrackerRetargeter(EXAMPLE_BVH)
            j = self.retargeter.n_joints
            self.mask = np.zeros(j, np.float32)
            self.weights = np.ones((j, 2), np.float32)

    driver = StubDriver()
    rig = vr.VRIKRig(driver)

    # calibrate at the T-pose frame with the true joint offsets
    pose0 = {r: bvh_provider.device_pose(r, 0) for r in vr.SIX_ROLES}
    jw0_pos, _ = bvh_provider.joint_world(0)
    bones = {r: jw0_pos[vr.ROLE_JOINT[r]] for r in vr.SIX_ROLES}
    offsets = vr.setup_joints(pose0, bones, compute_offsets_hands=True)
    rig.set_joint_offsets(offsets)
    rig.calibrate(pose0)

    # later frame: device-driven trackers must land on the body joints
    frame = min(2000, bvh_provider.n_frames - 1)
    posef = {r: bvh_provider.device_pose(r, frame) for r in vr.SIX_ROLES}
    rig.before_retarget(posef)
    jw_pos, _ = bvh_provider.joint_world(frame)
    for role in vr.SIX_ROLES:
        j = vr.ROLE_JOINT[role]
        assert driver.mask[j] == 1.0
        np.testing.assert_allclose(driver.retargeter.tracker_pos[j],
                                   jw_pos[j], atol=1e-4)
    assert driver.weights[0, 0] == 10.0 and driver.weights[13, 0] == 5.0

    # dropout: deactivating a device zeroes its mask entry next frame
    rig.active[vr.ROLE_TRACKER_LEFT] = False
    rig.before_retarget(posef)
    assert driver.mask[vr.ROLE_JOINT[vr.ROLE_TRACKER_LEFT]] == 0.0
    assert driver.mask[0] == 1.0
