"""Hardening the shim anchor for the data-encoding path.

The reference executes against ``tools/pymotion_shim`` (the real
``upc-pymotion`` wheel is unreachable here), so encoding parity previously
rested on shim-vs-rebuild agreement alone.  Two independent anchors close
that gap:

1. **Executed goldens** — literal values produced by running the reference's
   ``motion_data.TrainMotionData.add_motion`` (through the shim) on a fixed
   clip segment are pinned below; both the reference+shim path and this
   framework's encoder must keep reproducing them.

2. **Independent-FK invariants** — the shim's ``to_root_dual_quat`` /
   ``to_rotation_translation`` semantics are validated against the CLIENT
   package's numpy forward kinematics (``client/retarget.py:fk_world``,
   written this round from the Unity C# spec, sharing no code with the shim
   or the engine): rotating the dq translations by the root rotation and
   adding the global position must give world joint positions.  A shared
   misreading of pymotion's conventions cannot satisfy an FK derived from a
   third source.
"""

import sys

import numpy as np
import pytest

SHIM = "/root/repo/tools/pymotion_shim"
REF_SRC = "/root/reference/python/src"
SEG = slice(2000, 2200)

# Executed goldens (sum, std) from TrainMotionData.add_motion(temporal=True)
# on example.bvh frames 2000:2200 with cfg.TEMPORAL_PARAM — window 0:
GOLDEN = {
    "dqs_past": (345.770477, 0.342783),     # (15, 176)
    "dqs_future": (348.057739, 0.342814),   # (15, 176)
    "disp_acc": (-0.245668, 0.028399),      # (15, 3)
    "heights": (-0.772525, 0.264647),       # (15, 6)
}
GOLDEN_ROWS = {
    "dqs_past_row5_8_16": [0.981124, -0.15387, -0.117044, -0.004497,
                           0.006672, 0.026541, 0.022975, -0.050459],
    "heights_row2": [0.073306, 0.197463, -0.033933, 0.083791, 0.395238,
                     -0.278199],
    "disp_acc_row7": [-0.020189, 0.032511, -0.048916],
}


@pytest.fixture(scope="module")
def reference_window():
    """Window 0 of the reference's temporal encoding (shim-executed)."""
    sys.path.insert(0, SHIM)
    sys.path.insert(0, REF_SRC)
    import train as ref_train
    from motion_data import TrainMotionData

    from dragposer_tpu import config as cfg

    bvh = ref_train.get_bvh_from_disk(
        "/root/reference/python/data/example/eval", "example.bvh")
    rots, pos, parents, offsets, _ = ref_train.get_info_from_bvh(bvh)
    rots, pos = rots[SEG], pos[SEG]
    td = TrainMotionData(dict(cfg.TEMPORAL_PARAM), 1.0, "/tmp", "cpu")
    td.add_motion(offsets, pos[:, 0, :], rots, parents, temporal=True)
    m0, n0 = td.motions[0], td.norm_motions[0]
    return {
        "dqs_past": np.asarray(n0["dqs_past"]),
        "dqs_future": np.asarray(n0["dqs_future"]),
        "disp_acc": np.asarray(m0["displacement_past_acc"]),
        "heights": np.asarray(m0["heights"]),
        "inputs": (rots, pos, parents, offsets),
    }


def test_reference_encoding_matches_executed_goldens(reference_window):
    """The reference+shim path keeps producing the pinned literals — any
    drift in the shim's dual-quat/unroll semantics trips this first."""
    for k, (want_sum, want_std) in GOLDEN.items():
        a = reference_window[k]
        np.testing.assert_allclose(a.sum(), want_sum, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a.std(), want_std, rtol=1e-4)
    np.testing.assert_allclose(reference_window["dqs_past"][5, 8:16],
                               GOLDEN_ROWS["dqs_past_row5_8_16"], atol=2e-5)
    np.testing.assert_allclose(reference_window["heights"][2],
                               GOLDEN_ROWS["heights_row2"], atol=2e-5)
    np.testing.assert_allclose(reference_window["disp_acc"][7],
                               GOLDEN_ROWS["disp_acc_row7"], atol=2e-5)


def test_our_encoding_matches_executed_goldens(reference_window):
    """Our encoder reproduces the same executed goldens slot-for-slot."""
    from dragposer_tpu import config as cfg
    from dragposer_tpu.data import datasets, encoding
    from dragposer_tpu.io.bvh import BVH
    from dragposer_tpu.ops.topology import Skeleton

    bvh = BVH().load("/root/reference/python/data/example/eval/example.bvh")
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    param = dict(cfg.TEMPORAL_PARAM)
    motion = encoding.encode_motion(
        offsets, pos[SEG, 0, :], rots[SEG], sk,
        height_indices=param["height_indices"],
    )
    raw_means = {"dqs": np.zeros(1, np.float32),
                 "displacement": np.zeros(1, np.float32)}
    raw_stds = {"dqs": np.ones(1, np.float32),
                "displacement": np.ones(1, np.float32)}
    data = datasets.build_temporal_dataset([motion], param, raw_means,
                                           raw_stds)
    ours = {"dqs_past": np.asarray(data.dqs_past[0]),
            "dqs_future": np.asarray(data.dqs_future[0]),
            "disp_acc": np.asarray(data.disp_past_acc[0]),
            "heights": np.asarray(data.heights[0])}
    for k, (want_sum, want_std) in GOLDEN.items():
        np.testing.assert_allclose(ours[k].sum(), want_sum, rtol=1e-3,
                                   atol=1e-3, err_msg=k)
        np.testing.assert_allclose(ours[k].std(), want_std, rtol=1e-3,
                                   err_msg=k)
    for k, ref_k in (("dqs_past", "dqs_past"), ("heights", "heights"),
                     ("disp_acc", "disp_acc")):
        np.testing.assert_allclose(ours[k], reference_window[ref_k],
                                   atol=5e-5, err_msg=k)


def test_shim_dq_semantics_vs_independent_fk(reference_window):
    """to_root_dual_quat ∘ to_rotation_translation == world FK (independent
    numpy implementation from the client package)."""
    import pymotion.rotations.dual_quat as dquat
    import pymotion.rotations.quat as pquat
    from pymotion.ops.skeleton import to_root_dual_quat

    from dragposer_tpu.client.retarget import fk_world

    rots, pos, parents, offsets = reference_window["inputs"]
    f = 7  # arbitrary frame
    dqs = to_root_dual_quat(rots[f:f + 1],
                            np.zeros((1, 3)), parents, offsets)
    dq_rots, dq_trans = dquat.to_rotation_translation(dqs)
    world = pquat.mul_vec(dq_rots[:, 0:1, :], dq_trans)[0] + pos[f, 0]

    fk_pos, fk_rot = fk_world(parents, np.asarray(offsets, np.float32),
                              rots[f], pos[f, 0])
    np.testing.assert_allclose(world, fk_pos, atol=1e-4)

    # and the dq world rotations must equal independent-FK world rotations
    # up to per-joint sign, with the root's rotation NOT folded into
    # descendants (pymotion's to_root_dual_quat convention)
    root_inv = np.concatenate([rots[f, 0, :1], -rots[f, 0, 1:]])
    from dragposer_tpu.client.math import quat_mul

    for j in range(1, len(parents)):
        expect = quat_mul(root_inv, fk_rot[j])
        d = min(np.linalg.norm(dq_rots[0, j] - expect),
                np.linalg.norm(dq_rots[0, j] + expect))
        assert d < 1e-4, f"joint {j}: {d}"


def test_shim_unroll_gives_continuity(reference_window):
    """dquat.unroll must make consecutive frames' quaternions co-hemispheric
    (the property the reference relies on, motion_data.py:68)."""
    import pymotion.rotations.dual_quat as dquat

    rots, pos, parents, offsets = reference_window["inputs"]
    from pymotion.ops.skeleton import to_root_dual_quat

    dqs = to_root_dual_quat(rots[:40], np.zeros((40, 3)), parents, offsets)
    # flip some frames adversarially, then unroll
    flipped = dqs.copy()
    flipped[::3] = -flipped[::3]
    un = dquat.unroll(flipped, axis=0)
    dots = np.sum(un[1:, :, :4] * un[:-1, :, :4], axis=-1)
    assert np.all(dots >= -1e-6), "unroll left a hemisphere flip"
    # unroll only changes signs
    np.testing.assert_allclose(np.abs(un), np.abs(dqs), atol=1e-6)
