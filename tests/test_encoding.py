"""Data-encoding invariants on real mocap data."""

import numpy as np
import pytest

from dragposer_tpu.config import HEIGHT_INDICES, TEMPORAL_PARAM, VAE_PARAM
from dragposer_tpu.data import datasets, encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops import quat
from dragposer_tpu.ops.topology import Skeleton


@pytest.fixture(scope="module")
def encoded(example_bvh_path):
    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets, bvh.names)
    m = encoding.encode_motion(
        offsets, pos[:300, 0, :], rots[:300], sk,
        height_indices=HEIGHT_INDICES, sample_step=4,
    )
    return m, rots[:300], pos[:300]


def test_root_slot_structure(encoded):
    m, rots, pos = encoded
    dq = m.dqs.reshape(300, 22, 8)
    # frame 0: identity incremental rotation, zero displacement, zero pad
    np.testing.assert_allclose(dq[0, 0], [1, 0, 0, 0, 0, 0, 0, 0], atol=1e-6)
    # all frames: 8th channel of the root slot is zero
    np.testing.assert_allclose(dq[:, 0, 7], 0.0, atol=0.0)


def test_incremental_rotation_inverts(encoded):
    m, rots, _ = encoded
    dq = m.dqs.reshape(300, 22, 8)
    incr = dq[:, 0, :4]
    # chain: grot[t-1] ⊗ incr[t] == ±grot[t]
    rebuilt = np.asarray(quat.mul(m.global_rot[:-1], incr[1:]))
    dots = np.abs(np.sum(rebuilt * m.global_rot[1:], axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_displacement_inverts(encoded):
    m, _, pos = encoded
    world = np.asarray(quat.mul_vec(m.global_rot, m.displacement))
    np.testing.assert_allclose(
        world[1:], m.global_pos[1:] - m.global_pos[:-1], atol=1e-5
    )
    np.testing.assert_allclose(world[0], 0.0, atol=1e-7)


def test_joint_slots_are_unit_quats(encoded):
    m, _, _ = encoded
    dq = m.dqs.reshape(300, 22, 8)
    norms = np.linalg.norm(dq[:, 1:, :4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_unroll_continuity(encoded):
    m, _, _ = encoded
    dq = m.dqs.reshape(300, 22, 8)
    dots = np.sum(dq[1:, :, :4] * dq[:-1, :, :4], axis=-1)
    assert (dots > -1e-6).all()


def test_displacement_acc(encoded):
    m, _, _ = encoded
    acc = m.displacement_acc
    want = m.displacement[10:14].sum(axis=0)
    np.testing.assert_allclose(acc[10], want, atol=1e-6)
    # tail stays zero
    np.testing.assert_allclose(acc[-4:], 0.0, atol=0.0)


def test_running_stats_zero_variance_guard():
    stats = encoding.RunningStats()
    m = encoding.EncodedMotion(
        dqs=np.ones((10, 176), np.float32),  # zero variance
        displacement=np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32),
        global_pos=np.zeros((10, 3)), global_rot=np.zeros((10, 4)),
        heights=None, displacement_acc=None, offsets=np.zeros((22, 3)),
    )
    stats.add(m)
    means, stds = stats.finalize()
    assert (stds["dqs"] == 1.0).all()
    np.testing.assert_allclose(means["dqs"], 1.0)


def test_window_counts(example_bvh_path):
    bvh = BVH().load(example_bvh_path)
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(bvh)
    sk = Skeleton.build(parents, offsets)
    m = encoding.encode_motion(offsets, pos[:200, 0, :], rots[:200], sk,
                               height_indices=HEIGHT_INDICES)
    data = datasets.build_vae_dataset([m], VAE_PARAM)
    # window_size 1, step 1, end < frames → frames-1 windows
    assert data.dqs.shape == (199, 1, 176)
    tdata = datasets.build_temporal_dataset([m], TEMPORAL_PARAM,
                                            data.means, data.stds)
    # starts at 0,16,...; kept while start+120+4 < 200 → starts 0..64 (5)
    assert tdata.dqs_past.shape == (5, 15, 176)
    assert tdata.dqs_future.shape == (5, 15, 176)
    assert tdata.heights.shape == (5, 15, 6)
