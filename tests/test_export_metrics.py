"""Export (result_to_bvh) and metrics behavior."""

import numpy as np
import pytest

from dragposer_tpu import export, metrics
from dragposer_tpu.data import encoding
from dragposer_tpu.io.bvh import BVH
from dragposer_tpu.ops import quat
from dragposer_tpu.ops.topology import Skeleton


@pytest.fixture(scope="module")
def seg(example_bvh_path):
    bvh = BVH().load(example_bvh_path)
    import copy

    s = copy.deepcopy(bvh)
    s.rotations = bvh.rotations[2000:2150]
    s.positions = bvh.positions[2000:2150]
    return s


def _identity_stats():
    means = {"dqs": np.zeros(176, np.float32), "displacement": np.zeros(3, np.float32)}
    stds = {"dqs": np.ones(176, np.float32), "displacement": np.ones(3, np.float32)}
    return means, stds


@pytest.mark.heavy
def test_roundtrip_identity(seg, tmp_path):
    """Encoding GT and exporting it back must reproduce the motion
    (up to Euler quantization): MPJPE ≈ 0."""
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(seg)
    sk = Skeleton.build(parents, offsets, seg.names)
    m = encoding.encode_motion(offsets, pos[:, 0, :], rots, sk)
    means, stds = _identity_stats()

    # poses: root-space quat channels with WORLD root rotation in slot 0
    dq = m.dqs.reshape(-1, 22, 8)
    qs = dq[:, :, :4].copy()
    qs[:, 0, :] = m.global_rot
    out = export.result_to_bvh(
        qs.reshape(len(qs), -1), means, stds, seg, sk,
        global_pos=m.global_pos, are_root_rot_incr=False,
    )
    gt_p, ev_p = str(tmp_path / "gt.bvh"), str(tmp_path / "ev.bvh")
    seg.save(gt_p)
    out.save(ev_p)
    mpjpe, mpeepe = metrics.positional_error(BVH().load(gt_p), BVH().load(ev_p))
    assert mpjpe < 2e-4, mpjpe
    assert mpeepe < 2e-4, mpeepe


def test_incremental_integration_with_drift_reset(seg, tmp_path):
    """are_root_rot_incr=True: integrating the encoded incremental root
    rotations with GT resets must also reproduce the motion."""
    rots, pos, parents, offsets, _ = encoding.info_from_bvh(seg)
    sk = Skeleton.build(parents, offsets, seg.names)
    m = encoding.encode_motion(offsets, pos[:, 0, :], rots, sk)
    means, stds = _identity_stats()

    dq = m.dqs.reshape(-1, 22, 8)
    qs = dq[:, :, :4].copy()   # slot 0 already holds incremental rotations
    out = export.result_to_bvh(
        qs.reshape(len(qs), -1), means, stds, seg, sk,
        displacement=m.displacement, are_root_rot_incr=True,
        gt_rotations=m.global_rot,
    )
    gt_p, ev_p = str(tmp_path / "gt.bvh"), str(tmp_path / "ev.bvh")
    seg.save(gt_p)
    out.save(ev_p)
    mpjpe, _ = metrics.positional_error(BVH().load(gt_p), BVH().load(ev_p))
    assert mpjpe < 2e-4, mpjpe
    # root trajectory from displacement integration matches GT closely
    drift = np.abs(out.positions[:, 0, :] - seg.positions[:, 0, :]).max()
    assert drift < 5e-3, drift


def test_metrics_ignore_root_translation(seg):
    """MPJPE zeroes the root translation: translating the whole motion must
    not change the metric."""
    import copy

    moved = copy.deepcopy(seg)
    moved.positions = seg.positions + np.array([5.0, -3.0, 2.0])
    mpjpe, mpeepe = metrics.positional_error(seg, moved)
    assert mpjpe < 1e-6
    assert mpeepe < 1e-6


def test_metrics_downsample(seg):
    import copy

    half = copy.deepcopy(seg)
    half.rotations = seg.rotations[::2]
    half.positions = seg.positions[::2]
    mpjpe, _ = metrics.positional_error(seg, half, downsample_gt=2)
    assert mpjpe < 1e-6


def test_jitter_metric(example_bvh_path):
    """Jitter: zero for constant motion; matches a hand-computed value on a
    known moving sequence; GT clip lands in the literature's magnitude."""
    import copy

    import numpy as np

    from dragposer_tpu import metrics
    from dragposer_tpu.io.bvh import BVH

    gt = BVH().load(example_bvh_path)
    j = metrics.jitter(gt)
    assert 100.0 < j < 50000.0  # m/s^3, 120 fps mocap magnitude

    # frozen clip → zero third derivative
    frozen = copy.deepcopy(gt)
    frozen.rotations = np.repeat(gt.rotations[:1], 50, axis=0)
    frozen.positions = np.repeat(gt.positions[:1], 50, axis=0)
    # fp noise in f32 FK is amplified by fps^3 (~1.7e6); a frozen clip
    # still lands ~5 orders of magnitude below real motion
    assert metrics.jitter(frozen) < 1.0

    # downsampling halves fps: jitter is fps^3-scaled, so the value must
    # change accordingly (not be fps-invariant)
    assert metrics.jitter(gt, downsample=2) < j
