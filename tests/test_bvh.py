"""BVH reader/writer tests against the reference example data."""

import os

import numpy as np

from dragposer_tpu.io.bvh import BVH


def test_load_example(example_bvh_path, example_parents):
    bvh = BVH().load(example_bvh_path)
    assert len(bvh.names) == 22
    assert bvh.names[0] == "root"
    assert bvh.names[13] == "upperneck"
    assert bvh.names[21] == "rwrist"
    np.testing.assert_array_equal(bvh.parents, example_parents)
    assert bvh.rotations.shape == (5052, 22, 3)
    assert bvh.positions.shape == (5052, 22, 3)
    assert abs(bvh.frame_time - 0.008333) < 1e-6
    assert (bvh.rot_order == np.array([["x", "y", "z"]] * 22)).all()
    np.testing.assert_allclose(
        bvh.offsets[1], [0.066152, 0.030878, -0.099811], atol=1e-6
    )
    assert len(bvh.end_sites) == 5  # one per leaf (ltoe, rtoe, upperneck, lwrist, rwrist)


def test_save_roundtrip(tmp_path, example_bvh_path):
    bvh = BVH().load(example_bvh_path)
    # shrink for speed
    bvh.rotations = bvh.rotations[:50]
    bvh.positions = bvh.positions[:50]
    out = os.path.join(tmp_path, "roundtrip.bvh")
    bvh.save(out)
    back = BVH().load(out)
    assert back.names == bvh.names
    np.testing.assert_array_equal(back.parents, bvh.parents)
    np.testing.assert_allclose(back.offsets, bvh.offsets, atol=1e-6)
    np.testing.assert_allclose(back.rotations, bvh.rotations, atol=1e-5)
    np.testing.assert_allclose(
        back.positions[:, 0], bvh.positions[:, 0], atol=1e-5
    )
    assert abs(back.frame_time - bvh.frame_time) < 1e-6
