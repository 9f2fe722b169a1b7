"""Topology precompute vs golden values from the reference skeleton.

Goldens were produced by executing the reference topology functions on the
22-joint example skeleton (SURVEY.md Appendix A.2); the pretrained checkpoint
shapes (176/112/72/48 encoder, 24/40/60/92 decoder) independently confirm the
22→14→9→6 (encoder) and 6→10→15→23 (decoder) schedules.
"""

import numpy as np

from dragposer_tpu.ops import topology


GOLDEN_POOL_L0 = [
    [0, 1, 5, 9], [2, 1, 3], [4, 3], [6, 5, 7], [8, 7], [10, 9, 11], [12, 11],
    [13], [14, 11, 15], [16, 15], [17], [18, 11, 19], [20, 19], [21],
]
GOLDEN_NEIGHBOR_SIZES = [7, 6, 5, 4, 3, 6, 5, 4, 3, 6, 7, 9, 6, 3, 7, 5, 4, 3, 7, 5, 4, 3]


def test_encoder_pooling_schedule(example_parents):
    pool0, parents1 = topology.pooling_schedule(example_parents, add_displacement=False)
    assert pool0 == GOLDEN_POOL_L0
    assert len(pool0) == 14
    pool1, parents2 = topology.pooling_schedule(parents1, add_displacement=False)
    assert len(pool1) == 9
    pool2, parents3 = topology.pooling_schedule(parents2, add_displacement=False)
    assert len(pool2) == 6
    assert all(p == 0 for p in parents3)


def test_decoder_pooling_schedule(example_parents):
    # decoder adds the displacement pseudo-joint on levels 0 and 1 only
    pool0, parents1 = topology.pooling_schedule(example_parents, add_displacement=True)
    pool1, parents2 = topology.pooling_schedule(parents1, add_displacement=True)
    pool2, parents3 = topology.pooling_schedule(parents2, add_displacement=False)
    # unpool output sizes must match checkpoint shapes (92, 60, 40) at 4 ch/joint
    assert topology.unpool_matrix(pool0, 4).shape == (23 * 4, 15 * 4)
    assert topology.unpool_matrix(pool1, 4).shape == (15 * 4, 10 * 4)
    assert topology.unpool_matrix(pool2, 4).shape == (10 * 4, 6 * 4)


def test_neighbor_sizes(example_parents):
    hoods = topology.neighbor_lists(example_parents, 2, add_displacement=False)
    assert [len(h) for h in hoods] == GOLDEN_NEIGHBOR_SIZES


def test_neighbor_displacement_sharing(example_parents):
    hoods = topology.neighbor_lists(example_parents, 2, add_displacement=True)
    assert len(hoods) == 23
    root_hood_no_disp = [j for j in hoods[0] if j != 22]
    # displacement shares the root's neighborhood + itself
    assert hoods[22] == root_hood_no_disp + [22]
    for j in root_hood_no_disp:
        assert 22 in hoods[j]


def test_pool_matrix_rows_average(example_parents):
    pool0, _ = topology.pooling_schedule(example_parents, add_displacement=False)
    w = topology.pool_matrix(pool0, 22, 8)
    assert w.shape == (112, 176)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)


def test_ancestor_matrix(example_parents):
    a = topology.ancestor_matrix(example_parents)
    assert a[0].sum() == 0
    # lwrist (17): chain root->9->10->11->14->15->16->17
    np.testing.assert_array_equal(np.nonzero(a[17])[0], [9, 10, 11, 14, 15, 16, 17])
    # lhip (1): just itself
    np.testing.assert_array_equal(np.nonzero(a[1])[0], [1])


def test_depth_levels(example_parents):
    levels = topology.depth_levels(example_parents)
    assert [len(l) for l in levels] == [1, 3, 3, 3, 5, 3, 2, 2]
    np.testing.assert_array_equal(levels[0], [0])
    np.testing.assert_array_equal(levels[1], [1, 5, 9])
    np.testing.assert_array_equal(levels[7], [17, 21])
